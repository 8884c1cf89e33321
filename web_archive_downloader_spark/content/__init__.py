"""Pure-Python deterministic content kernels.

Shared by (a) the Arrow-batched pandas UDFs on executors and (b) the
sequential oracle simulator — so engine-vs-oracle byte-equality tests
exercise the *distributed orchestration* (ordering, routing, retry,
politeness, state), which is where divergence can occur, while the
scalar/DOM kernels are a single audited implementation of the
reference's semantics.
"""
