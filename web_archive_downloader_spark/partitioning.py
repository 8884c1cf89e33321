"""Scale-adaptive input widening for compute-heavy per-row stages.

Problem (guide §2.2/§6): a parquet scan's effective parallelism is
bounded by its row-group layout — a single-row-group file executes as
ONE task no matter how many cores (or split-size configs) exist, so an
expensive projection/explode over it runs serially. At 100 TB inputs
carry thousands of row groups and this is a non-issue; small/medium
inputs written as one row group (exactly the driver's testdata shape)
serialize the most expensive stages of the pipeline.

``widen_narrow_scan`` is the adaptive fix: repartition ONLY when the
relation's current parallelism is below the session's core count, and
never otherwise — so at scale it is a provable no-op (no added
exchange cost), while narrow inputs spread across the cluster before
the expensive work. Callers apply it ONLY where results are
partitioning-independent (per-row projections, integer/min/max/count
aggregations, equi-joins) — never upstream of a floating-point
aggregation, whose summation order must stay exactly as planned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def widen_narrow_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's parallelism iff its current
    partition count is lower; identity otherwise (the at-scale case).

    ``target`` overrides the width (default: defaultParallelism, i.e.
    total cores; override via SPARK_GRAFT_WIDEN_PARTS for cluster
    tuning). Round-robin repartition is used: deterministic under task
    retry (sortBeforeRepartition is on by default) and balanced
    regardless of key skew.
    """
    try:
        sc = df.sparkSession.sparkContext
        target = target or int(
            os.environ.get("SPARK_GRAFT_WIDEN_PARTS", "0")
        ) or sc.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        # streaming frames / unresolvable plans: leave untouched
        return df
    if current >= target:
        return df
    return df.repartition(target)


# scope -> the most recent materialization for that operator site;
# unpersisted (and CacheManager-evicted) when the site materializes
# again, so repeated invocations of the same query RECOMPUTE instead
# of silently plan-matching the previous invocation's cache
_SCOPED_CACHE: dict[str, DataFrame] = {}


def materialize_with_stats(df: DataFrame, scope: str | None = None) -> DataFrame:
    """Materialize an intermediate relation WITH size statistics.

    ``localCheckpoint`` truncates lineage but leaves the resulting
    LogicalRDD with UNKNOWN stats (defaultSizeInBytes — effectively
    infinite), which poisons every downstream join-size estimate: the
    planner then sort-merge-joins relations that would broadcast or
    hash-join at their true size. Persisting and materializing instead
    yields an InMemoryRelation whose stats come from the actual cached
    bytes, so Spark's own size-based join selection stays correct at
    ANY scale — small intermediates broadcast, large ones shuffle; the
    choice is the planner's, not a hard-coded hint.

    ``scope`` (pass a stable per-call-site tag): Spark's CacheManager
    matches cached plans STRUCTURALLY, so without eviction a repeated
    invocation of the same operator would silently reuse the previous
    invocation's persisted intermediate — benchmark repeats would then
    time a warm cache rather than the computation (and memory would
    creep per invocation). Scoped materializations unpersist their
    predecessor first, so every invocation computes from the inputs.
    """
    if scope is not None:
        prev = _SCOPED_CACHE.pop(scope, None)
        if prev is not None:
            try:
                prev.unpersist()
            except Exception:
                pass
    out = df.persist()
    out.count()
    if scope is not None:
        _SCOPED_CACHE[scope] = out
    return out
