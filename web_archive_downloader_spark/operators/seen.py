"""J1: the URL-seen membership operator.

Reference: an in-memory ``set`` probed per URL (main.py:62-64). At
10^10-URL scale the engine uses a two-tier design (BASELINE.json:14;
SURVEY §2.4 J1):

1. a **partitioned Bloom prefilter** — cheap, broadcast, false
   positives only — drops the overwhelming majority of already-seen
   URLs before the shuffle;
2. an **exact LEFT ANTI join** against the hash-partitioned
   ``url_seen`` table for the rows the Bloom could not exclude —
   membership truth stays exact.

Both sides are hash-partitioned by ``xxhash64(url)`` (the frontier
repartitioned, the url_seen table bucketed the same way at write
time), so the anti-join is co-partitioned: on a bucketed Iceberg
table this is a storage-partitioned join with no shuffle of the big
side.

The Bloom is maintained as engine state: per-partition sketch rows
(partition_id, bitset bytes) in a side table, unioned/refreshed per
epoch, broadcast to the filter UDF.

Scale notes (round-2 hardening):

- **All URL hashing is JVM-side.** Both the sketch build and the
  probe project ``h1 = xxhash64(url)`` and
  ``pid = pmod(xxhash64(url), P)`` as Catalyst expressions; the
  pandas UDFs consume int64 columns and derive the second probe hash
  with a vectorized numpy splitmix64 mix of h1. No per-row Python
  hashing anywhere in the pipeline (the pure-Python ``hash_urls``
  helper below exists only for tests/oracle).
- **Sketches of different capacities merge safely.** Each epoch
  sizes its per-partition sketch for that epoch's row count, so a
  pid accumulates sketches with different (n_bits, k) over time.
  The merge unions only equal-geometry sketches and keeps the rest
  as a list; the probe ORs ``might_contain`` across every sketch
  for the pid. A URL was inserted into exactly one sketch, so the
  OR preserves the no-false-negative guarantee.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_U64 = (1 << 64) - 1


def splitmix64(h: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 — derives the
    second double-hashing probe stream from the JVM-computed h1."""
    with np.errstate(over="ignore"):
        z = (h + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return (z ^ (z >> np.uint64(31))) | np.uint64(1)  # odd → k distinct probes


def hash_urls(urls) -> np.ndarray:
    """xxhash64(url, seed=42) as uint64 — matches Spark's
    ``F.xxhash64`` bit-for-bit. Pure-Python per-row loop: for tests
    and the oracle ONLY; the engine projects the hash JVM-side."""
    from ..content.paths import xxhash64_str

    return np.array([xxhash64_str(u, 42) & _U64 for u in urls], np.uint64)


class BloomSketch:
    """Plain Bloom filter over 64-bit xxhash values.

    k probe positions via double hashing: pos_i = h1 + i * h2 where
    h1 = xxhash64(url, seed=42) (JVM-side) and h2 = splitmix64(h1)
    (vectorized numpy) — no per-row Python in either stream.
    """

    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.k = k
        self.words = bits if bits is not None else np.zeros((n_bits + 63) // 64, np.uint64)

    @classmethod
    def sized_for(cls, expected: int, fpp: float = 0.01) -> "BloomSketch":
        expected = max(expected, 16)
        n_bits = int(-expected * math.log(fpp) / (math.log(2) ** 2))
        n_bits = max(128, (n_bits + 63) // 64 * 64)
        k = max(1, round(n_bits / expected * math.log(2)))
        return cls(n_bits, min(k, 16))

    def _positions(self, h1: np.ndarray) -> np.ndarray:
        h1 = h1.astype(np.uint64, copy=False)
        h2 = splitmix64(h1)
        idx = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (n, k) probe positions via double hashing
            pos = (h1[:, None] + idx[None, :] * h2[:, None]) % np.uint64(self.n_bits)
        return pos

    def add_many(self, h1: np.ndarray) -> None:
        pos = self._positions(h1).ravel()
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (pos & np.uint64(63)))

    def might_contain(self, h1: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.zeros(0, bool)
        pos = self._positions(h1)
        word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=1)

    def to_bytes(self) -> bytes:
        return np.array([self.n_bits, self.k], np.int64).tobytes() + self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomSketch":
        hdr = np.frombuffer(data[:16], np.int64)
        words = np.frombuffer(data[16:], np.uint64).copy()
        return cls(int(hdr[0]), int(hdr[1]), words)

    def union(self, other: "BloomSketch") -> "BloomSketch":
        if self.n_bits != other.n_bits or self.k != other.k:
            raise ValueError("union requires equal sketch geometry")
        return BloomSketch(self.n_bits, self.k, self.words | other.words)


_SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("sketch", T.BinaryType()),
    ]
)


def build_bloom_sketches(
    url_seen: DataFrame,
    n_partitions: int,
    expected_per_partition: int,
    fpp: float = 0.01,
) -> DataFrame:
    """Per-partition Bloom sketches over url_seen.url, built with
    applyInPandas grouped by pmod(xxhash64(url), P) — one sketch row
    per partition, appendable across epochs. The URL hash is a
    Catalyst projection; the UDF only sets bits from int64 input."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = BloomSketch.sized_for(max(expected_per_partition, len(pdf)), fpp)
        sk.add_many(pdf["h1"].to_numpy(np.int64).view(np.uint64))
        return pd.DataFrame(
            {"partition_id": [int(pdf["pid"].iloc[0])], "sketch": [sk.to_bytes()]}
        )

    with_pid = url_seen.select(
        F.xxhash64("url").alias("h1"),
        F.pmod(F.xxhash64("url"), F.lit(n_partitions)).cast("int").alias("pid"),
    )
    return with_pid.groupBy("pid").applyInPandas(build, _SKETCH_SCHEMA)


def merge_sketches(sketches: list[tuple[int, bytes]]) -> dict[int, list[bytes]]:
    """Collapse per-epoch sketch rows into per-pid lists. Sketches
    with identical geometry are OR-unioned; different capacities
    (an epoch that overflowed ``expected_per_partition``) stay as
    separate list entries and are all probed at filter time."""
    by_geom: dict[tuple[int, int, int], BloomSketch] = {}
    for pid, data in sketches:
        sk = BloomSketch.from_bytes(data)
        key = (pid, sk.n_bits, sk.k)
        by_geom[key] = by_geom[key].union(sk) if key in by_geom else sk
    out: dict[int, list[bytes]] = {}
    for (pid, _, _), sk in by_geom.items():
        out.setdefault(pid, []).append(sk.to_bytes())
    return out


def bloom_prefilter(
    frontier: DataFrame,
    sketches: list[tuple[int, bytes]],
    n_partitions: int,
    spark: SparkSession,
) -> DataFrame:
    """Adds ``maybe_seen`` (bool) using broadcast sketches. Rows with
    maybe_seen=false are DEFINITELY unseen (no false negatives) and
    skip the exact anti-join entirely. h1/pid are projected JVM-side
    (``xxhash64`` / ``pmod``); the pandas UDF does only numpy bit
    math over int64 columns."""
    if not sketches:
        return frontier.withColumn("maybe_seen", F.lit(False))
    bc = spark.sparkContext.broadcast(merge_sketches(sketches))

    @F.pandas_udf(T.BooleanType())
    def maybe_seen_udf(h1: pd.Series, pid: pd.Series) -> pd.Series:
        local = {p: [BloomSketch.from_bytes(b) for b in bs] for p, bs in bc.value.items()}
        h1_arr = h1.to_numpy(np.int64).view(np.uint64)
        pid_arr = pid.to_numpy(np.int64)
        out = np.zeros(len(h1_arr), bool)
        for p in np.unique(pid_arr):
            mask = pid_arr == p
            for sk in local.get(int(p), ()):  # OR across geometries — no false negatives
                out[mask] |= sk.might_contain(h1_arr[mask])
        return pd.Series(out)

    return (
        frontier.withColumn("_h1", F.xxhash64("url"))
        .withColumn("_pid", F.pmod(F.xxhash64("url"), F.lit(n_partitions)).cast("long"))
        .withColumn("maybe_seen", maybe_seen_udf(F.col("_h1"), F.col("_pid")))
        .drop("_h1", "_pid")
    )


def anti_join_unseen(frontier: DataFrame, url_seen: DataFrame) -> DataFrame:
    """Exact J1: frontier rows whose url is NOT in url_seen
    (main.py:62-64). Left-anti equi-join; with both sides bucketed by
    xxhash64(url) this is co-partitioned (no big-side shuffle)."""
    return frontier.join(url_seen.select("url"), on="url", how="left_anti")


def write_url_seen_bucketed(
    url_seen: DataFrame, table_name: str, buckets: int = 32
) -> None:
    """Scale path for the J1 big side: persist url_seen as a BUCKETED
    table (hash-bucketed + sorted by url). Reading it back for the
    anti-join gives a storage-partitioned join: the url_seen scan
    needs NO Exchange and NO Sort — only the (much smaller) frontier
    side shuffles. On Iceberg this is the same contract via bucket(N,
    url) partition transforms + storage-partitioned joins. At a
    10^10-row seen set, not shuffling the big side per epoch is the
    difference between an O(seen) exchange every epoch and an
    O(frontier) one. Demonstrated + plan-asserted in
    tests/test_operators.py::test_bucketed_url_seen_join_shuffles_small_side_only."""
    (
        url_seen.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "url")
        .sortBy("url")
        .saveAsTable(table_name)
    )


def unseen_with_bloom(
    frontier: DataFrame,
    url_seen: DataFrame,
    sketches: list[tuple[int, bytes]],
    n_partitions: int,
    spark: SparkSession,
) -> DataFrame:
    """Bloom prefilter + exact anti-join of the residue. Returns the
    exactly-unseen frontier rows (BASELINE.json:14 exactness).

    A missing/empty sketch set means the Bloom gives NO exclusion
    guarantee — everything must go through the exact anti-join (the
    filter is an optimization, never the membership truth)."""
    if not sketches:
        return anti_join_unseen(frontier, url_seen)
    flagged = bloom_prefilter(frontier, sketches, n_partitions, spark)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    candidates = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    survivors = anti_join_unseen(candidates, url_seen)
    return definitely_new.unionByName(survivors)
