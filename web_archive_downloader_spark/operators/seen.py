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
epoch, broadcast to the filter UDF. Pure-Python bit math over numpy
arrays inside an Arrow batch — no per-row Python at the Spark level.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..content.paths import xxhash64_str

_U64 = (1 << 64) - 1


class BloomSketch:
    """Plain Bloom filter over 64-bit xxhash values.

    k hash probes derived from (h1, h2) double hashing where
    h1 = xxhash64(url, seed=42), h2 = xxhash64(url, seed=77) — both
    computable JVM-side or in Python identically.
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

    def _positions(self, urls: pd.Series) -> np.ndarray:
        h1 = np.array([xxhash64_str(u, 42) & _U64 for u in urls], np.uint64)
        h2 = np.array([xxhash64_str(u, 77) & _U64 for u in urls], np.uint64)
        idx = np.arange(self.k, dtype=np.uint64)
        # (n, k) probe positions via double hashing
        pos = (h1[:, None] + idx[None, :] * h2[:, None]) % np.uint64(self.n_bits)
        return pos

    def add_many(self, urls: pd.Series) -> None:
        pos = self._positions(urls).ravel()
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (pos & np.uint64(63)))

    def might_contain(self, urls: pd.Series) -> np.ndarray:
        if len(urls) == 0:
            return np.zeros(0, bool)
        pos = self._positions(urls)
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
        assert self.n_bits == other.n_bits and self.k == other.k
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
    per partition, appendable/unionable across epochs."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = BloomSketch.sized_for(max(expected_per_partition, len(pdf)), fpp)
        sk.add_many(pdf["url"])
        return pd.DataFrame(
            {"partition_id": [int(pdf["pid"].iloc[0])], "sketch": [sk.to_bytes()]}
        )

    with_pid = url_seen.select(
        "url", F.pmod(F.xxhash64("url"), F.lit(n_partitions)).cast("int").alias("pid")
    )
    return with_pid.groupBy("pid").applyInPandas(build, _SKETCH_SCHEMA)


def bloom_prefilter(
    frontier: DataFrame,
    sketches: list[tuple[int, bytes]],
    n_partitions: int,
    spark: SparkSession,
) -> DataFrame:
    """Adds ``maybe_seen`` (bool) using broadcast sketches. Rows with
    maybe_seen=false are DEFINITELY unseen (no false negatives) and
    skip the exact anti-join entirely."""
    if not sketches:
        return frontier.withColumn("maybe_seen", F.lit(False))
    merged: dict[int, BloomSketch] = {}
    for pid, data in sketches:
        sk = BloomSketch.from_bytes(data)
        merged[pid] = merged[pid].union(sk) if pid in merged else sk
    bc = spark.sparkContext.broadcast({p: s.to_bytes() for p, s in merged.items()})
    n_parts = n_partitions

    @F.pandas_udf(T.BooleanType())
    def maybe_seen_udf(urls: pd.Series) -> pd.Series:
        local = {p: BloomSketch.from_bytes(b) for p, b in bc.value.items()}
        out = np.zeros(len(urls), bool)
        # pmod(xxhash64(url), P) — same partitioning as the sketch build
        pid_arr = np.array([xxhash64_str(u) % n_parts for u in urls], np.int64) % n_parts
        for pid in np.unique(pid_arr):
            sk = local.get(int(pid))
            mask = pid_arr == pid
            if sk is not None:
                out[mask] = sk.might_contain(urls[mask].reset_index(drop=True))
        return pd.Series(out)

    return frontier.withColumn("maybe_seen", maybe_seen_udf(F.col("url")))


def anti_join_unseen(frontier: DataFrame, url_seen: DataFrame) -> DataFrame:
    """Exact J1: frontier rows whose url is NOT in url_seen
    (main.py:62-64). Left-anti equi-join; with both sides bucketed by
    xxhash64(url) this is co-partitioned (no big-side shuffle)."""
    return frontier.join(url_seen.select("url"), on="url", how="left_anti")


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
