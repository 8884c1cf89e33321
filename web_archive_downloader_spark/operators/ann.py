"""Similarity search over the ``embeddings`` table
(vec_id, embedding: array<float>, label).

- brute_force_topk: exact cosine top-k per query — the correctness
  baseline. Plan: broadcast the (small) query set, scan the corpus
  once, per-partition top-k via window-free aggregation is left to
  AQE; at 100 TB the scan is the cost and the broadcast join keeps it
  shuffle-free except the final per-query k-row reduction.
- lsh_bucketed_topk: the scale path — random-hyperplane sign buckets
  (deterministic hyperplanes from a seeded RNG) restrict candidates
  to matching buckets (with multi-probe via allowing 1-bit flips),
  then exact cosine within buckets. Recall tested vs brute force.

Cosine is computed JVM-side with zip_with/aggregate (no UDF).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame, query_ids: list[str] | list[int], k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id. Output:
    (query_id, rank, neighbor_id, cos). Excludes self-matches."""
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr(F.col("qv"), F.col("v")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def sign_bucket_col(v: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of dot products with fixed random
    hyperplanes, packed into an int. Pure expressions — the planes are
    literal arrays folded by Catalyst."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, lit_plane, lambda x, y: x * y), F.lit(0.0), lambda a, b: a + b
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign-bucket (or
    any 1-bit-flipped bucket when multiprobe). Same output schema as
    brute_force_topk."""
    planes = _hyperplanes(dim, n_planes)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("bucket", sign_bucket_col(F.col("v"), planes))
    q = e.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    if multiprobe:
        probes = F.array(
            F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        )
        q = q.select("query_id", "qv", F.explode(probes).alias("qb"))
    cand = e.join(F.broadcast(q), (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id")))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_expr(F.col("qv"), F.col("v")), 4).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
