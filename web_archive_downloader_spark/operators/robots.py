"""Robots.txt state: cached rules table + broadcast disallow gate.

The reference has NO robots handling (SURVEY §2.10 — closest is the
UA string, config.json:15); this is new engine state required by the
target (BASELINE.json:6 "robots.txt caching ... broadcast of the
robots/politeness state"). Because it is additive, the engine keeps
it OFF for reference-equality runs (EngineConfig.respect_robots) and
the oracle applies the same gate when enabled, so ordering equality
is preserved in both modes.

Design: ``robots(host, disallow: array<string>, crawl_delay: double,
fetched_epoch: int)`` is a SMALL table (one row per host — even at
10^10 URLs, hosts number ~10^7) → always broadcast to the scheduling
join. ``crawl_delay`` overrides the global politeness delay per host
(min tokens 1). Refresh bookkeeping: rows carry fetched_epoch; stale
rows (older than ttl_epochs) are re-fetched by a small mapInPandas
stage in production — here the fixture generator stands in for the
fetch, and refresh is the same epoch-append + latest-per-host pattern
as A1.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..content.paths import xxhash64_str

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay", T.DoubleType()),
        T.StructField("fetched_epoch", T.IntegerType()),
    ]
)


def gen_robots_rows(hosts: list[str], default_delay: float = 1.5, epoch: int = 0) -> list[tuple]:
    """Deterministic fixture: ~1/3 of hosts disallow some prefixes,
    ~1/4 set a custom crawl delay."""
    rows = []
    for h in hosts:
        x = xxhash64_str("robots:" + h) & ((1 << 63) - 1)
        disallow = []
        if x % 3 == 0:
            disallow.append("/private")
        if x % 7 == 0:
            disallow.append("/docs")
        delay = default_delay
        if x % 4 == 0:
            delay = float(1 + x % 5)
        rows.append((h, disallow, delay, epoch))
    return rows


def robots_df(spark: SparkSession, hosts: list[str], default_delay: float = 1.5, epoch: int = 0) -> DataFrame:
    return spark.createDataFrame(gen_robots_rows(hosts, default_delay, epoch), ROBOTS_SCHEMA)


def latest_robots(robots: DataFrame) -> DataFrame:
    """Latest-per-host cache view (refresh = newer fetched_epoch wins)."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.desc("fetched_epoch"))
    return (
        robots.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_robots_gate(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Split frontier into (allowed, blocked) by disallow-prefix match
    on the URL path. The robots side is broadcast (small by
    construction); the gate is a single broadcast hash join + an
    array-exists predicate — no shuffle of the frontier.

    Returns the frontier with two added columns:
    ``robots_blocked: boolean`` and ``crawl_delay: double`` (null
    where no robots row exists — caller falls back to the global
    politeness delay)."""
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit(""))
    joined = frontier.join(F.broadcast(latest_robots(robots)), "host", "left")
    blocked = F.exists(
        F.coalesce(F.col("disallow"), F.array().cast("array<string>")),
        lambda p: path.startswith(p),
    )
    return joined.withColumn("robots_blocked", F.coalesce(blocked, F.lit(False))).drop(
        "disallow", "fetched_epoch"
    )


def per_host_budgets(robots: DataFrame, epoch_seconds: float, default_delay: float) -> DataFrame:
    """Token-bucket capacities per host honoring robots crawl_delay:
    tokens = max(1, floor(epoch_seconds / delay))."""
    delay = F.coalesce(F.col("crawl_delay"), F.lit(default_delay))
    return latest_robots(robots).select(
        "host",
        F.greatest(F.floor(F.lit(epoch_seconds) / delay), F.lit(1)).cast("int").alias("host_budget"),
    )
