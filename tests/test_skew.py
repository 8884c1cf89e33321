"""Skew handling (BASELINE.json: 'explicit salting of skewed hosts'):
the salted two-phase top-k bounds any single task's input when one
host dominates the frontier, and AQE's skew-join mitigation engages on
skewed shuffle joins (runtime partition splitting)."""

import time

import pandas as pd
from pyspark.sql import functions as F

from web_archive_downloader_spark.operators.schedule import per_host_topk


def _skewed_frontier(spark, hot_n=24_000, cold_hosts=24, cold_n=1_000):
    rows = []
    for i in range(hot_n):
        rows.append((f"https://hot.com/{i}", "hot.com"))
    for h in range(cold_hosts):
        for i in range(cold_n):
            rows.append((f"https://cold{h}.com/{i}", f"cold{h}.com"))
    pdf = pd.DataFrame(rows, columns=["url", "host"])
    pdf["depth"] = 0
    pdf["priority"] = 0.0
    pdf["seq"] = range(len(pdf))
    return spark.createDataFrame(pdf)


def test_salted_topk_spreads_hot_host(spark):
    """One host holds 50% of the frontier. The salted pre-pass ranks
    within (host, salt): the hot host's 50k rows spread across all
    salt buckets (max bucket ~n/S, never one task sorting the host),
    and each bucket emits <= k survivors, so the final per-host window
    sees <= S*k rows — independent of the host's frontier size."""
    S, k = 8, 100
    df = _skewed_frontier(spark).cache()
    try:
        # the pre-pass grouping the operator uses, measured directly
        spread = (
            df.filter(F.col("host") == "hot.com")
            .groupBy(F.pmod(F.xxhash64("url"), F.lit(S)).alias("salt"))
            .count()
            .collect()
        )
        assert len(spread) == S  # hot host occupies every salt bucket
        assert max(r["count"] for r in spread) < 2 * 24_000 / S
        out = per_host_topk(df, k=k, salt_buckets=S)
        got = out.groupBy("host").count().collect()
        by_host = {r.host: r["count"] for r in got}
        assert by_host["hot.com"] == k
        # salted result == unsalted (global top-k containment)
        unsalted = per_host_topk(df, k=k, salt_buckets=1)
        assert sorted(r.url for r in out.collect()) == sorted(
            r.url for r in unsalted.collect()
        )
        # selected rows are exactly the k lowest seqs of the hot host
        hot = sorted(
            r.seq for r in out.filter(F.col("host") == "hot.com").collect()
        )
        assert hot == list(range(k))
    finally:
        df.unpersist()


def test_aqe_skew_join_mitigation_engages(spark):
    """A deliberately skewed shuffle join (90% of rows on one key):
    with AQE skew-join enabled and thresholds sized for the fixture,
    the final adaptive plan marks the join skew=true (runtime split of
    the oversized partition) and the result is unchanged."""
    import io
    from contextlib import redirect_stdout

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 60_000
        left = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 97).alias("key"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pl"),
        )
        right = spark.range(200).select(
            (F.col("id") % 97).alias("key"),
            F.col("id").alias("rv"),
        )
        j = left.join(right, "key")
        # execute THIS DataFrame's own query execution (count()/write()
        # wrap it in a new plan) so its AdaptiveSparkPlan finalizes
        n_out = len(j.collect())
        assert n_out > n  # sanity: join multiplied the hot key
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain()
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # AQE split the oversized partition
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
