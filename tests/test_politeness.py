"""Intra-epoch politeness pacing: the per-host budget caps VOLUME per
epoch; the pace calendar bounds RATE — every request to a host gets a
distinct absolute time slot epoch_start + (host_rank-1)*delay, so two
same-host requests can never fire closer than ``delay`` apart, no
matter which partitions/tasks hold them (reference README.md:66
inter-request delay, pinned by SURVEY §2.10)."""

import pandas as pd
from pyspark.sql import functions as F

from web_archive_downloader_spark.operators.schedule import (
    pace_slot_col,
    per_host_topk,
)
from web_archive_downloader_spark.sources.fetch_shim import fetch_stage, politeness_pacer


def _frontier(spark):
    rows = []
    for h, n in [("a.com", 12), ("b.com", 3)]:
        for i in range(n):
            rows.append((f"https://{h}/{i}", h, 0, 0.0, len(rows), 1))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "host", "depth", "priority", "seq", "attempt"])
    )


def test_pace_slots_are_dense_and_spaced(spark):
    """Per host: slots are exactly 0, d, 2d, ... (dense ranks), so the
    minimum spacing between any two same-host requests is d — the
    documented 1.5 s inter-request delay honored per-request, not just
    in aggregate."""
    d = 1.5
    sched = per_host_topk(_frontier(spark), k=10, salt_buckets=4).withColumn(
        "pace_slot", pace_slot_col(d)
    )
    pdf = sched.select("host", "pace_slot").toPandas()
    by_host = {h: sorted(g["pace_slot"]) for h, g in pdf.groupby("host")}
    assert by_host["a.com"] == [i * d for i in range(10)]
    assert by_host["b.com"] == [i * d for i in range(3)]


def test_same_host_slots_unique_across_partitions(spark):
    """Slot uniqueness is partition-independent: scatter the schedule
    by url hash (the engine's fetch partitioning) and check no two
    same-host rows share a slot."""
    d = 2.0
    sched = (
        per_host_topk(_frontier(spark), k=12, salt_buckets=4)
        .withColumn("pace_slot", pace_slot_col(d))
        .repartition(8, F.col("url"))
    )
    dup = (
        sched.groupBy("host", "pace_slot").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_fetch_stage_fires_in_calendar_order(spark):
    """fetch_stage executes each partition's rows in slot order (the
    production pacer sleeps to each slot; the sim clock is virtual).
    mapInPandas preserves emitted row order per partition, so the
    output order proves the firing order."""
    pdf = pd.DataFrame(
        {
            "url": [f"https://a.com/{i}" for i in range(6)],
            "attempt": [1] * 6,
            "seq": list(range(6)),
            "pace_slot": [7.5, 0.0, 3.0, 1.5, 6.0, 4.5],
        }
    )
    sched = spark.createDataFrame(pdf).coalesce(1)
    out = fetch_stage(sched).collect()
    assert [r.pace_slot for r in out] == sorted(pdf["pace_slot"])


def test_politeness_pacer_sleeps_to_absolute_slots():
    """The production pacer: sleeps until epoch_start + slot on a
    monotonic clock; late tasks never sleep (slot already passed)."""
    now = {"t": 100.0}
    slept = []

    def fake_now():
        return now["t"]

    def fake_sleep(s):
        slept.append(round(s, 6))
        now["t"] += s

    pacer = politeness_pacer(epoch_start=100.0, now=fake_now, sleep=fake_sleep)
    for slot in [0.0, 1.5, 3.0]:
        pacer(slot)
    assert slept == [1.5, 1.5]  # slot 0 fires immediately, then paced
    # a task starting late (clock already past the slot) must not sleep
    now["t"] = 200.0
    pacer(4.5)
    assert slept == [1.5, 1.5]


def test_politeness_pacer_per_host_floor_when_late():
    """A task running late must still keep same-host requests >= delay
    apart within its partition: the floor is last same-host fire +
    delay, not just the (already passed) slot."""
    now = {"t": 105.0}  # task starts 5s after epoch_start
    slept = []

    def fake_now():
        return now["t"]

    def fake_sleep(s):
        slept.append(round(s, 6))
        now["t"] += s

    pacer = politeness_pacer(
        epoch_start=100.0, delay_seconds=1.5, now=fake_now, sleep=fake_sleep
    )
    pacer(0.0, "a.com")   # slot long passed: fires immediately at 105
    pacer(1.5, "a.com")   # slot passed too, but floor = 105 + 1.5
    assert slept == [1.5]
    pacer(3.0, "b.com")   # other host: slot passed, no floor yet
    assert slept == [1.5]
    pacer(4.5, "b.com")   # floor for b.com = 106.5 + 1.5 = 108 > now
    assert slept == [1.5, 1.5]


def test_fetch_colocate_hosts_strict_mode(spark, tmp_path):
    """fetch_colocate_hosts=True: every host's scheduled rows share one
    fetch partition (the pacer floor becomes a strict global
    guarantee) and the crawl still matches the oracle exactly."""
    from web_archive_downloader_spark.datagen import default_config, gen_cdx_records
    from web_archive_downloader_spark.oracle.simulator import run_oracle
    from web_archive_downloader_spark.plans.crawl import PROCESSED_SCHEMA, CrawlPlan
    from web_archive_downloader_spark.sources.cdx import cdx_dataframe
    from web_archive_downloader_spark.sources.state import StateStore

    # relational property: host-keyed repartition co-locates
    df = _frontier(spark).repartition(8, F.col("host"))
    spread = (
        df.withColumn("p", F.spark_partition_id())
        .groupBy("host")
        .agg(F.countDistinct("p").alias("nparts"))
        .collect()
    )
    assert all(r.nparts == 1 for r in spread)

    # e2e equality with the strict mode on
    raw = gen_cdx_records(n_urls=20, seed=31)
    cfg = default_config(
        epoch_seconds=60.0, max_retries=2, fetch_colocate_hosts=True
    )
    store = StateStore(str(tmp_path / "cl"), spark)
    CrawlPlan(spark, store, cfg).run(cdx_dataframe(spark, raw))
    got = [
        r.url for r in store.read("processed", PROCESSED_SCHEMA).orderBy("seq").collect()
    ]
    assert got == run_oracle(raw, cfg).crawl_order


def test_live_pacing_wiring_preserves_order(spark, tmp_path):
    """live_pacing=True threads a pacer bound to (epoch wall-clock
    start, cfg.request_delay_seconds) into the fetch stage. With
    delay=0 the floor is a no-op, so the wiring is exercised without
    wall-clock sleeps — crawl order must be unchanged."""
    from web_archive_downloader_spark.datagen import default_config, gen_cdx_records
    from web_archive_downloader_spark.oracle.simulator import run_oracle
    from web_archive_downloader_spark.plans.crawl import PROCESSED_SCHEMA, CrawlPlan
    from web_archive_downloader_spark.sources.cdx import cdx_dataframe
    from web_archive_downloader_spark.sources.state import StateStore

    raw = gen_cdx_records(n_urls=15, seed=41)
    cfg = default_config(
        epoch_seconds=60.0, max_retries=2, live_pacing=True,
        request_delay_seconds=0.0,
    )
    store = StateStore(str(tmp_path / "lp"), spark)
    CrawlPlan(spark, store, cfg).run(cdx_dataframe(spark, raw))
    got = [
        r.url for r in store.read("processed", PROCESSED_SCHEMA).orderBy("seq").collect()
    ]
    assert got == run_oracle(raw, cfg).crawl_order
