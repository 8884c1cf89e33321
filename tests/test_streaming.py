"""Structured Streaming: file-source CDX ingest (exactly-once) and
watermarked windowed event rates vs the batch equivalent."""

import pandas as pd
from pyspark.sql import functions as F

from web_archive_downloader_spark.datagen import gen_cdx_records
from web_archive_downloader_spark.oracle.simulator import process_cdx_oracle, strip_header
from web_archive_downloader_spark.streaming.events import (
    stream_cdx_ingest,
    stream_event_rates,
    windowed_event_rates,
)

SF = "/root/testdata/sf0.01"


def test_stream_cdx_ingest_validates_and_preserves(spark, tmp_path):
    raw = gen_cdx_records(n_urls=100, seed=5)
    rows = [
        (r[0] or None, r[1] if len(r) > 1 else None, r[2] if len(r) > 2 else None, i)
        for i, r in enumerate(strip_header(raw))
        if isinstance(r, list)
    ]
    in_dir = str(tmp_path / "in")
    pdf = pd.DataFrame(rows, columns=["url", "ts", "mimetype", "seq"])
    # two shard files arriving "over time"
    spark.createDataFrame(pdf.iloc[: len(pdf) // 2]).write.parquet(in_dir + "/shard1")
    spark.createDataFrame(pdf.iloc[len(pdf) // 2 :]).write.parquet(in_dir + "/shard2")

    q = stream_cdx_ingest(
        spark, in_dir + "/*", str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    got_urls = {r.url for r in out.select("url").collect()}
    oracle_urls = set(process_cdx_oracle(strip_header(raw)).keys())
    assert got_urls == oracle_urls  # validation filters identical to F4/F5
    assert out.filter(F.col("host").isNull()).count() == 0


def test_windowed_rates_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = windowed_event_rates(events)

    # file stream source requires a directory
    in_dir = str(tmp_path / "events_in")
    events.repartition(4).write.parquet(in_dir)
    q = stream_event_rates(
        spark, in_dir, str(tmp_path / "rates"), str(tmp_path / "ck2")
    )
    q.awaitTermination(180)
    streamed = spark.read.parquet(str(tmp_path / "rates"))

    b = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    s = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in streamed.collect()}
    # append-mode watermarking may withhold the trailing window(s)
    assert set(s) <= set(b)
    emitted_windows = {k[0] for k in s}
    all_windows = sorted({k[0] for k in b})
    assert len(emitted_windows) >= len(all_windows) - 2
    for k, v in s.items():
        assert b[k] == v
