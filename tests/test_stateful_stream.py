"""applyInPandasWithState per-host token bucket: grants <= budget per
window per host, deterministic, state carries across micro-batches."""

import pandas as pd

from web_archive_downloader_spark.streaming.stateful import rate_limit_stream


def test_rate_limiter_stateful_stream(spark, tmp_path):
    rows = []
    for host, n in [("a.com", 25), ("b.com", 4)]:
        for i in range(n):
            rows.append((host, f"https://{host}/{i}", 100 + i))  # 1 req/sec
    in_dir = str(tmp_path / "reqs")
    pdf = pd.DataFrame(rows, columns=["host", "url", "req_sec"])
    spark.createDataFrame(pdf).write.parquet(in_dir)

    stream = (
        spark.readStream.schema("host string, url string, req_sec long")
        .parquet(in_dir)
    )
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        rate_limit_stream(stream, budget=10, window_sec=20)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).toPandas()

    a = got[got.host == "a.com"]
    # windows [100,120) and [120,125): 10 granted in first, 5 lives in
    # second window (secs 120-124) all granted (budget 10)
    w1 = a[a.req_sec < 120]
    w2 = a[a.req_sec >= 120]
    assert int(w1.granted.sum()) == 10 and len(w1) == 20
    assert int(w2.granted.sum()) == len(w2) == 5
    b = got[got.host == "b.com"]
    assert bool(b.granted.all()) and len(b) == 4
