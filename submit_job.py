"""spark-submit entry point (BASELINE launch mode: ``spark-submit
--py-files`` on a multi-executor cluster).

Runs a small end-to-end crawl over the deterministic fixtures and
prints one JSON line of run stats. Usage:

    zip -r /tmp/wads.zip web_archive_downloader_spark
    spark-submit --master local[8] --py-files /tmp/wads.zip submit_job.py

On a real cluster, swap the master URL; the package zip ships to every
executor via --py-files.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def compute_batch_main(pages_path: str) -> None:
    """The scaling-protocol job under spark-submit (north-rule launch
    mode: ``spark-submit --py-files`` at two cluster sizes). Master,
    shuffle partitions and scan-split confs come from the submit
    command line; the job body is bench.run_compute_batch."""
    from pyspark import SparkConf

    import bench  # repo-root module; the script dir is on sys.path

    builder = (
        SparkSession.builder.appName("wads_scalebench")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
    )
    for k, v in bench.SCAN_SPLIT_CONF.items():  # shared with plain mode
        builder = builder.config(k, v)
    if not SparkConf().contains("spark.sql.shuffle.partitions"):
        builder = builder.config("spark.sql.shuffle.partitions", "16")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    bench.warm_compute_session(spark)  # identical warmup in both modes

    res = bench.run_compute_batch(spark, pages_path)
    res["cpus"] = spark.sparkContext.defaultParallelism
    print(json.dumps(res))
    spark.stop()


def main() -> None:
    if "--compute-batch" in sys.argv:
        compute_batch_main(sys.argv[sys.argv.index("--compute-batch") + 1])
        return
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    from pyspark import SparkConf

    builder = (
        SparkSession.builder.appName("wads_submit")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
    )
    # size shuffles to the actual cluster unless the submitter already
    # did (--conf wins): the 200-partition default turns every tiny
    # state-table shuffle into 200 tasks on a local[4] smoke run; on a
    # real cluster set ~2-3x total cores via --conf
    if not SparkConf().contains("spark.sql.shuffle.partitions"):
        builder = builder.config("spark.sql.shuffle.partitions", "16")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from web_archive_downloader_spark.datagen import default_config, gen_cdx_multihost
    from web_archive_downloader_spark.plans.crawl import CrawlPlan
    from web_archive_downloader_spark.sources.cdx import cdx_dataframe
    from web_archive_downloader_spark.sources.state import StateStore

    raw = gen_cdx_multihost(n_urls, 16, zipf=0.7)
    cfg = default_config(epoch_seconds=120.0, target_domain="")
    with tempfile.TemporaryDirectory(prefix="submit_crawl_") as tmp:
        store = StateStore(tmp, spark)
        plan = CrawlPlan(spark, store, cfg)
        stats = plan.run(cdx_dataframe(spark, raw))
        docs, assets = plan.finalize_outputs()
        print(
            json.dumps(
                {
                    "ok": True,
                    "epochs": stats.epochs,
                    "scheduled": stats.scheduled,
                    "docs": docs.count(),
                    "assets": assets.count(),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
