#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs per round): executes the headline
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] plus a synthetic multi-host crawl-pipeline
run, and prints ONE JSON line:
  {"metric": "...", "value": <crawl URLs/sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...}

--scaling mode: runs the SAME crawl job at two parallelism levels
(local[8] vs local[32]) in separate subprocesses (fresh JVMs) on the
same input and reports throughput at both + scaling efficiency
  eff = T(32) / (4 * T(8))   [BASELINE.md protocol]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "latest_event_per_user",
    "topk_events_per_user",
    "customers_no_orders",
    "dedup_exact",
    "minhash_sig",
    "lsh_candidates",
    "simhash",
    "ann_bruteforce",
    "text_stats",
]

CRAWL_URLS = int(os.environ.get("SPARK_GRAFT_CRAWL_URLS", "4000"))
CRAWL_HOSTS = 64


def _force(df) -> None:
    """Execute the full plan without driver materialization cost."""
    df.write.format("noop").mode("overwrite").save()


def run_crawl(spark, n_urls: int = CRAWL_URLS) -> dict:
    """Synthetic multi-host crawl: seed -> epochs -> finalize.
    Returns {urls: n, seconds: s, throughput: urls/sec, epochs: e}."""
    from web_archive_downloader_spark.datagen import default_config, gen_cdx_multihost
    from web_archive_downloader_spark.plans.crawl import CrawlPlan
    from web_archive_downloader_spark.sources.cdx import cdx_dataframe
    from web_archive_downloader_spark.sources.state import StateStore

    # moderate skew + generous token budget: the bench measures the
    # compute path (fetch/extract/route/commit); politeness-bounded
    # waiting is wall-clock sleep in production, not compute
    raw = gen_cdx_multihost(n_urls, CRAWL_HOSTS, zipf=0.7)
    # target_domain="" => per-page netloc (reference fallback,
    # html_processor.py:24), so same-host assets flow on every host
    cfg = default_config(epoch_seconds=180.0, target_domain="")
    tmp = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        store = StateStore(tmp, spark)
        plan = CrawlPlan(spark, store, cfg)
        t0 = time.perf_counter()
        stats = plan.run(cdx_dataframe(spark, raw))
        docs, assets = plan.finalize_outputs()
        n_docs = docs.count()
        n_assets = assets.count()
        dt = time.perf_counter() - t0
        return {
            "urls": n_urls,
            "seconds": round(dt, 3),
            "throughput_urls_per_sec": round(stats.scheduled / dt, 2),
            "epochs": stats.epochs,
            "scheduled": stats.scheduled,
            "docs": n_docs,
            "assets": n_assets,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    import __spark_entry__ as entry_mod
    from web_archive_downloader_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    crawl_only = "--crawl-only" in sys.argv

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    # warmup: pay JVM/codegen startup outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()

    q_times: dict[str, float] = {}
    if not crawl_only:
        qs = entry_mod.queries()
        for name in HEADLINE:
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            q_times[name] = round(time.perf_counter() - t0, 3)

    crawl = run_crawl(spark)
    total = round(sum(q_times.values()) + crawl["seconds"], 3)

    out = {
        "metric": "frontier throughput (URLs scheduled+fetched/sec); headline query latencies at sf",
        "value": total,
        "unit": "sec",
        "queries": q_times,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": cpus,
        "crawl": crawl,
        "crawl_urls_per_sec": crawl["throughput_urls_per_sec"],
    }
    print(json.dumps(out))
    spark.stop()


def scaling() -> None:
    """N vs 4N protocol: same crawl job, local[8] vs local[32]."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, __file__, "--crawl-only"],
            capture_output=True, text=True, env=env,
        )
        line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["crawl_urls_per_sec"]
    t32 = results[32]["crawl_urls_per_sec"]
    eff = t32 / (4 * t8)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency local[8] vs local[32]",
                "throughput_8": t8,
                "throughput_32": t32,
                "efficiency": round(eff, 3),
                "crawl_8": results[8]["crawl"],
                "crawl_32": results[32]["crawl"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
