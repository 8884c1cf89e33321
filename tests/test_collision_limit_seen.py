"""Collision-limit save_fail semantics at scale: when >100 pages in
one directory share a sanitized title, the excess saves abort
(file_handler.py:135-137) and those URLs must NOT be in the exported
URL-seen checkpoint (main.py:161-166). The epoch-time url_seen is
provisional; final_url_seen reconciles it against finalized docs."""

from web_archive_downloader_spark.config import EngineConfig
from web_archive_downloader_spark.oracle.simulator import run_oracle
from web_archive_downloader_spark.plans.crawl import CrawlPlan
from web_archive_downloader_spark.sources.cdx import cdx_dataframe
from web_archive_downloader_spark.sources.state import StateStore


def test_final_seen_excludes_collision_limit_failures(spark, tmp_path, monkeypatch):
    # 130 pages, same dir (/p/x-N with dir output/p), same title
    import web_archive_downloader_spark.datagen as dg

    # >101 same-name pages trips the limit; 104 keeps the overflow
    # class (3 aborted saves) without paying for 30 extra pages
    urls = [f"https://ex.com/p/x-{i}" for i in range(104)]
    raw = [[u, "20230101000000", "text/html"] for u in urls]

    fixed_html = (
        "<html><head><title>Same Title</title></head>"
        '<body><div id="content"><p>body</p></div></body></html>'
    )
    monkeypatch.setattr(dg, "page_html", lambda url: fixed_html)
    monkeypatch.setattr(dg, "fetch_outcome", lambda url, attempt: "ok")
    # the fetch shim and oracle consult these via module attribute lookups
    import web_archive_downloader_spark.oracle.simulator as sim
    import web_archive_downloader_spark.sources.fetch_shim as shim

    monkeypatch.setattr(
        shim, "wayback_fetch_sim", lambda url, attempt: ("ok", fixed_html)
    )
    monkeypatch.setattr(
        sim, "wayback_fetch_sim", lambda url, attempt: ("ok", fixed_html)
    )

    cfg = EngineConfig(target_domain="ex.com", epoch_seconds=600.0, download_css=False, download_images=False, save_original_html=False)
    oracle = run_oracle(raw, cfg)
    # oracle: only 100 fit (Same_Title.md .. Same_Title-99.md)
    assert len(oracle.seen) == 100
    assert len(oracle.docs) == 100

    store = StateStore(str(tmp_path / "s"), spark)
    plan = CrawlPlan(spark, store, cfg)
    plan.run(cdx_dataframe(spark, raw))
    docs, _ = plan.finalize_outputs()
    got_docs = {(r.url, r.filename) for r in docs.collect()}
    exp_docs = {(d["url"], d["filename"]) for d in oracle.docs}
    assert got_docs == exp_docs

    final_seen = {r.url for r in plan.final_url_seen(docs).collect()}
    assert final_seen == oracle.seen_set
    assert len(final_seen) == 100
