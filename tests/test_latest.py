"""A1/W1 latest-snapshot-per-URL + crawl order vs the oracle's dict
semantics (cdx_client.py:101,129-130; main.py:58)."""

from web_archive_downloader_spark.datagen import gen_cdx_records
from web_archive_downloader_spark.operators.latest import latest_snapshot_per_url, valid_cdx
from web_archive_downloader_spark.oracle.simulator import process_cdx_oracle, strip_header
from web_archive_downloader_spark.sources.cdx import cdx_dataframe


def test_latest_matches_oracle_order_and_values(spark):
    raw = gen_cdx_records(n_urls=300, seed=7)
    oracle = process_cdx_oracle(strip_header(raw))

    df = latest_snapshot_per_url(valid_cdx(cdx_dataframe(spark, raw)))
    got = [(r.url, r.ts) for r in df.orderBy("seq").collect()]

    assert got == list(oracle.items())


def test_tie_first_occurrence_wins(spark):
    # same url, same ts twice; plus later smaller ts must not win
    raw = [
        ["https://e.com/a", "20230101000000", "text/html"],
        ["https://e.com/a", "20230101000000", "text/html"],
        ["https://e.com/a", "20220101000000", "text/html"],
        ["https://e.com/b", "20210101000000", "text/html"],
        ["https://e.com/a", "20240101000000", "text/html"],
    ]
    oracle = process_cdx_oracle(raw)
    df = latest_snapshot_per_url(valid_cdx(cdx_dataframe(spark, raw)))
    got = [(r.url, r.ts) for r in df.orderBy("seq").collect()]
    assert got == list(oracle.items())
    assert got[0] == ("https://e.com/a", "20240101000000")
    assert [u for u, _ in got] == ["https://e.com/a", "https://e.com/b"]


def test_invalid_records_skipped(spark):
    raw = [
        ["original", "timestamp", "mimetype"],  # header
        ["https://e.com/a", "20230101000000", "text/html"],
        ["https://e.com/b", "20abc10100000x", "text/html"],  # bad ts
        ["https://e.com/c", "2023", "text/html"],  # short ts
        ["", "20230101000000", "text/html"],  # empty url
        ["https://e.com/d"],  # short record
    ]
    oracle = process_cdx_oracle(strip_header(raw))
    df = latest_snapshot_per_url(valid_cdx(cdx_dataframe(spark, raw)))
    got = [(r.url, r.ts) for r in df.orderBy("seq").collect()]
    assert got == list(oracle.items()) == [("https://e.com/a", "20230101000000")]
