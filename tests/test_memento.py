"""SRC4/SRC5: Memento lookup + content fetch — the nested-JSON
navigation (from_json struct/array schema, uri[0], web.archive.org
loop guard; reference memento_client.py:45-61) and the end-to-end
result routing against the deterministic simulator."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from web_archive_downloader_spark.datagen import (
    memento_api_json,
    memento_outcome,
)
from web_archive_downloader_spark.sources.fetch_shim import (
    memento_lookup_stage,
    memento_stage,
)


def _dead_df(spark, urls):
    pdf = pd.DataFrame(
        {
            "url": urls,
            "ts": ["20200101000000"] * len(urls),
            "seq": list(range(len(urls))),
            "attempt": [1] * len(urls),
        }
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("attempt", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(pdf, schema)


def test_lookup_navigation_and_loop_guard(spark):
    urls = [f"https://example.com/dead/{i}" for i in range(200)]
    dead = _dead_df(spark, urls)
    got = {r.url: (r.memento_uri, r.lookup_result) for r in memento_lookup_stage(dead).collect()}
    for u in urls:
        m = memento_outcome(u)
        uri, res = got[u]
        if m in ("ok", "non_html"):
            assert res == "found" and uri is not None
            assert "web.archive.org" not in uri
            assert uri.endswith("/" + u)  # original embedded in the mirror URI
        elif m == "loop":
            # the API DID return a closest uri, but the loop guard drops it
            assert res == "loop" and uri is None
            assert "web.archive.org" in memento_api_json(u)
        else:
            assert res == "none" and uri is None


def test_memento_stage_results_match_outcomes(spark):
    urls = [f"https://example.com/dead/{i}" for i in range(200)]
    dead = _dead_df(spark, urls)
    got = {r.url: (r.memento_result, r.memento_html) for r in memento_stage(dead, None).collect()}
    for u in urls:
        m = memento_outcome(u)
        res, html = got[u]
        assert res == m
        if m == "ok":
            assert html and "<html" in html.lower()
        else:
            assert html is None


def test_lookup_is_relational_json_navigation(spark):
    """The navigation itself (post-lookup) must be Catalyst
    expressions — from_json + GetStructField/GetArrayItem — not a
    second Python pass: exactly one Python stage (the HTTP shim) in
    the lookup plan."""
    dead = _dead_df(spark, ["https://example.com/x"])
    plan_df = memento_lookup_stage(dead)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    import re

    py_nodes = re.findall(r"\(\d+\) (MapInPandas|ArrowEvalPython|BatchEvalPython)", plan)
    assert py_nodes == ["MapInPandas"]  # the HTTP shim, nothing else
    assert "from_json" in plan
