"""Vectorized fetch / extract stages (U1, U5, U7, SRC2-SRC5).

Each stage is an Arrow-batched ``mapInPandas`` / ``pandas_udf`` — the
only places Python runs, and always whole-batch (BASELINE.json:15 "no
per-row Python" at the Spark level; inside a batch the per-document
DOM work is inherently per-item, same as the reference's bs4 calls,
but amortized over Arrow transfer and free of Spark-row overhead).

Politeness pacing: scheduled rows carry ``pace_slot`` — an absolute
per-host time offset from the pace CALENDAR (operators/schedule.py:
pace_slot_col): request r to a host fires at epoch_start +
(r-1)*delay, so same-host requests are >= delay apart by construction
in ANY partition layout. fetch_stage executes each partition's rows
in slot order; in production each fetch first calls a
``politeness_pacer(epoch_start)`` that sleeps to its slot on the
executor's clock. In this sandbox the "content server" is the
deterministic shim in datagen.py (no live host to be polite to, and
real sleeps would distort oracle byte-equality runs), so the pacer is
exercised by unit tests with a fake clock while the slot assignment +
firing order are asserted on the real plan.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EngineConfig
from ..content.extract import (
    extract_title_from_soup,
    find_assets,
    find_main_content,
    html_to_markdown,
    rewrite_asset_links,
    _parse,
)
from ..content.paths import page_dir
from ..datagen import asset_bytes, wayback_fetch_sim


def politeness_pacer(epoch_start: float, delay_seconds: float = 0.0, now=None, sleep=None):
    """Production pace enforcement: returns wait(slot, host=None) which
    blocks until BOTH (a) ``epoch_start + slot`` on a monotonic clock
    and (b) the partition's last fire to ``host`` + ``delay_seconds``.
    The per-host floor (b) matters when a task runs LATE: slots alone
    would let a delayed rank-1 request fire right before an on-time
    rank-2 request — the floor re-spaces them to >= delay within the
    partition regardless of lateness. With fetch co-location
    (EngineConfig.fetch_colocate_hosts) all of a host's rows share one
    partition and the floor is a strict global guarantee; in scatter
    mode the calendar guarantees spacing when tasks launch on schedule
    (the normal case — a stage's tasks start together) and stragglers
    can compress cross-partition gaps by at most their lateness.
    Injectable clock for tests; defaults to time.monotonic/time.sleep."""
    import time as _time

    now = now or _time.monotonic
    sleep = sleep or _time.sleep
    last_fire: dict[str, float] = {}

    def wait(slot: float, host: str | None = None) -> None:
        target = epoch_start + slot
        if host is not None and host in last_fire:
            target = max(target, last_fire[host] + delay_seconds)
        remaining = target - now()
        if remaining > 0:
            sleep(remaining)
        if host is not None:
            last_fire[host] = now()

    return wait


def fetch_stage(scheduled: DataFrame, pacer=None) -> DataFrame:
    """SRC2/U7: one fetch attempt per scheduled frontier row.
    Input needs (url, attempt); output adds (outcome, html).

    If the input carries ``pace_slot``, the WHOLE partition is
    drained and sorted before any fetch fires, so execution follows
    the politeness calendar's firing order across Arrow-batch
    boundaries (mapInPandas splits partitions at ~10k rows; a
    per-batch sort would let a later batch's low-slot row fire out of
    calendar order under live pacing). Memory: the drained rows are
    the PRE-fetch frontier slice (url/host/slot — no html), bounded
    per epoch by the per-host budgets; fetched output is re-chunked
    so no Arrow batch carries the whole partition's payload bytes. A
    ``pacer`` factory (epoch-relative, e.g. politeness_pacer bound to
    epoch_start) is invoked per row before its fetch in live
    deployments."""
    out_schema = T.StructType(
        scheduled.schema.fields
        + [T.StructField("outcome", T.StringType()), T.StructField("html", T.StringType())]
    )
    paced = "pace_slot" in scheduled.columns
    _OUT_CHUNK = 4096

    def run_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        outcomes, htmls = [], []
        hosts = pdf["host"] if "host" in pdf.columns else None
        for i, (url, attempt) in enumerate(zip(pdf["url"], pdf["attempt"])):
            if paced and pacer is not None:
                pacer(
                    float(pdf["pace_slot"].iloc[i]),
                    hosts.iloc[i] if hosts is not None else None,
                )
            o, h = wayback_fetch_sim(url, int(attempt))
            outcomes.append(o)
            htmls.append(h)
        pdf = pdf.copy()
        pdf["outcome"] = outcomes
        pdf["html"] = htmls
        return pdf

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not paced:
            for pdf in batches:
                yield run_chunk(pdf)
            return
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        whole = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        sort_cols = ["pace_slot"] + (["seq"] if "seq" in whole.columns else [])
        whole = whole.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        for start in range(0, len(whole), _OUT_CHUNK):
            yield run_chunk(
                whole.iloc[start : start + _OUT_CHUNK].reset_index(drop=True)
            )

    return scheduled.mapInPandas(fetch_batches, out_schema)


# SRC4/X9: the Memento API's nested response shape
# (memento_client.py:45-53) as a Spark schema for from_json.
MEMENTO_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("original_uri", T.StringType()),
        T.StructField(
            "mementos",
            T.StructType(
                [
                    T.StructField(
                        "closest",
                        T.StructType(
                            [
                                T.StructField("datetime", T.StringType()),
                                T.StructField("uri", T.ArrayType(T.StringType())),
                            ]
                        ),
                    )
                ]
            ),
        ),
    ]
)


def memento_lookup_stage(dead: DataFrame) -> DataFrame:
    """SRC4: Memento TimeTravel lookup. The HTTP call is the only
    Python step (mapInPandas shim attaching the raw response body);
    the response NAVIGATION is fully relational — ``from_json`` with
    the nested struct/array schema, ``mementos.closest.uri[0]``
    selection, and the web.archive.org loop-guard filter as Catalyst
    expressions (memento_client.py:45-61). Malformed / missing-key /
    absent bodies all surface as a null uri (from_json is null-safe),
    exactly like the reference's isinstance checks.

    Output adds (memento_uri nullable, lookup_result in
    'found'|'loop'|'none')."""
    from ..datagen import memento_api_json

    raw_schema = T.StructType(
        dead.schema.fields + [T.StructField("memento_api_raw", T.StringType())]
    )

    def lookup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["memento_api_raw"] = [memento_api_json(u) for u in pdf["url"]]
            yield pdf

    with_raw = dead.mapInPandas(lookup, raw_schema)
    parsed = with_raw.withColumn(
        "_m", F.from_json("memento_api_raw", MEMENTO_RESPONSE_SCHEMA)
    )
    uri0 = F.col("_m").getField("mementos").getField("closest").getField("uri").getItem(0)
    host = F.coalesce(F.parse_url(uri0, F.lit("HOST")), F.lit(""))
    is_loop = host.contains("web.archive.org")  # netloc substring check, :56
    return parsed.select(
        *[F.col(f.name) for f in dead.schema.fields],
        F.when(uri0.isNotNull() & ~is_loop, uri0).alias("memento_uri"),
        F.when(uri0.isNull(), F.lit("none"))
        .when(is_loop, F.lit("loop"))
        .otherwise(F.lit("found"))
        .alias("lookup_result"),
    )


def memento_stage(dead: DataFrame, config: EngineConfig) -> DataFrame:
    """SRC4/SRC5: memento fallback for wayback-dead rows — JSON
    lookup + navigation (memento_lookup_stage) then content fetch of
    the resolved URI with the reference's '<html' validity probe
    (memento_client.py:112-116). The reference performs the whole
    fallback inside one loop iteration (main.py:71-93); here it is
    two vectorized stages in one plan. Output adds
    (memento_result, memento_html)."""
    from ..datagen import memento_content_fetch

    looked_up = memento_lookup_stage(dead)
    fetch_schema = T.StructType(
        looked_up.schema.fields + [T.StructField("_content", T.StringType())]
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_content"] = [
                memento_content_fetch(u) if isinstance(u, str) else None
                for u in pdf["memento_uri"]
            ]
            yield pdf

    fetched = looked_up.mapInPandas(fetch, fetch_schema)
    html_ok = F.col("_content").isNotNull() & F.lower(F.col("_content")).contains("<html")
    return fetched.select(
        *[F.col(f.name) for f in dead.schema.fields],
        F.when(F.col("lookup_result") != "found", F.col("lookup_result"))
        .when(html_ok, F.lit("ok"))
        .otherwise(F.lit("non_html"))
        .alias("memento_result"),
        F.when(html_ok, F.col("_content")).alias("memento_html"),
    )


_ASSETS_TYPE = T.ArrayType(
    T.StructType(
        [T.StructField("kind", T.StringType()), T.StructField("asset_url", T.StringType())]
    )
)


def find_assets_stage(pages: DataFrame, config: EngineConfig) -> DataFrame:
    """U1 as a UDTF-shaped pandas UDF + explode: pages(url, html) ->
    asset rows (url, kind, asset_url, kind_rank, url_rank). Only
    enabled kinds (F10 plan-time pruning) and canonical sorted order
    within a kind (SURVEY A2)."""
    kinds = config.enabled_asset_kinds

    @F.pandas_udf(_ASSETS_TYPE)
    def assets_udf(urls: pd.Series, htmls: pd.Series) -> pd.Series:
        out = []
        for url, html in zip(urls, htmls):
            found = find_assets(html, url, config)
            row = []
            for kind in kinds:  # js, css, img stage order (main.py:104-107)
                for a in found.get(kind, []):
                    row.append({"kind": kind, "asset_url": a})
            out.append(row)
        return pd.Series(out)

    exploded = (
        pages.withColumn("__assets", assets_udf(F.col("url"), F.col("html")))
        .select("url", "ts", "seq", F.posexplode_outer("__assets").alias("pos", "a"))
        .filter(F.col("a").isNotNull())
        .select(
            F.col("url").alias("page_url"),
            "ts",
            "seq",
            F.col("a.kind").alias("kind"),
            F.col("a.asset_url").alias("asset_url"),
            F.col("pos").alias("asset_pos"),
        )
    )
    return exploded


def asset_fetch_stage(assets: DataFrame) -> DataFrame:
    """SRC3: fetch asset bytes (binary column). Adds (bytes, nbytes);
    failed fetches yield null bytes and are dropped by the sink filter
    (reference skips them, main.py:135-137)."""
    out_schema = T.StructType(
        assets.schema.fields
        + [T.StructField("bytes", T.BinaryType()), T.StructField("nbytes", T.IntegerType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, sizes = [], []
            for a in pdf["asset_url"]:
                b = asset_bytes(a)
                blobs.append(b)
                sizes.append(len(b) if b else None)
            pdf = pdf.copy()
            pdf["bytes"] = blobs
            pdf["nbytes"] = pd.array(sizes, dtype="Int32")
            yield pdf

    return assets.mapInPandas(run, out_schema)


def extract_stage(pages: DataFrame, config: EngineConfig) -> DataFrame:
    """U5 phase 1 (epoch-time): title + selected content area HTML.

    Link-rewrite + markdown conversion are deferred to the finalize
    pass (finalize_markdown_stage) because asset-relative paths depend
    on globally-assigned collision names (see operators/collisions.py
    docstring). Output adds (title, content_html)."""
    out_schema = T.StructType(
        pages.schema.fields
        + [
            T.StructField("title", T.StringType()),
            T.StructField("content_html", T.StringType()),
            T.StructField("md_ok", T.BooleanType()),
        ]
    )
    selectors = tuple(config.content_selectors)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            titles, contents, md_oks = [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                if not html:
                    titles.append(None)
                    contents.append(None)
                    md_oks.append(False)
                    continue
                try:
                    soup = _parse(html)
                    title = extract_title_from_soup(soup, url)
                    content = find_main_content(soup, selectors)
                    content_str = str(content) if content is not None else None
                    titles.append(title)
                    contents.append(content_str)
                    # provisional success probe (main.py:155): the
                    # later link-rewrite only alters attribute values,
                    # which cannot change markdown emptiness, so this
                    # equals the reference's post-rewrite check
                    md_oks.append(bool(html_to_markdown(content_str)) if content_str else False)
                except Exception:
                    titles.append(None)
                    contents.append(None)
                    md_oks.append(False)
            pdf = pdf.copy()
            pdf["title"] = titles
            pdf["content_html"] = contents
            pdf["md_ok"] = md_oks
            yield pdf

    return pages.mapInPandas(run, out_schema)


def finalize_markdown_stage(docs_with_assets: DataFrame, config: EngineConfig) -> DataFrame:
    """U5 phase 2 (finalize): rewrite asset links to the assigned
    local names (J2 join result passed as ``saved_assets`` json) and
    convert to markdown. Input: (url, content_html, saved_assets);
    output adds ``markdown`` (null => extract_fail)."""
    out_schema = T.StructType(
        docs_with_assets.schema.fields + [T.StructField("markdown", T.StringType())]
    )
    rewrite = config.rewrite_asset_links
    include_srcset = getattr(config, "include_srcset", False)
    output_dir = config.output_dir

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mds = []
            for url, content_html, saved_json in zip(
                pdf["url"], pdf["content_html"], pdf["saved_assets"]
            ):
                if not content_html:
                    mds.append(None)
                    continue
                try:
                    soup = _parse(content_html)
                    saved = json.loads(saved_json) if saved_json else {}
                    if rewrite and saved:
                        save_dir = page_dir(url, output_dir)
                        soup = rewrite_asset_links(
                            soup, url, save_dir, saved,
                            include_srcset=include_srcset,
                        )
                    mds.append(html_to_markdown(str(soup)))
                except Exception:
                    mds.append(None)
            pdf = pdf.copy()
            pdf["markdown"] = mds
            yield pdf

    return docs_with_assets.mapInPandas(run, out_schema)
