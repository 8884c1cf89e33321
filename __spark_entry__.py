"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 plus the training-data operator suite, each mapped onto
the driver-provided testdata tables; ``oracle_sql()`` gives the
DuckDB-portable twin (identical hashing: md5-derived 56-bit ints,
polynomial char folds — verified primitive-by-primitive).
Non-SQL-expressible ops (the epoch crawl pipeline itself, image
decode, LSH-ANN recall) are verified in tests/ against the sequential
oracle instead.
"""

from __future__ import annotations

import functools
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from web_archive_downloader_spark.functions.scalar import (
    backoff_epochs_col,
    format_archived_ts_col,
    sanitize_filename_col,
    url_fallback_title_col,
)
from web_archive_downloader_spark.functions.textstats import document_stats
from web_archive_downloader_spark.operators.ann import brute_force_topk
from web_archive_downloader_spark.operators.collisions import assign_collision_names
from web_archive_downloader_spark.operators.dedup import (
    _perm_params,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    signature_clusters,
    similarity_pairs,
    simhash,
)
from web_archive_downloader_spark.operators.packing import pack_sequences

from web_archive_downloader_spark.operators.dedup import MOD  # noqa: E402

ANN_QUERY_IDS = [3, 17, 42, 111, 256]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Shared MinHash signature materialization (the state-store pattern):
# the dedup family — minhash_sig, sig_clusters, lsh_candidates,
# similarity_pairs, dedup_components — all consume the
# same (doc_id, sig) relation; a production pipeline materializes it
# once as a table and every downstream pass reads it. Memoized per
# (session, sf_dir) as an eagerly localCheckpointed frame. Values are
# a pure deterministic function of the documents table, so the DuckDB
# twins (which recompute from scratch in SQL) still match bit-for-bit.
_SIG_CACHE: dict = {}


def _sig16(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keyed by applicationId, not id(spark): a stopped session's id can
    # be reused by CPython, which would serve a checkpointed frame
    # bound to a dead SparkContext. Entries from OTHER applications are
    # evicted (one live app per process): dead-session frames must not
    # accumulate for the process lifetime.
    app = spark.sparkContext.applicationId
    for stale in [k for k in _SIG_CACHE if k[0] != app]:
        del _SIG_CACHE[stale]
    key = (app, sf_dir)
    ent = _SIG_CACHE.get(key)
    if ent is None:
        # materialized with REAL stats (persist + count) rather than
        # localCheckpoint: a LogicalRDD's unknown sizeInBytes poisons
        # every downstream join-size estimate in the dedup family,
        # forcing sort-merge joins on relations that broadcast at their
        # true size (see partitioning.materialize_with_stats)
        from web_archive_downloader_spark.partitioning import materialize_with_stats

        ent = materialize_with_stats(minhash_signatures(_t(spark, sf_dir, "documents"), k=16))
        _SIG_CACHE[key] = ent
    return ent


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the crawl-schedule shape (A1 latest-per-key ->
    J1 anti-join -> per-host budget top-k) over sf0.001 events."""
    sf = "/root/testdata/sf0.001"
    events = _t(spark, sf, "events")
    # latest event per user (A1), excluding users whose latest is an
    # error (seen-set analog), then top-16 users by value (budget)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.asc("event_id"))
    latest = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    errors = latest.filter(F.col("event_type") == "error").select("user_id")
    ok = latest.join(errors, "user_id", "left_anti")
    # global top-k via orderBy().limit(k): Spark plans
    # TakeOrderedAndProject (per-partition top-k + driver merge), not a
    # single-partition global sort window. Rank is attached AFTER the
    # limit, so the window runs over k rows, not the whole table.
    w2 = Window.orderBy(F.desc("value"), F.asc("user_id"))
    return (
        ok.orderBy(F.desc("value"), F.asc("user_id"))
        .limit(16)
        .withColumn("rank", F.row_number().over(w2))
        .select("user_id", "event_id", "event_type", "value", "rank")
    )


# ------------------------------------------------------------- queries

def _q_latest_event_per_user(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )


def _q_customers_no_orders(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o.select(F.col("o_custkey")), c.c_custkey == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


def _q_topk_events_per_user(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", "event_id", "value")
    )


def _q_budgeted_topk(spark, sf):
    """per_host_topk with a PER-KEY budget table (the robots
    crawl_delay-derived token path): each user's cap varies, missing
    users fall back to k, budgets above k clamp to k."""
    from web_archive_downloader_spark.operators.schedule import per_host_topk

    ev = _t(spark, sf, "events")
    frontier = ev.select(
        F.concat(F.lit("https://u/"), F.col("event_id").cast("string")).alias("url"),
        F.col("user_id").alias("host"),
        F.lit(0.0).alias("priority"),
        F.lit(0).alias("depth"),
        F.col("event_id").alias("seq"),
    )
    budgets = (
        ev.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)  # half the keys get explicit budgets
        .select(
            F.col("user_id").alias("host"),
            (F.col("user_id") % 5 + 1).cast("int").alias("host_budget"),
        )
    )
    return per_host_topk(frontier, k=3, salt_buckets=4, budgets=budgets).select(
        F.col("host").alias("user_id"), F.col("seq").alias("event_id"), "host_rank"
    )


def _q_route_counts(spark, sf):
    ev = _t(spark, sf, "events")
    outcome = (
        F.when(F.col("event_type") == "error", F.lit("http_500"))
        .when(F.col("event_type") == "purchase", F.lit("http_429"))
        .otherwise(F.lit("ok"))
    )
    attempt = (F.col("event_id") % 5 + 1).cast("int")
    from web_archive_downloader_spark.functions.scalar import route_col

    return (
        ev.select(route_col(outcome, attempt, 3).alias("route"))
        .groupBy("route")
        .agg(F.count("*").alias("n"))
    )


def _q_backoff(spark, sf):
    ev = _t(spark, sf, "events")
    attempt = (F.col("event_id") % 4 + 1).cast("int")
    return (
        ev.select(attempt.alias("attempt"), backoff_epochs_col(attempt).alias("backoff_epochs"))
        .groupBy("attempt", "backoff_epochs")
        .agg(F.count("*").alias("n"))
    )


def _q_sanitize_docs(spark, sf):
    d = _t(spark, sf, "documents")
    raw = F.concat(F.lit(" . "), F.substring("text", 1, 30), F.lit("? "))
    return d.select("doc_id", sanitize_filename_col(raw).alias("fname"))


def _q_title_fallback(spark, sf):
    d = _t(spark, sf, "documents")
    url = F.concat(
        F.lit("https://ex.com/"), F.col("source"), F.lit("/item-"),
        F.col("doc_id").cast("string"), F.lit("_"), F.col("lang"),
    )
    return d.select("doc_id", url_fallback_title_col(url).alias("title"))


def _q_ts_format(spark, sf):
    ev = _t(spark, sf, "events")
    ts14 = F.date_format("ts", "yyyyMMddHHmmss")
    return ev.select("event_id", format_archived_ts_col(ts14).alias("archived_ts"))


def _q_collision_names(spark, sf):
    d = _t(spark, sf, "documents")
    saves = d.select(
        F.col("source").alias("dir"),
        F.col("lang").alias("base"),
        F.lit(".md").alias("ext"),
        F.lit("page").alias("style"),
        F.col("doc_id").alias("save_seq"),
    )
    return assign_collision_names(saves).select(
        F.col("save_seq").alias("doc_id"), "dir", "filename"
    )


def _q_html_names(spark, sf):
    """SNK2 naming: every doc saves BOTH a .md and a .html file with
    the same (dir, base) — the collision namespaces must stay
    independent per extension (the reference's exists-probe includes
    the extension, file_handler.py:180-188), so each ext gets its own
    -N counter sequence."""
    d = _t(spark, sf, "documents")
    md = d.select(
        F.col("source").alias("dir"),
        F.col("lang").alias("base"),
        F.lit(".md").alias("ext"),
        F.lit("page").alias("style"),
        (F.col("doc_id") * 2).alias("save_seq"),
    )
    html = d.select(
        F.col("source").alias("dir"),
        F.col("lang").alias("base"),
        F.lit(".html").alias("ext"),
        F.lit("page").alias("style"),
        (F.col("doc_id") * 2 + 1).alias("save_seq"),
    )
    return assign_collision_names(md.unionByName(html)).select(
        "save_seq", "dir", "ext", "filename"
    )


def _q_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q_revenue_by_nation(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    n = _t(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


def _q_dedup_exact(spark, sf):
    return exact_dedup(_t(spark, sf, "documents"))


def _q_minhash_sig(spark, sf):
    return _sig16(spark, sf).select("doc_id", F.posexplode("sig").alias("i", "minv"))


def _q_sig_clusters(spark, sf):
    return signature_clusters(_t(spark, sf, "documents"), k=16, sig=_sig16(spark, sf))


def _q_lsh_candidates(spark, sf):
    return minhash_lsh_candidates(
        _t(spark, sf, "documents"), k=16, bands=4, sig=_sig16(spark, sf)
    )


def _q_similarity_pairs(spark, sf):
    """One checked entry for the candidate-ranking similarity suite:
    exact token Jaccard + bigram Jaccard + MinHash signature estimate,
    computed in a SINGLE candidate join (operators/dedup.py
    similarity_pairs — consolidates the former jaccard_pairs /
    ngram_jaccard / minhash_jaccard_estimate entries; at scale the
    candidate relation joins twice total instead of six times)."""
    d = _t(spark, sf, "documents")
    sig = _sig16(spark, sf)
    return similarity_pairs(
        d, minhash_lsh_candidates(d, k=16, bands=4, sig=sig), sig=sig, k=16, n=2
    )


def _q_sequence_packing(spark, sf):
    """Sequence packing (operators/packing.py): documents -> fixed
    token-budget training sequences, greedy first-fit in doc_id order
    within doc_id%8 shards, budget=256 whitespace tokens. Exactly one
    shuffle (the shard exchange feeding applyInPandas); token counts
    ride the scan projection. The DuckDB twin replays the identical
    greedy fold as a linear recursive CTE."""
    d = _t(spark, sf, "documents")
    from web_archive_downloader_spark.functions.textstats import token_count_col

    toks = d.select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(toks, budget=256, n_shards=8)


def _q_simhash(spark, sf):
    return simhash(_t(spark, sf, "documents"), bits=32)


def _q_simhash_pairs(spark, sf):
    """Chunk-blocked simhash near-dup pairs (pigeonhole: hamming<=3
    over 32 bits guarantees one equal 8-bit chunk) — candidate join is
    an equi-join on (chunk, key), never all-pairs."""
    from web_archive_downloader_spark.operators.dedup import simhash_near_dups

    return simhash_near_dups(_t(spark, sf, "documents"), bits=32, max_hamming=3)


def _q_dedup_components(spark, sf):
    """Dedup clustering: connected components (iterative min-label
    propagation, localCheckpoint per round) over exact-hash star +
    same-signature star + Jaccard-verified LSH edges. The DuckDB twin
    computes the same components with a recursive CTE."""
    from web_archive_downloader_spark.operators.dedup import dedup_components

    return dedup_components(
        _t(spark, sf, "documents"), jaccard_threshold=0.4, sig=_sig16(spark, sf)
    )


def _q_corpus_selection(spark, sf):
    """The flagship training-data operation end-to-end: keep one
    representative per near-dup cluster (dedup_components) that also
    passes the quality gate (document_stats: quality score + token
    floor). Composes the two independently-checked relations; the
    DuckDB twin composes the recursive-CTE components with the stats
    SQL the same way. Output: the keep-list with its audit columns."""
    from web_archive_downloader_spark.operators.dedup import dedup_components

    from web_archive_downloader_spark.partitioning import widen_narrow_scan

    d = _t(spark, sf, "documents")
    comp = dedup_components(d, jaccard_threshold=0.4, sig=_sig16(spark, sf))
    csize = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    stats = document_stats(widen_narrow_scan(d)).select(
        "doc_id", "quality", "n_tokens", "lang_pred"
    )
    return (
        comp.join(csize, "component")
        .join(stats, "doc_id")
        .filter(
            (F.col("doc_id") == F.col("component"))
            & (F.col("quality") >= 0.5)
            & (F.col("n_tokens") >= 5)
        )
        .select("doc_id", "cluster_size", "quality", "n_tokens", "lang_pred")
    )


def _q_volume_shipping(spark, sf):
    """Q7-style: revenue flow between supplier-nation and
    customer-nation pairs per ship year, for two chosen nations. Two
    broadcast dim joins (nation twice under different roles), big-side
    joins on the fact keys, partial+final agg. The nation dims are
    filtered to the two chosen nations BEFORE the joins (each inner
    broadcast join then drops ~23/25 of its fact rows at the join, a
    ~25x smaller join output at TPC-H selectivity); the residual pair
    filter above the joins only removes the two same-nation combos."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _q_click_attribution(spark, sf):
    """RANGE JOIN (interval-bucketed): clicks attributed to each
    purchase by the same user within the preceding 30 minutes
    (half-open [p.ts-30min, p.ts)). The operator quantizes time into
    window-span buckets so the join is a pure equi-join on
    (user_id, bucket) — never a per-key cross product with a post
    filter, never a BNLJ (plan-asserted in test_plan_shapes);
    purchases with no clicks ride back in via a left join."""
    from web_archive_downloader_spark.operators.rangejoin import (
        MICROS_PER_MINUTE,
        range_join,
    )

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("v"),
    )
    pairs = range_join(
        purchases, clicks, key="user_id",
        lower_micros=-30 * MICROS_PER_MINUTE, upper_micros=0,
        left_ts="p_ts", right_ts="c_ts",
    )
    agg = pairs.groupBy("purchase_id").agg(
        F.count("*").alias("n_clicks"),
        F.round(F.sum("v"), 4).alias("click_value"),
    )
    return (
        purchases.select("purchase_id")
        .join(agg, "purchase_id", "left")
        .select(
            "purchase_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("click_value", F.lit(0.0)).alias("click_value"),
        )
    )


def _q_moving_avg_events(spark, sf):
    """Window FRAME analytics: per-user 3-row moving average of event
    value ordered by (ts, event_id) — one shuffle on the key, frame
    runs inside the sorted partition."""
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("mavg3"),
    )


def _q_cube_revenue(spark, sf):
    """CUBE over (returnflag, linestatus): all 4 grouping sets in one
    pass (Spark expands then partial+final aggregates)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def _q_ann_bruteforce(spark, sf):
    # dim=64 is the checked contract (the DuckDB twin folds exactly 64
    # components); passing it unrolls the cosine into codegen-able
    # arithmetic with identical left-to-right association
    return brute_force_topk(_t(spark, sf, "embeddings"), ANN_QUERY_IDS, k=10, dim=64)


def _q_ann_lsh_topk(spark, sf):
    """The SCALE ANN path as a CHECKED query: multi-table sign-LSH
    with 1-bit multiprobe (operators/ann.py:lsh_bucketed_topk). The
    DuckDB twin replays the same literal hyperplanes (the
    literal-plane technique from the neardup twin), so the candidate
    sets — and hence the approximate top-k — are identical, not just
    recall-gated."""
    from web_archive_downloader_spark.operators.ann import lsh_bucketed_topk

    return lsh_bucketed_topk(
        _t(spark, sf, "embeddings"), ANN_QUERY_IDS, k=10
    )


@functools.lru_cache(maxsize=8)
def _ivf_centroids(sf_dir: str, n_clusters: int = 16, iters: int = 5) -> tuple:
    """Deterministic IVF codebook shared by the engine query and the
    DuckDB twin: plain Lloyd's in numpy float64 over the vec_id-sorted
    embeddings, init = first n_clusters vectors (no RNG). Both sides
    consume the RESULTING centroid literals, so cross-engine identity
    only requires the (shared, literal) inputs — the per-row
    assignment argmin is recomputed in each engine with the same
    left-to-right fold. Production analog: codebooks are trained
    offline and shipped to the job as data. Memoized (lru_cache) so
    repeated queries()/oracle_sql() calls pay the read+Lloyd's once
    per corpus; returns a tuple-of-tuples for hashability.

    BOUNDED (round-4 verdict item 2): the training sample is capped at
    the first 4096 vec_ids — still fully deterministic, and both twins
    consume the identical resulting literals, so parity is unaffected
    while the harness's driver memory stays O(4096 x dim) at any sf
    (previously the whole embeddings relation was fetchall'd; at sf1+
    the HARNESS would OOM before the engine did). Production analog
    unchanged: codebooks train offline on a sample anyway."""
    import duckdb as _dd
    import numpy as _np

    rows = _dd.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id LIMIT 4096"
    ).fetchall()
    X = _np.array([r[0] for r in rows], dtype=_np.float64)
    C = X[:n_clusters].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)  # ties -> lowest cluster id, same as both twins
        for j in range(n_clusters):
            members = X[a == j]
            if len(members):
                C[j] = members.mean(0)
    return tuple(tuple(row) for row in C.tolist())


def _q_ann_ivf_topk(spark, sf):
    """IVF ANN as a CHECKED query: precomputed deterministic codebook
    (offline-trained in production; here Lloyd's over the corpus —
    _ivf_centroids), literal-centroid argmin assignment, n_probe
    nearest lists per query, exact cosine + rank. The DuckDB twin
    replays the identical codebook literals, so the probe lists and
    the approximate top-k match exactly — the third ANN path joins
    brute-force and LSH in the oracle-checked set."""
    from web_archive_downloader_spark.operators.ann import ivf_topk

    return ivf_topk(
        _t(spark, sf, "embeddings"), ANN_QUERY_IDS, k=10, n_probe=3,
        centroids=_ivf_centroids(sf),
    )


def _phash_input(spark, sf):
    """Deterministic surrogate image relation for the phash near-dup
    CHECKED query: testdata has no image table, so (image_id, phash)
    derive from documents — groups of 10 docs share a 56-bit md5 base
    hash; members differ from the base in <= 2 controlled bit
    positions (so within-group pairs sit at hamming <= 4, across
    groups ~28 random bits apart). The operator under test
    (operators/images.py:phash_near_dups) is the real engine path;
    only the input is synthesized, mirrored exactly in SQL."""
    from web_archive_downloader_spark.functions.textstats import md5_hash56_col

    d = _t(spark, sf, "documents")
    g = F.floor(F.col("doc_id") / 10).cast("long")
    # shiftleft with a COLUMN bit count needs the SQL form (the
    # DataFrame helper only takes a literal numBits)
    pert = F.expr(
        "CASE WHEN doc_id % 10 = 0 THEN 0L"
        " ELSE shiftleft(1L, cast(doc_id % 10 - 1 AS int))"
        "    + shiftleft(1L, cast(doc_id % 10 + 20 AS int)) END"
    )
    return d.select(
        F.col("doc_id").alias("image_id"),
        md5_hash56_col(g.cast("string")).bitwiseXOR(pert).alias("phash"),
    )


def _q_phash_pairs(spark, sf):
    """Image near-dup by perceptual-hash hamming distance, pigeonhole-
    blocked (7 chunks over the 56-bit surrogate phash; max_hamming=6
    <= chunks-1 preserves the no-miss guarantee)."""
    from web_archive_downloader_spark.operators.images import phash_near_dups

    return phash_near_dups(_phash_input(spark, sf), max_hamming=6, chunks=7)


def _q_text_stats(spark, sf):
    from web_archive_downloader_spark.partitioning import widen_narrow_scan

    # per-row projection: results are partitioning-independent, so the
    # narrow single-row-group scan is widened before the expensive
    # per-char/regex feature expressions (guide §2.2/§6)
    return document_stats(widen_narrow_scan(_t(spark, sf, "documents")))


def _q_token_counts(spark, sf):
    """Token counting both ways the brief names: whitespace tokens and
    a BPE-ish pre-tokenizer regex (sequence-length budgeting before
    real BPE). Pure scan-side projection; the DuckDB twin runs the
    same regex under RE2 — leftmost-first alternation matches Java's."""
    from web_archive_downloader_spark.functions.textstats import (
        bpe_ish_token_count_col,
        token_count_col,
    )
    from web_archive_downloader_spark.partitioning import widen_narrow_scan

    d = widen_narrow_scan(_t(spark, sf, "documents"))
    t = F.col("text")
    return d.select(
        "doc_id",
        token_count_col(t).alias("n_tokens_ws"),
        bpe_ish_token_count_col(t).alias("n_tokens_bpe"),
    )


def _q_stratified_sample(spark, sf):
    """Deterministic hash-based stratified sampling — the
    training-data downsampling primitive. Per-language keep rates
    applied via a PORTABLE md5-derived hash of the doc id (never an
    RNG: resumable, cluster-size-independent, reproducible across
    engines — the DuckDB twin computes the identical hash). Pure
    projection + filter: no shuffle, predicate folds into the scan."""
    from web_archive_downloader_spark.functions.textstats import md5_hash56_col

    d = _t(spark, sf, "documents")
    bucket = F.pmod(md5_hash56_col(F.col("doc_id").cast("string")), F.lit(1000))
    rate = (
        F.when(F.col("lang") == "en", 500)
        .when(F.col("lang") == "fr", 300)
        .otherwise(100)
    )
    return d.filter(bucket < rate).select("doc_id", "lang", bucket.alias("sample_bucket"))


def _doc_url():
    return F.concat(
        F.lit("https://ex.com/"), F.col("source"), F.lit("/sub%20dir/item-"),
        F.col("doc_id").cast("string"),
    )


def _q_page_dir(spark, sf):
    from web_archive_downloader_spark.functions.scalar import page_dir_col

    d = _t(spark, sf, "documents")
    return d.select("doc_id", page_dir_col(_doc_url()).alias("dir"))


def _q_url_parts(spark, sf):
    d = _t(spark, sf, "documents")
    url = _doc_url()
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
    )


def _q_markdown_header(spark, sf):
    from web_archive_downloader_spark.functions.scalar import markdown_header_col

    ev = _t(spark, sf, "events")
    ts14 = F.date_format("ts", "yyyyMMddHHmmss")
    title = F.concat(F.lit("Event "), F.col("event_id").cast("string"))
    url = F.concat(F.lit("https://ex.com/e/"), F.col("event_id").cast("string"))
    return ev.select("event_id", markdown_header_col(title, url, ts14).alias("header"))


def _q_decontamination(spark, sf):
    """Test-set decontamination (operators/dedup.py
    ngram_decontaminate): docs with doc_id % 50 == 0 stand in for the
    evaluation corpus; every OTHER doc sharing a distinct word 5-gram
    with it is flagged with its overlap count. Broadcast semi-join of
    the (small) eval shingle set into the training scan — the only
    shuffle is the per-doc hit count."""
    from web_archive_downloader_spark.operators.dedup import ngram_decontaminate

    d = _t(spark, sf, "documents")
    ev = d.filter(F.col("doc_id") % 50 == 0)
    tr = d.filter(F.col("doc_id") % 50 != 0)
    return ngram_decontaminate(tr, ev, n=5)


def _q_memento_nav(spark, sf):
    """SRC4/X9: nested-JSON navigation of a Memento TimeTravel
    response — from_json with a nested struct/array schema, select
    mementos.closest.uri[0], reject web.archive.org hosts (the loop
    guard, memento_client.py:45-61). Four response shapes per doc_id
    mod 4: valid mirror URI / archive.org URI (loop) / missing
    'closest' key / absent body."""
    from web_archive_downloader_spark.sources.fetch_shim import (
        MEMENTO_RESPONSE_SCHEMA,
    )

    d = _t(spark, sf, "documents")
    orig = F.concat(
        F.lit("https://ex.com/"), F.col("source"), F.lit("/item-"),
        F.col("doc_id").cast("string"),
    )
    mirror = F.concat(
        F.lit('{"mementos":{"closest":{"datetime":"20240101000000","uri":["https://memento.mirror.example.net/'),
        (F.col("doc_id") % 99999).cast("string"), F.lit("/"), orig, F.lit('"]}}}'),
    )
    archive = F.concat(
        F.lit('{"mementos":{"closest":{"datetime":"20240101000000","uri":["https://web.archive.org/web/20240101000000/'),
        orig, F.lit('"]}}}'),
    )
    raw = (
        F.when(F.col("doc_id") % 4 == 0, mirror)
        .when(F.col("doc_id") % 4 == 1, archive)
        .when(F.col("doc_id") % 4 == 2, F.lit('{"mementos":{"first":{"uri":[]}}}'))
        .otherwise(F.lit(None).cast("string"))
    )
    parsed = d.select("doc_id", F.from_json(raw, MEMENTO_RESPONSE_SCHEMA).alias("m"))
    uri0 = F.col("m").getField("mementos").getField("closest").getField("uri").getItem(0)
    host = F.coalesce(F.parse_url(uri0, F.lit("HOST")), F.lit(""))
    return parsed.select(
        "doc_id",
        F.when(uri0.isNotNull() & ~host.contains("web.archive.org"), uri0).alias("memento_uri"),
        F.when(uri0.isNull(), F.lit("none"))
        .when(host.contains("web.archive.org"), F.lit("loop"))
        .otherwise(F.lit("found"))
        .alias("lookup_result"),
    )


def _q_asof_last_purchase(spark, sf):
    """AS-OF join: each click event attaches the user's latest
    purchase at-or-before the click (union-tag + single window — one
    shuffle, no range join; see operators/asof.py)."""
    from web_archive_downloader_spark.operators.asof import asof_join

    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks, purchases, key="user_id", ts="ts", id_col="event_id",
        right_values=["event_id", "value"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("asof_event_id").alias("purchase_id"),
        F.round("asof_value", 2).alias("purchase_value"),
    )


def _q_user_sessions(spark, sf):
    """Gap-based sessionization (classic lag + conditional cumsum
    window chain): a new session starts when a user's inter-event gap
    exceeds 30 minutes. Output: per-session row counts + bounds."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fixtures carry TIMESTAMP_NTZ; session tz is UTC, so the
    # epoch-seconds view matches DuckDB's epoch()
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    gap = epoch_s - F.lag(epoch_s).over(w)
    sess = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_sess").over(w))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


def _q_value_percentiles(spark, sf):
    """Exact percentiles per group (F.percentile — NOT the sketch-based
    approx_percentile, so the DuckDB twin matches exactly)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        F.count("*").alias("n"),
    )


def _q_windowed_rates(spark, sf):
    from web_archive_downloader_spark.streaming.events import windowed_event_rates

    return windowed_event_rates(_t(spark, sf, "events"))


def _q_embedding_neardup_lsh(spark, sf):
    """The CHECKED near-dup path is the sign-LSH-blocked one (no
    cartesian) at CORPUS-SIZED geometry: n_planes=None auto-sizes the
    plane count from one count() via neardup_planes_for, and the
    DuckDB twin derives the same count from count(*) in SQL — the
    checked entry runs the geometry you'd run at scale. The exact
    O(n^2) variant survives only as a recall reference in
    tests/test_dedup_ann.py."""
    from web_archive_downloader_spark.operators.dedup import embedding_neardup_lsh

    return embedding_neardup_lsh(_t(spark, sf, "embeddings"), threshold=0.45)


def _q_order_priority_counts(spark, sf):
    """TPC-H Q4 shape: orders with at least one QUALIFYING lineitem
    (EXISTS -> left semi join), counted by priority. The testdata
    lineitem table has no commitdate/receiptdate, so the Q4 lateness
    predicate is stood in by a selective quantity predicate
    (l_quantity >= 45, ~12% of rows) — the semi-join genuinely
    filters rather than matching every order."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    qualifying = li.filter(F.col("l_quantity") >= 45).select("l_orderkey")
    return (
        o.join(qualifying, o.o_orderkey == qualifying.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def _q_part_type_stats(spark, sf):
    p = _t(spark, sf, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
            F.max("p_size").alias("max_size"),
            F.countDistinct("p_type").alias("n_types"),
        )
    )


def _q_supplier_balance_by_region(spark, sf):
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
            F.count("*").alias("n_suppliers"),
        )
    )


def _q_shipping_priority(spark, sf):
    """TPC-H Q3 shape: BUILDING-segment orders placed before a cutoff
    with lineitems shipped after it, top-10 open orders by revenue —
    the global top-k compiles to TakeOrderedAndProject."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    cutoff = "1998-03-15"
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(o.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == o.o_orderkey)
        .join(c.filter(F.col("c_mktsegment") == "BUILDING"), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


def _q_revenue_forecast(spark, sf):
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate
    pushes into the parquet scan, no join, no shuffle beyond the
    single global agg."""
    li = _t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


def _q_rollup_revenue(spark, sf):
    """Grouping-sets coverage: rollup over (returnflag, linestatus)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "rev", "n",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 entries — the driver's correctness check records at
    # most 50 (round-4 finding: entries 51+ are silently dropped).
    # Ordered newest/least-proven first as insurance: if the registry
    # ever grows past the window again, the overflow casualties are the
    # longest-proven scalar shapes at the tail, not new operators.
    # Round-5 consolidation: jaccard_pairs + ngram_jaccard +
    # minhash_jaccard_estimate -> similarity_pairs (one candidate join,
    # all three measures); top_customers dropped (shipping_priority
    # carries the same TakeOrderedAndProject shape).
    return {
        # --- new / least-proven this round ---
        "sequence_packing": _q_sequence_packing,
        "similarity_pairs": _q_similarity_pairs,
        "decontamination": _q_decontamination,
        "shipping_priority": _q_shipping_priority,
        "revenue_forecast": _q_revenue_forecast,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "phash_pairs": _q_phash_pairs,
        "click_attribution": _q_click_attribution,
        # --- training-data operator suite ---
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "dedup_components": _q_dedup_components,
        "corpus_selection": _q_corpus_selection,
        "dedup_exact": _q_dedup_exact,
        "minhash_sig": _q_minhash_sig,
        "sig_clusters": _q_sig_clusters,
        "lsh_candidates": _q_lsh_candidates,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "ann_bruteforce": _q_ann_bruteforce,
        "text_stats": _q_text_stats,
        "token_counts": _q_token_counts,
        "stratified_sample": _q_stratified_sample,
        # --- crawl-engine operator shapes (SURVEY §2) ---
        "latest_event_per_user": _q_latest_event_per_user,
        "customers_no_orders": _q_customers_no_orders,
        "topk_events_per_user": _q_topk_events_per_user,
        "budgeted_topk": _q_budgeted_topk,
        "collision_names": _q_collision_names,
        "html_names": _q_html_names,
        # --- relational-core extras (§2.11) ---
        "asof_last_purchase": _q_asof_last_purchase,
        "user_sessions": _q_user_sessions,
        "value_percentiles": _q_value_percentiles,
        "windowed_rates": _q_windowed_rates,
        "moving_avg_events": _q_moving_avg_events,
        "cube_revenue": _q_cube_revenue,
        "rollup_revenue": _q_rollup_revenue,
        "pricing_summary": _q_pricing_summary,
        "revenue_by_nation": _q_revenue_by_nation,
        "volume_shipping": _q_volume_shipping,
        "order_priority_counts": _q_order_priority_counts,
        "part_type_stats": _q_part_type_stats,
        "supplier_balance_by_region": _q_supplier_balance_by_region,
        # --- scalar-function shapes (X*), longest-proven ---
        "route_counts": _q_route_counts,
        "backoff": _q_backoff,
        "sanitize_docs": _q_sanitize_docs,
        "title_fallback": _q_title_fallback,
        "ts_format": _q_ts_format,
        "page_dir": _q_page_dir,
        "url_parts": _q_url_parts,
        "markdown_header": _q_markdown_header,
        # X9 JSON decode/nested access stays checked via memento_nav
        # (the former json_extract entry duplicated that coverage and
        # was consolidated away to keep the registry at 50 when
        # decontamination joined)
        "memento_nav": _q_memento_nav,
    }


# ---------------------------------------------------------- oracle SQL

def _sanitize_expr(inner: str) -> str:
    """DuckDB twin of sanitize_filename_col (step order preserved)."""
    s = f"regexp_replace({inner}, '[\\\\/*?:''\"<>|]', '', 'g')"
    s = f"regexp_replace({s}, '^[ .]+', '')"
    s = f"regexp_replace({s}, '[ .]+$', '')"
    s = f"replace({s}, ' ', '_')"
    s = f"substr({s}, 1, 100)"
    s = f"regexp_replace({s}, '^[ .]+', '')"
    s = f"regexp_replace({s}, '[ .]+$', '')"
    return f"CASE WHEN length({s}) = 0 THEN 'untitled' ELSE {s} END"


_H56 = "(('0x' || substr(md5({x}), 1, 14))::BIGINT)"


def _minhash_cte(k: int = 16) -> str:
    params = _perm_params(k)
    rows = ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(params))
    h = "(('0x' || substr(md5(tok), 1, 7))::BIGINT)"  # 28-bit, overflow-free
    return f"""
toks AS (
  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
params(i, a, b) AS (VALUES {rows}),
hashes AS (
  SELECT doc_id, {h} AS h FROM toks WHERE length(tok) > 0
),
minh AS (
  SELECT doc_id, i, min((a * h + b) % {MOD}) AS minv
  FROM hashes CROSS JOIN params
  GROUP BY doc_id, i
)"""


def _lsh_cte(k: int = 16, bands: int = 4) -> str:
    # pairs enumerate signature-cluster REPRESENTATIVES only (see
    # operators/dedup.py:minhash_lsh_candidates)
    rpb = k // bands
    return f"""{_minhash_cte(k)},
sigs AS (
  SELECT doc_id, string_agg(minv::VARCHAR, ',' ORDER BY i) AS sig_key
  FROM minh GROUP BY doc_id
),
reps AS (SELECT sig_key, min(doc_id) AS rep_id, count(*) AS cluster_size
         FROM sigs GROUP BY sig_key),
banded AS (
  SELECT m.doc_id, i // {rpb} AS band,
         string_agg(minv::VARCHAR, ',' ORDER BY i) AS key
  FROM minh m JOIN reps r ON m.doc_id = r.rep_id
  GROUP BY m.doc_id, i // {rpb}
),
cands AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
)"""


_TOKSET = "list_distinct(list_filter(string_split_regex(trim({t}), '\\s+'), x -> length(x) > 0))"


def _neardup_lsh_sql(threshold: float = 0.45, target_bucket_rows: int = 4096) -> str:
    """DuckDB twin of embedding_neardup_lsh: the SAME seeded
    hyperplanes as literal DOUBLE[] rows; the dot-product fold is
    list_reduce over list_transform in index order — identical
    left-to-right double arithmetic to Spark's F.aggregate(zip_with),
    so bucket signs match bit-for-bit and the candidate sets are
    identical.

    CORPUS-SIZED GEOMETRY: the plane count is not pinned — the SQL
    derives it from count(*) with the same formula as
    dedup.neardup_planes_for (clamp [5, 24]); planes are generated as
    literals out to the clamp max (prefix-stable: the first k rows of
    a seeded 24-plane draw equal a k-plane draw) and rows beyond the
    derived count are filtered before the dot products."""
    from web_archive_downloader_spark.operators.dedup import (
        NEARDUP_DIM,
        NEARDUP_PLANES,
        neardup_hyperplanes,
    )

    MAX_PLANES = 24
    rows = []
    for t, planes in enumerate(
        neardup_hyperplanes(n_planes=MAX_PLANES)
    ):
        for p, plane in enumerate(planes):
            vals = ", ".join(repr(x) for x in plane)
            rows.append(f"({t}, {p}, [{vals}]::DOUBLE[])")
    values = ",\n".join(rows)
    tbr = target_bucket_rows
    return f"""
        WITH np AS (
          SELECT CASE WHEN count(*) <= {tbr} THEN {NEARDUP_PLANES}
                 ELSE GREATEST({NEARDUP_PLANES}, LEAST({MAX_PLANES},
                      CAST(ceil(log2(count(*) / {tbr}.0)) AS INT))) END AS k
          FROM embeddings
        ),
        planes(tbl, pl, w) AS (VALUES {values}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dots AS (
          SELECT e.vec_id, p.tbl, p.pl,
                 list_reduce(
                   list_prepend(0.0::DOUBLE,
                     list_transform(range(1, {NEARDUP_DIM + 1}), i -> e.v[i] * p.w[i])),
                   (a, b) -> a + b) AS dot
          FROM e CROSS JOIN planes p
          WHERE p.pl < (SELECT k FROM np)
        ),
        buckets AS (
          SELECT vec_id, tbl,
                 sum(CASE WHEN dot > 0 THEN (1::BIGINT << pl) ELSE 0 END)::BIGINT AS b
          FROM dots GROUP BY vec_id, tbl
        ),
        cands AS (
          SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
          FROM buckets l JOIN buckets r
            ON l.tbl = r.tbl AND l.b = r.b AND l.vec_id < r.vec_id
        )
        SELECT vec_a, vec_b,
               round(list_cosine_similarity(a.v, b.v), 4) AS cos
        FROM cands
        JOIN e a ON a.vec_id = vec_a
        JOIN e b ON b.vec_id = vec_b
        WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {threshold}
    """


def _ann_lsh_sql(k: int = 10, n_planes: int = 4, n_tables: int = 8) -> str:
    """DuckDB twin of lsh_bucketed_topk: literal hyperplanes (same
    seeds, prefix-stable with the neardup set), identical left-to-right
    dot fold, 1-bit multiprobe expansion, candidate equi-join on
    (table, bucket), exact cosine + per-query rank — the same
    approximate result set, not merely recall-agreement."""
    from web_archive_downloader_spark.operators.ann import _hyperplanes
    from web_archive_downloader_spark.operators.dedup import NEARDUP_DIM

    rows = []
    for t in range(n_tables):
        for p, plane in enumerate(_hyperplanes(NEARDUP_DIM, n_planes, seed=42 + 1000 * t)):
            vals = ", ".join(repr(x) for x in plane)
            rows.append(f"({t}, {p}, [{vals}]::DOUBLE[])")
    values = ",\n".join(rows)
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    probe_bits = ", ".join(["-1"] + [str(i) for i in range(n_planes)])
    return f"""
        WITH planes(tbl, pl, w) AS (VALUES {values}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dots AS (
          SELECT e.vec_id, p.tbl, p.pl,
                 list_reduce(
                   list_prepend(0.0::DOUBLE,
                     list_transform(range(1, {NEARDUP_DIM + 1}), i -> e.v[i] * p.w[i])),
                   (a, b) -> a + b) AS dot
          FROM e CROSS JOIN planes p
        ),
        buckets AS (
          SELECT vec_id, tbl,
                 sum(CASE WHEN dot > 0 THEN (1::BIGINT << pl) ELSE 0 END)::BIGINT AS b
          FROM dots GROUP BY vec_id, tbl
        ),
        probes AS (
          SELECT q.vec_id AS query_id, q.tbl AS qtbl,
                 CASE WHEN pb.pb = -1 THEN q.b
                      ELSE xor(q.b, (1::BIGINT << pb.pb)) END AS qb
          FROM buckets q CROSS JOIN (SELECT unnest([{probe_bits}]) AS pb) pb
          WHERE q.vec_id IN ({qids})
        ),
        cand AS (
          SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
          FROM buckets c JOIN probes p
            ON c.tbl = p.qtbl AND c.b = p.qb AND c.vec_id != p.query_id
        ),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 round(list_cosine_similarity(qe.v, ne.v), 4) AS cos
          FROM cand
          JOIN e qe ON qe.vec_id = cand.query_id
          JOIN e ne ON ne.vec_id = cand.neighbor_id
        )
        SELECT query_id, rn AS rank, neighbor_id, cos
        FROM (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                 ) AS rn
          FROM scored
        ) WHERE rn <= {k}
    """


def _ivf_sql(k: int = 10, n_probe: int = 3) -> str:
    """DuckDB twin of the checked IVF query: the SAME codebook
    literals (_ivf_centroids over the canonical sf0.01 corpus the
    driver checks against), identical left-to-right squared-distance
    fold, argmin assignment with (d, cluster) tie order, n_probe
    probe lists, exact cosine + per-query rank."""
    from web_archive_downloader_spark.operators.dedup import NEARDUP_DIM

    # The twin is defined at the DRIVER'S check corpus (the tables its
    # DuckDB views point at — sf0.01 per the harness contract;
    # override with SPARK_GRAFT_ORACLE_SF for a different oracle dir).
    # At any other sf the ENGINE query stays self-consistent (it
    # derives its codebook from the corpus it is given); only this
    # twin is bound to the checked corpus — same binding as every
    # other oracle_sql() entry, which the driver runs at sf0.01 only.
    cents = _ivf_centroids(
        os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    )
    rows = []
    for ci, c in enumerate(cents):
        vals = ", ".join(repr(x) for x in c)
        rows.append(f"({ci}, [{vals}]::DOUBLE[])")
    values = ",\n".join(rows)
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    return f"""
        WITH cents(cluster, c) AS (VALUES {values}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dists AS (
          SELECT e.vec_id, cents.cluster,
                 list_reduce(
                   list_prepend(0.0::DOUBLE,
                     list_transform(range(1, {NEARDUP_DIM + 1}),
                                    i -> (e.v[i] - c[i]) * (e.v[i] - c[i]))),
                   (a, b) -> a + b) AS d
          FROM e CROSS JOIN cents
        ),
        ranked AS (
          SELECT vec_id, cluster,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
          FROM dists
        ),
        assigned AS (SELECT vec_id, cluster FROM ranked WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cluster AS qc
          FROM ranked WHERE rn <= {n_probe} AND vec_id IN ({qids})
        ),
        cand AS (
          SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
          FROM assigned a JOIN probes p
            ON a.cluster = p.qc AND a.vec_id != p.query_id
        ),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 round(list_cosine_similarity(qe.v, ne.v), 4) AS cos
          FROM cand
          JOIN e qe ON qe.vec_id = cand.query_id
          JOIN e ne ON ne.vec_id = cand.neighbor_id
        )
        SELECT query_id, rn AS rank, neighbor_id, cos
        FROM (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                 ) AS rn
          FROM scored
        ) WHERE rn <= {k}
    """


def _phash_pairs_sql(max_hamming: int = 6, chunks: int = 7) -> str:
    """DuckDB twin of phash_near_dups over the same surrogate phash
    input (_phash_input): md5-56 group base xor controlled
    perturbation, explode chunk keys, equi-join, xor + bit_count."""
    width = 64 // chunks
    h56 = _H56.format(x="CAST(CAST(floor(doc_id / 10) AS BIGINT) AS VARCHAR)")
    return f"""
        WITH imgs AS (
          SELECT doc_id AS image_id,
                 xor({h56},
                     CASE WHEN doc_id % 10 = 0 THEN 0::BIGINT
                          ELSE (1::BIGINT << CAST(doc_id % 10 - 1 AS INT))
                             + (1::BIGINT << CAST(doc_id % 10 + 20 AS INT)) END
                 ) AS phash
          FROM documents
        ),
        keyed AS (
          SELECT image_id, phash, c.chunk,
                 (phash >> (c.chunk * {width})) & {(1 << width) - 1} AS key
          FROM imgs CROSS JOIN (SELECT unnest(range({chunks})) AS chunk) c
        )
        SELECT DISTINCT l.image_id AS img_a, r.image_id AS img_b,
               bit_count(xor(l.phash, r.phash)) AS hamming
        FROM keyed l JOIN keyed r
          ON l.chunk = r.chunk AND l.key = r.key AND l.image_id < r.image_id
        WHERE bit_count(xor(l.phash, r.phash)) <= {max_hamming}
    """


def oracle_sql() -> dict[str, str]:
    h56_tok = _H56.format(x="tok")
    tokset_a = _TOKSET.format(t="a.text")
    tokset_b = _TOKSET.format(t="b.text")
    simhash_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(32)
    )
    lang_hits = {
        lang: " + ".join(
            f"CAST(floor((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' {w} ', ''))) / {len(w) + 2}) AS INT)"
            for w in ws
        )
        for lang, ws in {
            "en": ("the", "and", "of"),
            "fr": ("le", "la", "les"),
            "es": ("el", "los", "las"),
            "de": ("der", "die", "und"),
        }.items()
    }
    # text_stats SELECT, reused verbatim by corpus_selection's stats CTE
    text_stats_select = f"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(trim(text), '\\s+'), x -> length(x) > 0)) AS n_tokens,
                   round(CASE WHEN length(text) > 0
                         THEN (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]-]', '', 'g')))::DOUBLE / length(text)
                         ELSE 0 END, 4) AS punct_ratio,
                   round(CASE WHEN length(text) > 0
                         THEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text)
                         ELSE 0 END, 4) AS alpha_ratio,
                   round(0.5 * least(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> length(x) > 0))::DOUBLE / 50.0, 1.0)
                       + 0.3 * (CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text) ELSE 0 END)
                       + 0.2 * (1.0 - least((CASE WHEN length(text) > 0 THEN (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]-]', '', 'g')))::DOUBLE / length(text) ELSE 0 END) * 5.0, 1.0)), 4) AS quality,
                   CASE WHEN length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) * 2 > length(text) THEN 'zh'
                        WHEN ({lang_hits['en']}) >= ({lang_hits['fr']}) AND ({lang_hits['en']}) >= ({lang_hits['es']}) AND ({lang_hits['en']}) >= ({lang_hits['de']}) THEN 'en'
                        WHEN ({lang_hits['fr']}) >= ({lang_hits['es']}) AND ({lang_hits['fr']}) >= ({lang_hits['de']}) THEN 'fr'
                        WHEN ({lang_hits['es']}) >= ({lang_hits['de']}) THEN 'es'
                        ELSE 'de' END AS lang_pred,
                   list_reduce(list_prepend(0::BIGINT,
                               list_transform(list_filter(string_split(text, ''), c -> length(c) > 0),
                                              c -> unicode(c)::BIGINT)),
                               (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
            FROM documents
    """
    return {
        "latest_event_per_user": """
            SELECT user_id, event_id AS last_event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
                  FROM events) WHERE rn = 1
        """,
        "customers_no_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "topk_events_per_user": """
            SELECT user_id, rn AS rank, event_id, value
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
                  FROM events) WHERE rn <= 3
        """,
        "budgeted_topk": """
            SELECT user_id, event_id, host_rank
            FROM (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS host_rank
              FROM events
            ) r
            WHERE host_rank <= least(
              CASE WHEN user_id % 2 = 0 THEN CAST(user_id % 5 + 1 AS INT) ELSE 3 END, 3)
        """,
        "route_counts": """
            SELECT CASE
                     WHEN outcome = 'ok' THEN 'ok'
                     WHEN outcome IN ('http_404','non_html','empty') THEN 'dead_wayback'
                     WHEN outcome IN ('http_429','http_500','timeout') AND attempt <= 3 THEN 'retry'
                     ELSE 'dead_wayback'
                   END AS route, count(*) AS n
            FROM (SELECT CASE WHEN event_type='error' THEN 'http_500'
                              WHEN event_type='purchase' THEN 'http_429'
                              ELSE 'ok' END AS outcome,
                         CAST(event_id % 5 + 1 AS INT) AS attempt
                  FROM events)
            GROUP BY 1
        """,
        "backoff": """
            SELECT attempt, CAST(pow(2, attempt - 1) AS INT) AS backoff_epochs, count(*) AS n
            FROM (SELECT CAST(event_id % 4 + 1 AS INT) AS attempt FROM events)
            GROUP BY 1, 2
        """,
        "sanitize_docs": f"""
            SELECT doc_id, {_sanitize_expr("(' . ' || substr(text, 1, 30) || '? ')")} AS fname
            FROM documents
        """,
        "title_fallback": """
            SELECT doc_id,
                   upper(substr(seg2, 1, 1)) || substr(seg2, 2) AS title
            FROM (SELECT doc_id,
                         replace(replace('item-' || doc_id || '_' || lang, '-', ' '), '_', ' ') AS seg2
                  FROM documents)
        """,
        "ts_format": """
            SELECT event_id, strftime(strptime(strftime(ts, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S'),
                   '%Y-%m-%d %H:%M:%S') AS archived_ts
            FROM events
        """,
        "collision_names": """
            SELECT doc_id, dir,
                   CASE WHEN rn = 1 THEN base || '.md'
                        ELSE base || '-' || (rn - 1) || '.md' END AS filename
            FROM (SELECT doc_id, source AS dir, lang AS base,
                         row_number() OVER (PARTITION BY source, lang ORDER BY doc_id) AS rn
                  FROM documents)
        """,
        "html_names": """
            SELECT save_seq, dir, ext,
                   CASE WHEN rn = 1 THEN base || ext
                        ELSE base || '-' || (rn - 1) || ext END AS filename
            FROM (SELECT save_seq, dir, base, ext,
                         row_number() OVER (PARTITION BY dir, base, ext
                                            ORDER BY save_seq) AS rn
                  FROM (SELECT doc_id * 2 AS save_seq, source AS dir,
                               lang AS base, '.md' AS ext FROM documents
                        UNION ALL
                        SELECT doc_id * 2 + 1, source, lang, '.html' FROM documents))
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "minhash_sig": f"""
            WITH {_minhash_cte(16)}
            SELECT doc_id, i, minv FROM minh
        """,
        "sig_clusters": f"""
            WITH {_minhash_cte(16)},
            sigs AS (
              SELECT doc_id, string_agg(minv::VARCHAR, ',' ORDER BY i) AS sig_key
              FROM minh GROUP BY doc_id
            )
            SELECT sig_key, min(doc_id) AS rep_id, count(*) AS cluster_size
            FROM sigs GROUP BY sig_key
        """,
        "lsh_candidates": f"""
            WITH {_lsh_cte(16, 4)}
            SELECT doc_a, doc_b FROM cands
        """,
        "similarity_pairs": f"""
            WITH {_lsh_cte(16, 4)},
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, greatest(len(t), 1)),
                                                  i -> t[i] || ' ' || t[i+1])) AS sh
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(trim(text), '\\s+'), x -> length(x) > 0) AS t
                    FROM documents)
            ),
            est AS (
              SELECT c.doc_a, c.doc_b,
                     round(sum(CASE WHEN ma.minv = mb.minv THEN 1 ELSE 0 END)::DOUBLE / 16, 6) AS jaccard_est
              FROM cands c
              JOIN minh ma ON ma.doc_id = c.doc_a
              JOIN minh mb ON mb.doc_id = c.doc_b AND mb.i = ma.i
              GROUP BY c.doc_a, c.doc_b
            )
            SELECT c.doc_a, c.doc_b,
                   round(len(list_intersect(ta.toks, tb.toks))::DOUBLE
                         / len(list_distinct(list_concat(ta.toks, tb.toks))), 6) AS jaccard,
                   round(len(list_intersect(ga.sh, gb.sh))::DOUBLE
                         / len(list_distinct(list_concat(ga.sh, gb.sh))), 6) AS ngram_jaccard,
                   est.jaccard_est
            FROM cands c
            JOIN (SELECT doc_id, {tokset_a} AS toks FROM documents a) ta ON ta.doc_id = c.doc_a
            JOIN (SELECT doc_id, {tokset_b} AS toks FROM documents b) tb ON tb.doc_id = c.doc_b
            JOIN grams ga ON ga.doc_id = c.doc_a
            JOIN grams gb ON gb.doc_id = c.doc_b
            JOIN est ON est.doc_a = c.doc_a AND est.doc_b = c.doc_b
        """,
        "sequence_packing": r"""
            WITH RECURSIVE t AS (
              SELECT doc_id % 8 AS shard, doc_id,
                     len(list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0))::BIGINT AS n_tokens,
                     row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
              FROM documents
            ),
            walk(shard, rn, doc_id, n_tokens, pack_id, pack_pos, acc) AS (
              SELECT shard, rn, doc_id, n_tokens, 0::BIGINT, 0::BIGINT, n_tokens
              FROM t WHERE rn = 1
              UNION ALL
              SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
                     CASE WHEN w.acc + t.n_tokens <= 256 THEN w.pack_id ELSE w.pack_id + 1 END,
                     CASE WHEN w.acc + t.n_tokens <= 256 THEN w.pack_pos + 1 ELSE 0::BIGINT END,
                     CASE WHEN w.acc + t.n_tokens <= 256 THEN w.acc + t.n_tokens ELSE t.n_tokens END
              FROM walk w JOIN t ON t.shard = w.shard AND t.rn = w.rn + 1
            )
            SELECT shard, pack_id, pack_pos, doc_id, n_tokens FROM walk
        """,
        "simhash": f"""
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct(list_filter(
                       string_split_regex(trim(text), '\\s+'), x -> length(x) > 0))) AS tok
              FROM documents
            ),
            hashes AS (SELECT doc_id, {h56_tok} AS h FROM toks)
            SELECT doc_id, ({simhash_terms}) AS simhash
            FROM hashes GROUP BY doc_id
        """,
        "dedup_components": f"""
            WITH RECURSIVE {_lsh_cte(16, 4)},
            jac AS (
              SELECT doc_a, doc_b
              FROM cands
              JOIN (SELECT doc_id, {tokset_a} AS toks FROM documents a) ta ON ta.doc_id = doc_a
              JOIN (SELECT doc_id, {tokset_b} AS toks FROM documents b) tb ON tb.doc_id = doc_b
              WHERE round(len(list_intersect(ta.toks, tb.toks))::DOUBLE
                          / len(list_distinct(list_concat(ta.toks, tb.toks))), 6) >= 0.4
            ),
            exact_star AS (
              SELECT g.rep AS doc_a, d.doc_id AS doc_b
              FROM documents d
              JOIN (SELECT md5(text) AS h, min(doc_id) AS rep
                    FROM documents GROUP BY 1) g ON md5(d.text) = g.h
              WHERE d.doc_id != g.rep
            ),
            sig_star AS (
              SELECT r.rep_id AS doc_a, s.doc_id AS doc_b
              FROM sigs s JOIN reps r USING (sig_key)
              WHERE s.doc_id != r.rep_id
            ),
            edges AS (
              SELECT doc_a, doc_b FROM exact_star
              UNION SELECT doc_a, doc_b FROM sig_star
              UNION SELECT doc_a, doc_b FROM jac
            ),
            edges_sym AS (
              SELECT doc_a AS src, doc_b AS dst FROM edges
              UNION SELECT doc_b, doc_a FROM edges
            ),
            walk(node, label) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.dst, w.label FROM walk w JOIN edges_sym e ON e.src = w.node
            )
            SELECT node AS doc_id, min(label) AS component
            FROM walk GROUP BY node
        """,
        "simhash_pairs": f"""
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct(list_filter(
                       string_split_regex(trim(text), '\\s+'), x -> length(x) > 0))) AS tok
              FROM documents
            ),
            hashes AS (SELECT doc_id, {h56_tok} AS h FROM toks),
            sims AS (SELECT doc_id, ({simhash_terms}) AS simhash
                     FROM hashes GROUP BY doc_id),
            chunks AS (
              SELECT doc_id, simhash, t.i AS chunk,
                     (simhash >> (t.i * 8)::INT) & 255 AS key
              FROM sims CROSS JOIN range(4) t(i)
            ),
            cands AS (
              SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
                     l.simhash AS sa, r.simhash AS sb
              FROM chunks l JOIN chunks r
                ON l.chunk = r.chunk AND l.key = r.key AND l.doc_id < r.doc_id
            )
            SELECT doc_a, doc_b, bit_count(xor(sa, sb))::INT AS hamming
            FROM cands WHERE bit_count(xor(sa, sb)) <= 3
        """,
        "ann_bruteforce": f"""
            SELECT query_id, rn AS rank, neighbor_id, cos
            FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])), 4) AS cos,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                             CAST(e.embedding AS DOUBLE[])), 4) DESC,
                                e.vec_id) AS rn
              FROM embeddings q JOIN embeddings e ON q.vec_id != e.vec_id
              WHERE q.vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})
            ) WHERE rn <= 10
        """,
        "ann_lsh_topk": _ann_lsh_sql(k=10),
        "ann_ivf_topk": _ivf_sql(k=10, n_probe=3),
        "phash_pairs": _phash_pairs_sql(max_hamming=6, chunks=7),
        "page_dir": """
            SELECT doc_id, 'output/' || source || '/sub_dir' AS dir
            FROM documents
        """,
        "url_parts": """
            SELECT doc_id, 'ex.com' AS host,
                   '/' || source || '/sub%20dir/item-' || doc_id AS path
            FROM documents
        """,
        "markdown_header": """
            SELECT event_id,
                   '# Event ' || event_id || '\\n\\n_Source URL: https://ex.com/e/'
                   || event_id || '_\\n_Archived Timestamp: '
                   || strftime(ts, '%Y-%m-%d %H:%M:%S') || '_\\n\\n' AS header
            FROM events
        """,
        "decontamination": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(range(1, greatest(len(t) - 3, 1)),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS sh
              FROM toks
            ),
            ev AS (SELECT DISTINCT sh FROM grams WHERE doc_id % 50 = 0)
            SELECT g.doc_id, count(*) AS n_hits
            FROM grams g JOIN ev USING (sh)
            WHERE g.doc_id % 50 != 0
            GROUP BY g.doc_id
        """,
        "memento_nav": """
            WITH raw AS (
              SELECT doc_id,
                     CASE
                       WHEN doc_id % 4 = 0 THEN
                         '{"mementos":{"closest":{"datetime":"20240101000000","uri":["https://memento.mirror.example.net/'
                         || (doc_id % 99999) || '/https://ex.com/' || source || '/item-' || doc_id || '"]}}}'
                       WHEN doc_id % 4 = 1 THEN
                         '{"mementos":{"closest":{"datetime":"20240101000000","uri":["https://web.archive.org/web/20240101000000/https://ex.com/'
                         || source || '/item-' || doc_id || '"]}}}'
                       WHEN doc_id % 4 = 2 THEN '{"mementos":{"first":{"uri":[]}}}'
                       ELSE NULL
                     END AS body
              FROM documents
            ),
            nav AS (
              SELECT doc_id,
                     json_extract_string(body, '$.mementos.closest.uri[0]') AS uri0
              FROM raw
            )
            SELECT doc_id,
                   CASE WHEN uri0 IS NOT NULL
                             AND NOT contains(coalesce(regexp_extract(uri0, '^[a-z]+://([^/]+)', 1), ''), 'web.archive.org')
                        THEN uri0 END AS memento_uri,
                   CASE WHEN uri0 IS NULL THEN 'none'
                        WHEN contains(coalesce(regexp_extract(uri0, '^[a-z]+://([^/]+)', 1), ''), 'web.archive.org') THEN 'loop'
                        ELSE 'found' END AS lookup_result
            FROM nav
        """,
        "asof_last_purchase": """
            WITH u AS (
              SELECT user_id, ts, event_id, 0 AS tag,
                     CASE WHEN TRUE THEN {'rid': event_id, 'rval': value} END AS r
              FROM events WHERE event_type = 'purchase'
              UNION ALL
              SELECT user_id, ts, event_id, 1, NULL
              FROM events WHERE event_type = 'click'
            ),
            c AS (
              SELECT user_id, ts, event_id, tag,
                     last_value(r IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, tag, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS asof_r
              FROM u
            )
            SELECT user_id, event_id AS click_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
                   asof_r.rid AS purchase_id,
                   round(asof_r.rval, 2) AS purchase_value
            FROM c WHERE tag = 1
        """,
        "user_sessions": """
            WITH g AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
            ),
            s AS (
              SELECT user_id, ts,
                     sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT AS session_id
              FROM g
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
            FROM s GROUP BY user_id, session_id
        """,
        "value_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90,
                   round(quantile_cont(value, 0.99), 4) AS p99,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "windowed_rates": """
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "embedding_neardup_lsh": _neardup_lsh_sql(0.45),
        "order_priority_counts": """
            SELECT o_orderpriority, count(*) AS n
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_quantity >= 45)
            GROUP BY o_orderpriority
        """,
        "part_type_stats": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 2) AS avg_price,
                   max(p_size) AS max_size,
                   count(DISTINCT p_type) AS n_types
            FROM part GROUP BY p_brand
        """,
        "supplier_balance_by_region": """
            SELECT r_name, round(sum(s_acctbal), 2) AS total_bal,
                   count(*) AS n_suppliers
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "shipping_priority": """
            SELECT l_orderkey, revenue, orderdate, o_orderpriority
            FROM (
              SELECT l.l_orderkey,
                     round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                     strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
                     o.o_orderpriority
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
                AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
              GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            )
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "revenue_forecast": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "stratified_sample": f"""
            SELECT doc_id, lang,
                   {_H56.format(x="doc_id::VARCHAR")} % 1000 AS sample_bucket
            FROM documents
            WHERE {_H56.format(x="doc_id::VARCHAR")} % 1000 <
                  CASE WHEN lang = 'en' THEN 500
                       WHEN lang = 'fr' THEN 300 ELSE 100 END
        """,
        "rollup_revenue": """
            SELECT coalesce(l_returnflag, 'ALL') AS rf,
                   coalesce(l_linestatus, 'ALL') AS ls,
                   round(sum(l_extendedprice), 2) AS rev, count(*) AS n
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "text_stats": text_stats_select,
        "token_counts": r"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0)) AS n_tokens_ws,
                   len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS n_tokens_bpe
            FROM documents
        """,
        "volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate)::BIGINT AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
            GROUP BY 1, 2, 3
        """,
        "click_attribution": """
            SELECT p.event_id AS purchase_id,
                   count(c.event_id) AS n_clicks,
                   round(coalesce(sum(c.value), 0), 4) AS click_value
            FROM events p
            LEFT JOIN events c
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id
        """,
        "moving_avg_events": """
            SELECT user_id, event_id,
                   round(avg(value) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3
            FROM events
        """,
        "cube_revenue": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "corpus_selection": f"""
            WITH RECURSIVE {_lsh_cte(16, 4)},
            jac AS (
              SELECT doc_a, doc_b
              FROM cands
              JOIN (SELECT doc_id, {tokset_a} AS toks FROM documents a) ta ON ta.doc_id = doc_a
              JOIN (SELECT doc_id, {tokset_b} AS toks FROM documents b) tb ON tb.doc_id = doc_b
              WHERE round(len(list_intersect(ta.toks, tb.toks))::DOUBLE
                          / len(list_distinct(list_concat(ta.toks, tb.toks))), 6) >= 0.4
            ),
            exact_star AS (
              SELECT g.rep AS doc_a, d.doc_id AS doc_b
              FROM documents d
              JOIN (SELECT md5(text) AS h, min(doc_id) AS rep
                    FROM documents GROUP BY 1) g ON md5(d.text) = g.h
              WHERE d.doc_id != g.rep
            ),
            sig_star AS (
              SELECT r.rep_id AS doc_a, s.doc_id AS doc_b
              FROM sigs s JOIN reps r USING (sig_key)
              WHERE s.doc_id != r.rep_id
            ),
            edges AS (
              SELECT doc_a, doc_b FROM exact_star
              UNION SELECT doc_a, doc_b FROM sig_star
              UNION SELECT doc_a, doc_b FROM jac
            ),
            edges_sym AS (
              SELECT doc_a AS src, doc_b AS dst FROM edges
              UNION SELECT doc_b, doc_a FROM edges
            ),
            walk(node, label) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.dst, w.label FROM walk w JOIN edges_sym e ON e.src = w.node
            ),
            comp AS (
              SELECT node AS doc_id, min(label) AS component
              FROM walk GROUP BY node
            ),
            csize AS (
              SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
            ),
            stats AS ({text_stats_select})
            SELECT c.doc_id, cs.cluster_size, s.quality, s.n_tokens, s.lang_pred
            FROM comp c
            JOIN csize cs USING (component)
            JOIN stats s USING (doc_id)
            WHERE c.doc_id = c.component AND s.quality >= 0.5 AND s.n_tokens >= 5
        """,
    }
