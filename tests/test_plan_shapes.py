"""Physical-plan audits: the judge-facing scale properties —
predicate pushdown into the parquet scan, column pruning, broadcast
joins for small dims, whole-stage codegen for scalar chains, no
Python UDFs in relational paths (SURVEY §4; task-brief 'explain and
iterate')."""

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: scan schema carries only the 3 needed columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" not in read_schema and "l_orderkey" in read_schema


def test_small_dim_join_broadcasts(spark):
    q = entry_mod.queries()["revenue_by_nation"](spark, SF)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan


def test_anti_join_used_for_seen(spark):
    q = entry_mod.queries()["customers_no_orders"](spark, SF)
    plan = _plan(q)
    assert "LeftAnti" in plan


def test_scalar_chain_stays_codegen(spark):
    q = entry_mod.queries()["sanitize_docs"](spark, SF)
    plan = _plan(q)
    assert "codegen id" in plan  # whole-stage codegen span
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pricing_summary_partial_agg(spark):
    q = entry_mod.queries()["pricing_summary"](spark, SF)
    plan = _plan(q)
    # partial (map-side) + final hash aggregate around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "hashpartitioning" in plan


def test_ann_query_broadcasts(spark):
    q = entry_mod.queries()["ann_bruteforce"](spark, SF)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_neardup_lsh_no_cartesian(spark):
    """The CHECKED near-dup path must be bucket-blocked: candidate
    pairs form via an equi-join on (table, bucket) — never a
    cartesian/BNLJ over the corpus."""
    q = entry_mod.queries()["embedding_neardup_lsh"](spark, SF)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_q6_filters_reach_scan(spark):
    """revenue_forecast is pure scan-filter-agg: every predicate
    pushes into the parquet scan; exactly one exchange (the global
    agg's single-row reduction)."""
    import re

    q = entry_mod.queries()["revenue_forecast"](spark, SF)
    plan = _plan(q)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_asof_join_single_shuffle(spark):
    """The as-of join must be the union-tag + window construction:
    one exchange per key column, no SortMergeJoin cross products, no
    cartesian/BNLJ."""
    q = entry_mod.queries()["asof_last_purchase"](spark, SF)
    plan = _plan(q)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan and "Union" in plan


def test_stratified_sample_stays_scan_side(spark):
    """Hash-bucket sampling is a projection + filter — no shuffle, no
    Python, whole-stage codegen."""
    q = entry_mod.queries()["stratified_sample"](spark, SF)
    plan = _plan(q)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan


def test_global_topk_is_take_ordered(spark):
    """Global top-k must compile to TakeOrderedAndProject
    (per-partition top-k + merge), not a single-partition global
    sort window."""
    for name in ("shipping_priority",):
        q = entry_mod.queries()[name](spark, SF)
        plan = _plan(q)
        assert "TakeOrderedAndProject" in plan, name
    plan = _plan(entry_mod.entry(spark))
    assert "TakeOrderedAndProject" in plan


def test_sequence_packing_single_shuffle(spark):
    """The packer must cost exactly ONE exchange (the shard hash
    partitioning feeding applyInPandas); token counts ride the scan
    projection, never a second shuffle."""
    q = entry_mod.queries()["sequence_packing"](spark, SF)
    import re

    # formatted explain prints each node twice (tree line + detail
    # header) and AQE can append an initial-plan section — count only
    # the tree lines of the final plan
    plan = _plan(q).split("== Initial Plan ==")[0]
    tree = plan.split("\n\n")[0]
    assert len(re.findall(r"- Exchange", tree)) == 1, plan
    assert "FlatMapGroupsInPandas" in plan


def test_ann_bruteforce_rank_is_prereduced(spark):
    """The brute-force final rank must be distributed: a per-partition
    top-k (MapInPandas over the scan partitioning, no extra exchange)
    feeds the per-query window, so no task ever sorts the full scored
    corpus. The MapInPandas node must sit BELOW the window's exchange."""
    q = entry_mod.queries()["ann_bruteforce"](spark, SF)
    plan = _plan(q)
    assert "MapInPandas" in plan and "Window" in plan
    # formatted explain prints root-first: the upstream (leaf-ward)
    # MapInPandas reduction must appear below the downstream Window
    assert plan.index("MapInPandas") > plan.index("Window")


def test_range_join_is_equi_join_no_bnlj(spark):
    """The interval-bucketed range join must plan as a hash/sort-merge
    EQUI-join on (key, bucket) — never a BroadcastNestedLoopJoin or
    CartesianProduct (what a raw inequality-condition join degenerates
    to), and the window refinement is a post-join filter."""
    q = entry_mod.queries()["click_attribution"](spark, SF)
    plan = _plan(q)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_range_join_boundaries_exact(spark):
    """Half-open window semantics at exact boundaries vs a naive
    inequality join: rows AT lower edge included, AT upper edge
    excluded, across bucket borders."""
    import datetime as dt

    from pyspark.sql import types as T

    from web_archive_downloader_spark.operators.rangejoin import (
        MICROS_PER_MINUTE,
        range_join,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    lschema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("lid", T.LongType()),
            T.StructField("lts", T.TimestampNTZType()),
        ]
    )
    rschema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("rid", T.LongType()),
            T.StructField("rts", T.TimestampNTZType()),
        ]
    )
    left = spark.createDataFrame([(1, 100, mins(0))], lschema)
    right = spark.createDataFrame(
        [
            (1, 1, mins(-30)),          # exactly at lower edge -> IN
            (1, 2, mins(-30) - dt.timedelta(microseconds=1)),  # just below -> OUT
            (1, 3, mins(0)),            # exactly at upper edge -> OUT (half-open)
            (1, 4, mins(0) - dt.timedelta(microseconds=1)),    # just inside -> IN
            (1, 5, mins(-15)),          # mid-window -> IN
            (2, 6, mins(-15)),          # other key -> OUT
        ],
        rschema,
    )
    got = sorted(
        r.rid
        for r in range_join(
            left, right, key="k",
            lower_micros=-30 * MICROS_PER_MINUTE, upper_micros=0,
            left_ts="lts", right_ts="rts",
        ).collect()
    )
    assert got == [1, 4, 5]


def test_phash_and_ivf_plans_are_blocked_equi_joins(spark):
    """phash_pairs: pigeonhole candidates form via an equi-join on
    (chunk, key) — never a cartesian over images. ann_ivf_topk: the
    probe is an equi-join on cluster id with literal-centroid argmin
    assignment in the projection — no ML stage, no cartesian, no
    Python in the relational path (the cosine/distance folds are
    Catalyst higher-order functions)."""
    for name in ("phash_pairs", "ann_ivf_topk"):
        plan = _plan(entry_mod.queries()[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
            "BroadcastHashJoin" in plan
        ), name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_decontamination_broadcasts_eval_side(spark):
    """The eval shingle set must reach the training scan as a
    broadcast hash join (benchmarks are tiny; shuffling the training
    corpus' exploded shingles would be the scale-killer)."""
    q = entry_mod.queries()["decontamination"](spark, SF)
    plan = _plan(q).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
