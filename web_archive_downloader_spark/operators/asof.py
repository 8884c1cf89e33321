"""AS-OF join — an operator Spark's DataFrame API lacks natively
(task brief: express it as a composition of existing ops when
semantics allow).

Semantics (pinned exactly, tie-safe): for every LEFT row, attach the
RIGHT row with the greatest ``ts`` such that right.ts <= left.ts
within the same key; ties on right.ts break by greatest right id.
Rows with no prior right row keep nulls (left outer).

Plan shape — the scale-correct construction is the UNION-TAG trick,
NOT a range join: tag right rows 0 and left rows 1, union, and run a
single window per key ordered by (ts, tag, id) carrying the last
non-null right-row STRUCT over rows UNBOUNDED PRECEDING..CURRENT ROW.
One shuffle on the key, one sort — O(n log n) per key — versus the
O(n*m) per-key blowup of the naive ``l.ts >= r.ts`` theta-join (which
Spark executes as a per-key cross product inside SortMergeJoin, or a
BNLJ). The whole right row travels as ONE struct so all attached
columns come from the same row even if some are null. DuckDB has
native ASOF JOIN; the oracle twin uses this same window construction
instead, so the tie rule is identical by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    right_values: list[str],
) -> DataFrame:
    """left columns pass through; each left row gains ``asof_<v>`` for
    v in right_values (null when no right row has right.ts <= left.ts).

    Both inputs must carry (key, ts, id_col); id_col must be unique
    within (key, ts) on each side for full determinism. Left
    passthrough columns RIDE the union-tag rows (null on right-tagged
    rows) rather than being re-joined afterwards — a re-join on
    (key, id_col) would duplicate left rows whenever id_col repeats
    across timestamps within a key, which the (key, ts)-uniqueness
    contract permits."""
    lcols = left.columns
    passthrough = [c for c in lcols if c not in (key, ts, id_col)]
    rstruct = F.struct(*[F.col(v).alias(v) for v in right_values])
    tagged_r = right.select(
        F.col(key), F.col(ts), F.col(id_col),
        F.lit(0).alias("__tag"), rstruct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in passthrough],
    )
    tagged_l = left.select(
        F.col(key), F.col(ts), F.col(id_col),
        F.lit(1).alias("__tag"), F.lit(None).cast(tagged_r.schema["__r"].dataType).alias("__r"),
        *passthrough,
    )
    unioned = tagged_r.unionByName(tagged_l)

    # right rows sort BEFORE left rows at equal ts (tag 0 < 1), so
    # right.ts == left.ts matches; ties among right rows at one ts
    # resolve to the greatest id (last in window order)
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc(ts), F.asc("__tag"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__asof", F.last("__r", ignorenulls=True).over(w))
    matched = carried.filter(F.col("__tag") == 1).select(
        F.col(key), F.col(ts), F.col(id_col), *passthrough,
        *[F.col("__asof").getField(v).alias(f"asof_{v}") for v in right_values],
    )
    return matched.select(*lcols, *[f"asof_{v}" for v in right_values])
