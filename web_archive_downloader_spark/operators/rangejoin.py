"""Interval-bucketed RANGE JOIN — time-window joins that stay
equi-joins at scale.

Spark has no native range-join optimization: a join whose condition is
``r.ts BETWEEN l.ts + lower AND l.ts + upper`` (plus an equality key)
plans as a SortMergeJoin on the key alone with the time predicate as a
post-join filter — correct, but every key group materializes its full
cross product before filtering; for a hot key with k rows per side
that is O(k^2) rows through the join, the classic skew blowup of
event-attribution workloads. With NO equality key at all it degenerates
to BroadcastNestedLoopJoin/cartesian.

The standard fix (Databricks' range-join "bin" hints, interval
bucketing in the literature): quantize time into buckets of width =
the window span and join on (key, bucket) — a pure equi-join.

- each RIGHT row lands in exactly ONE bucket: floor(ts / w);
- each LEFT row explodes to the <= 2 consecutive buckets its window
  [ts+lower, ts+upper) can overlap;
- the exact window predicate refines the bucket matches.

Because a right row has one bucket, a qualifying (l, r) pair meets in
exactly one bucket — no duplicate pairs, no post-hoc distinct. Pair
volume through the join is bounded by rows-per-(key, bucket) — i.e. by
how many events a key emits per window-span, not per key-lifetime.
All arithmetic is int64 microseconds (unix_micros), so boundaries are
exact and the DuckDB oracle twin's INTERVAL arithmetic agrees
bit-for-bit.

Scale: one Exchange per side on (key, bucket); with skewed keys the
bucket term splits a hot key's rows across time — the time dimension
IS the salt. The explode is x2 on the left only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS_PER_MINUTE = 60_000_000


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_micros: int,
    upper_micros: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Pairs (left row, right row) sharing ``key`` with
    right_ts in [left_ts + lower_micros, left_ts + upper_micros)
    (half-open window). Column names other than ``key`` must be
    disjoint between the two inputs. Window must be non-empty
    (lower < upper)."""
    if not lower_micros < upper_micros:
        raise ValueError("range_join needs lower_micros < upper_micros")
    w = upper_micros - lower_micros

    def _micros(df: DataFrame, colname: str):
        """Epoch-microseconds of a timestamp column. TIMESTAMP (an
        instant) uses unix_micros directly. TIMESTAMP_NTZ is pure
        WALL-CLOCK arithmetic (interval since the NTZ epoch, cast
        through decimal for exact microseconds) — never a cast
        through the session timezone, whose DST transitions would
        stretch/compress window membership for timestamps straddling
        them (and diverge from naive-timestamp INTERVAL arithmetic,
        e.g. the DuckDB oracle twin)."""
        dtype = dict(df.dtypes)[colname]
        if dtype.startswith("timestamp_ntz"):
            return F.expr(
                f"cast(cast(`{colname}` - TIMESTAMP_NTZ'1970-01-01 00:00:00'"
                " as decimal(30,6)) * 1000000 as long)"
            )
        return F.unix_micros(F.col(colname))

    lm = _micros(left, left_ts)
    rm = _micros(right, right_ts)
    # floor division that is a true floor for negative values too
    # (pre-1970 timestamps): Spark's `div` truncates toward zero.
    # The long/long division goes through double: exact for
    # |micros| < 2^53 (years ~±2250) — the window REFINEMENT below is
    # pure int64 comparison, so a pathological out-of-domain timestamp
    # could only drop a candidate pair, never admit a wrong one.
    fdiv = lambda x: F.floor(x / F.lit(w)).cast("long")  # noqa: E731

    l = left.withColumn(
        "__b",
        F.explode(
            F.sequence(fdiv(lm + F.lit(lower_micros)), fdiv(lm + F.lit(upper_micros - 1)))
        ),
    ).withColumn("__lm", lm)
    r = right.withColumn("__b", fdiv(rm)).withColumn("__rm", rm)
    out = l.join(r, on=[key, "__b"]).filter(
        (F.col("__rm") >= F.col("__lm") + F.lit(lower_micros))
        & (F.col("__rm") < F.col("__lm") + F.lit(upper_micros))
    )
    return out.drop("__b", "__lm", "__rm")
