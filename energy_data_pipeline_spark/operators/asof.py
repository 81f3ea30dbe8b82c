"""As-of join — align each left row with the most recent right row at or
before its timestamp, per key (the canonical time-series enrichment:
"attach the latest prior weather reading to each generation hour").

Spark has no built-in as-of join; the naive range join
(l.ts >= r.ts, max per pair) explodes quadratically per key. This
implementation is the scalable union-tag form:

1. tag right rows and union them with left rows on (key, ts);
2. one window per key ordered by ts carries the last seen right value
   forward (last_value ignorenulls);
3. keep the left rows.

Cost: a single shuffle on the key — the same exchange a groupBy would
pay — independent of how many right rows precede each left row. A
``tolerance`` bounds staleness (right rows older than tolerance are
ignored), matching the usual as-of semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right
    ``value_cols`` whose ``right_ts`` <= ``left_ts`` (per ``on`` key and
    within ``tolerance_seconds`` when given); NULL when no prior right
    row exists.

    Ties on equal timestamps resolve to the right row (<= semantics),
    with right-before-left union ordering making that deterministic.

    Determinism requires the right side to be unique per (key, ts) —
    with several right rows on the same timestamp, "the latest prior
    row" is ill-defined in any engine; pre-aggregate first.
    """
    keys = list(on)
    vals = list(value_cols)

    # The carried right row travels as ONE nullable struct (NULL for left
    # rows, non-NULL for every right row even when its value columns are
    # NULL) so a single last(ignorenulls) carries timestamp and values
    # atomically. Independent per-column carries would desync: a right
    # row with a NULL value advances the as-of clock — under ASOF JOIN
    # semantics the match is that row (yielding NULL), not an older
    # non-NULL value, and freshness must be judged against ITS timestamp.
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(
            F.col(right_ts).cast("timestamp_ntz").alias("_r_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in vals],
        ).alias("_r"),
    )
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(rhs.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    rhs = rhs.withColumn("_row", F.lit(None).cast(lhs.schema["_row"].dataType))
    # right rows sort before left rows at equal ts → "<=" semantics
    unioned = rhs.unionByName(lhs)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_carried")
    )
    out = carried.filter(F.col("_is_left") == 1)
    fresh = (
        F.col("_carried").isNotNull()
        if tolerance_seconds is None
        else F.col("_carried._r_ts")
        >= F.timestamp_add("SECOND", F.lit(-tolerance_seconds), F.col("_ts"))
    )
    return out.select(
        F.col("_row.*"),
        *[
            F.when(fresh, F.col(f"_carried._r_{c}")).alias(f"{c}{suffix}")
            for c in vals
        ],
    )
