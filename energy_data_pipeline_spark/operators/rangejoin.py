"""Interval (range) join — match point events to time intervals without
the quadratic blowup of a raw theta join.

A plain ``l.ts BETWEEN r.start AND r.end`` join has no equi-key, so Spark
falls back to BroadcastNestedLoopJoin (fine for small interval sets —
that is exactly SURVEY.md §2.5 J2's dashboard shape) or a cartesian at
scale. ``bucketed_interval_join`` restores an equi-key by quantizing
time into fixed buckets: intervals explode into the buckets they cover,
points map to one bucket, the join runs hash-partitioned on
(key, bucket), and the exact predicate refines. Cost scales with
Σ interval_length/bucket instead of |points|×|intervals|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` key) whose
    [start, end] range contains it — inclusive bounds, matching the
    reference's dashboard BETWEEN (pv_dashboard.json:83).

    ``bucket_seconds`` trades explode factor against bucket selectivity;
    pick ≈ median interval length. Inner-join semantics only: the exact
    range predicate is applied after the bucket join, which would
    silently drop the NULL-extended rows of an outer join.
    """
    keys = list(on)
    b = F.lit(bucket_seconds)
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col).cast("timestamp")) / b).cast("long"),
                (F.unix_timestamp(F.col(end_col).cast("timestamp")) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "_bucket",
        (F.unix_timestamp(F.col(ts_col).cast("timestamp")) / b).cast("long"),
    )
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    return (
        pts.join(ivals, keys + ["_bucket"], "inner")
        .filter(cond)
        .drop("_bucket")
    )


def rollup_time_grains(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    aggs: dict[str, F.Column],
    grains: Sequence[str] = ("hour", "day", "month"),
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass computes
    the aggregate at several time granularities via GROUPING SETS over
    pre-truncated grain columns (instead of one scan per grain).

    Output: one row per (grain, grain_start, keys) with the aggregate
    columns; ``grain`` names which granularity the row belongs to.
    Spark's partial aggregation combines map-side across all sets, so
    the fact table is read once no matter how many grains.
    """
    key_list = list(keys)
    ts = F.col(ts_col).cast("timestamp")
    grained = df.select(
        *key_list,
        *[F.date_trunc(g, ts).alias(f"_g_{g}") for g in grains],
        *[c for c in df.columns if c not in key_list],
    )
    gcols = [f"_g_{g}" for g in grains]
    sets = [[*key_list, gc] for gc in gcols]
    out = grained.groupingSets(sets, *key_list, *gcols).agg(
        *[v.alias(k) for k, v in aggs.items()],
        F.grouping_id().alias("_gid"),
    )
    # each set keeps exactly one grain column; identify it by grouping_id
    # (robust even when a grain value is NULL from a NULL timestamp)
    mask = (1 << len(gcols)) - 1
    gid_of = {
        g: mask & ~(1 << (len(gcols) - 1 - i)) for i, g in enumerate(grains)
    }
    grain_col = F.coalesce(
        *[F.when(F.col("_gid") == gid, F.lit(g)) for g, gid in gid_of.items()]
    )
    start_col = F.coalesce(*[F.col(gc) for gc in gcols])
    return out.select(
        grain_col.alias("grain"),
        start_col.cast("timestamp_ntz").alias("grain_start"),
        *key_list,
        *aggs.keys(),
    )
