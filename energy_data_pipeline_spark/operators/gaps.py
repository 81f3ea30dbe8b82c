"""Gap-run (islands) detection — SURVEY.md §2.8 T2.

Parity: find_consecutive_missing_groups
(fetch_data/common/impute_missing.py:14-38) — NaN runs → (start, length).

The numpy scan becomes the classic islands trick: a running count of
non-null rows partitions the nulls into consecutive groups. One window
sort per series key; Spark distributes across keys, so 100k stations ×
years of hours parallelize cleanly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def null_gap_islands(
    df: DataFrame,
    value_col: str,
    order_col: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Group consecutive NULL rows of ``value_col`` (ordered by
    ``order_col`` within ``keys``) into islands.

    Returns one row per island: keys..., gap_start (first order value),
    gap_end, gap_len.
    """
    w = Window.partitionBy(*keys).orderBy(order_col)
    grp = F.count(F.when(F.col(value_col).isNotNull(), 1)).over(w)
    nulls = df.withColumn("_grp", grp).filter(F.col(value_col).isNull())
    return (
        nulls.groupBy(*keys, "_grp")
        .agg(
            F.min(order_col).alias("gap_start"),
            F.max(order_col).alias("gap_end"),
            F.count(F.lit(1)).alias("gap_len"),
        )
        .drop("_grp")
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap_seconds: int = 1800,
) -> DataFrame:
    """Split each key's event stream into sessions separated by more than
    ``gap_seconds`` of idle time.

    Pure window composition: lag → boundary flag → running sum = session
    id. Returns per-session rollup (start, end, n_events).
    """
    sess = sessionize_events(df, ts_col, keys, gap_seconds=gap_seconds)
    return (
        sess.groupBy(*keys, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def sessionize_events(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-EVENT session labeling — the rollup-free half of
    ``sessionize``: every input row annotated with its ``session_seq``
    (1-based per key). Consumers that need within-session order
    (path/next-event analysis) compose on this; ``sessionize`` itself
    is the per-session rollup of the same labels."""
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # timestamp_diff is pure wall-clock arithmetic; unix_timestamp would
    # route NTZ values through the session timezone (DST-dependent gaps).
    # Compare at MICROSECOND grain: a SECOND diff truncates, so a gap of
    # 1800.9s would not split while fractional-epoch engines would.
    is_new = F.when(
        prev.isNull()
        | (
            F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
            > F.lit(int(gap_seconds) * 1_000_000)
        ),
        1,
    ).otherwise(0)
    return (
        df.withColumn("_new", is_new)
        .withColumn("session_seq", F.sum("_new").over(w))
        .drop("_new")
    )
