"""Calendar densification + missing-slot detection — SURVEY.md §2.8 T1,
and the completeness metrics T6/T7 that drive the reference's incremental
backfill.

Parity: pd.date_range + .difference (nambu_merge_pv_data.py:58-63,
nambu_bulk_sync.py:24-40); '<24 distinct hours' scan
(nambu_backfill.py:161-182).

Scale note: the calendar side is ``sequence()+explode`` — tiny (days ×
keys), so it broadcasts; the anti-join therefore never shuffles the fact
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def calendar_days(spark: SparkSession, start: str, end: str) -> DataFrame:
    """All days in [start, end] as one column ``day`` (DateType)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )


def calendar_hours(spark: SparkSession, start: str, end: str) -> DataFrame:
    """All hour timestamps in [start, end] as column ``hour_ts``
    (TIMESTAMP_NTZ: a session-tz grid would skip/repeat wall-clock hours
    across DST transitions and misalign completeness joins)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp_ntz"),
                F.lit(end).cast("timestamp_ntz"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_ts")
    )


def missing_days(present: DataFrame, spark: SparkSession, start: str, end: str, day_col: str = "day") -> DataFrame:
    """T1 — days in the range with no row in ``present`` (one col: day)."""
    cal = calendar_days(spark, start, end)
    pres = present.select(F.col(day_col).cast("date").alias("day")).distinct()
    return cal.join(pres, "day", "left_anti")


def incomplete_days(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    expected_hours: int = 24,
) -> DataFrame:
    """T7/A6 — per key+day, days with fewer than ``expected_hours``
    distinct hours. Output: keys..., day, n_hours."""
    return (
        df.groupBy(*keys, F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.countDistinct(F.hour(F.col(ts_col))).alias("n_hours"))
        .filter(F.col("n_hours") < expected_hours)
    )


def watermark_targets(
    df: DataFrame, ts_col: str, keys: list[str]
) -> DataFrame:
    """T6/A5 — per-key MAX(ts) watermark discovery used to plan
    incremental fetches. Parity: daily_pv_automation.py:79-126."""
    return df.groupBy(*keys).agg(F.max(F.col(ts_col)).alias("last_ts"))
