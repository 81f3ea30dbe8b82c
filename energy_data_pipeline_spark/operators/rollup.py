"""Denormalized rollups — SURVEY.md §2.6 A11.

Parity: the reference stores per-day total/avg/max/min next to every
hourly row (daily_pv_automation.py:176-179, columns qvodgen/qvodavg/
qvodmax/qvodmin). Recomputed here as window aggregates partitioned by
(key, day) — one shuffle, then broadcast within partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd


def daily_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str] = (),
    round_to: int | None = 4,
) -> DataFrame:
    """Attach daily_total/daily_avg/daily_max/daily_min per (keys, day).

    All four aggregates are emitted in ONE projection over ONE window
    spec, and rounding is applied to the MATERIALIZED window columns in
    a second projection. The previous withColumn-per-stat form planned
    four separate Window operators each behind its own Exchange — the
    ``to_date(ts)`` partitioning expression got a fresh exprId per
    spec, so Spark could not prove the partitionings equal — and the
    ``rnd`` wrapper (which references its argument ~5x for the
    sign/saturation branches) multiplied the duplicated window sums
    further (a11's round-12 before-plan: 4 Exchanges, a 5-way
    duplicated sum). This shape plans 1 Exchange + 1 Window."""
    day = F.to_date(F.col(ts_col))
    w = Window.partitionBy(*keys, day)
    v = F.col(value_col)
    raw = df.select(
        "*",
        F.sum(v).over(w).alias("_raw_total"),
        F.avg(v).over(w).alias("_raw_avg"),
        F.max(v).over(w).alias("daily_max"),
        F.min(v).over(w).alias("daily_min"),
    )
    total = F.col("_raw_total")
    avg = F.col("_raw_avg")
    if round_to is not None:
        total = rnd(total, round_to)
        avg = rnd(avg, round_to)
    return raw.select(
        *df.columns,
        total.alias("daily_total"),
        avg.alias("daily_avg"),
        "daily_max",
        "daily_min",
    )
