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
    """Attach daily_total/daily_avg/daily_max/daily_min per (keys, day)."""
    day = F.to_date(F.col(ts_col))
    w = Window.partitionBy(*keys, day)
    v = F.col(value_col)
    stats = {
        "daily_total": F.sum(v).over(w),
        "daily_avg": F.avg(v).over(w),
        "daily_max": F.max(v).over(w),
        "daily_min": F.min(v).over(w),
    }
    out = df
    for name, col in stats.items():
        if round_to is not None and name in ("daily_total", "daily_avg"):
            col = rnd(col, round_to)
        out = out.withColumn(name, col)
    return out
