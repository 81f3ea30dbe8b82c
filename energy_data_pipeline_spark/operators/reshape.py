"""Reshape operators — SURVEY.md §2.4 (R1/R2) and the hour-label
conventions (P9/P10).

The reference's workhorse move is unpivoting 24 hour-columns into long
rows (pd.melt at fetch_data/pv/nambu_merge_pv_data.py:71-81 and four more
sites). In Spark this is ``DataFrame.unpivot`` — a narrow, shuffle-free
transformation that scales linearly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import ts_from_day_hour, ts_hour24_rollover


def discover_value_columns(df: DataFrame, pattern: str) -> list[str]:
    """R2 — schema-flexible value-var discovery by regex over df.columns.

    Parity: ``[c for c in df.columns if c.startswith('qhorgen')]``
    (nambu_merge_pv_data.py:71), regex discovery
    (namdong_merge_pv_data.py:52-56), case-insensitive
    (namdong_wind_collect.py:111).
    """
    rx = re.compile(pattern, re.IGNORECASE)
    return [c for c in df.columns if rx.search(c)]


def unpivot_hours(
    df: DataFrame,
    id_cols: list[str],
    value_col_pattern: str = r"^qhorgen(\d+)$",
    var_name: str = "hour_label",
    value_name: str = "generation",
) -> DataFrame:
    """R1 — wide→long unpivot of discovered hour columns, ids preserved.

    Values are cast to string pre-unpivot (mixed source types) and back to
    double post-unpivot, matching the reference's coerce-to-numeric.
    """
    value_cols = discover_value_columns(df, value_col_pattern)
    if not value_cols:
        raise ValueError(f"no columns match {value_col_pattern!r}")
    normalized = df.select(
        *id_cols, *[F.col(c).cast("string").alias(c) for c in value_cols]
    )
    long = normalized.unpivot(id_cols, value_cols, var_name, value_name)
    return long.withColumn(value_name, F.trim(F.col(value_name)).try_cast("double"))


def long_with_timestamp(
    long_df: DataFrame,
    day_col: str,
    hour_label_col: str = "hour_label",
    *,
    one_based: bool = True,
    hour24_rollover: bool = False,
    ts_name: str = "event_ts",
) -> DataFrame:
    """Attach the event timestamp to an unpivoted frame.

    Three hour-label conventions coexist in the reference (SURVEY.md §7.4):
    0-based (utils.py:18-24), 1-based kept (namdong_merge_pv_data.py:126),
    and 24→next-day-00 (namdong_wind_collect.py:127-138). Pin one per call.
    """
    h = F.regexp_extract(F.col(hour_label_col), r"(\d+)", 1).try_cast("int")
    day = F.col(day_col)
    if hour24_rollover:
        ts = ts_hour24_rollover(day, h)
    else:
        ts = ts_from_day_hour(day, h - F.lit(1) if one_based else h)
    return long_df.withColumn(ts_name, ts)
