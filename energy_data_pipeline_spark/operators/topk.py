"""Top-K and ranking operators — SURVEY.md §2.6 A4, §2.7 O1/O2.

Parity: 'GROUP BY plant_name ORDER BY total DESC LIMIT 10'
(pv_test/grafana/dashboards/pv_dashboard.json panels 20-21).

Scale note: groupBy → orderBy → limit lets Spark run a partial top-K per
partition (TakeOrderedAndProject) instead of a global sort — the plan to
look for in .explain(). Deterministic tie-breaks make results stable
across cluster sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_col: Column,
    k: int = 10,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Group, aggregate, take global top-k by the aggregate descending."""
    out = df.groupBy(*group_cols).agg(agg_col.alias("total"))
    order = [F.col("total").desc()] + [F.col(c).asc() for c in tie_break]
    return out.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-k rows within each partition (window rank ≤ k)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )
