"""Unified query catalog: name → (spark_fn, oracle_sql | None).

This is the engine's public analytical surface (SURVEY.md §2) and the
driver contract behind ``__spark_entry__.queries()`` / ``oracle_sql()``.
Each Spark callable takes (spark, sf_dir) and returns a DataFrame whose
column names, types and rounding match the DuckDB oracle exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rnd

from ..sources.tables import load_events_window
from .catalog_core import CORE_QUERIES
from .catalog_corpus import CORPUS_QUERIES
from .catalog_ext import EXT_QUERIES
from .catalog_timeseries import TIMESERIES_QUERIES

CATALOG: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    **CORE_QUERIES,
    **TIMESERIES_QUERIES,
    **CORPUS_QUERIES,
    **EXT_QUERIES,
}


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline dashboard shape (SURVEY.md §7 M0):
    window filter → hourly bucket → per-entity SUM → top-10.
    Parity: pv_test/grafana/dashboards/pv_dashboard.json panels 20/21.
    """
    windowed = load_events_window(spark, sf_dir, "2024-01-01", "2024-02-01")
    return (
        windowed.groupBy("user_id")
        .agg(rnd(F.sum("value"), 4).alias("total_value"))
        .orderBy(F.col("total_value").desc(), F.col("user_id").asc())
        .limit(10)
    )
