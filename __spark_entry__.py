"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship dashboard query at sf0.001 (smoke check).
``queries()`` — every implemented operator from SURVEY.md §2 plus the
training-data surface, as (spark, sf_dir) → DataFrame callables.
``oracle_sql()`` — matching DuckDB SQL (omitted only for the scipy
spline / full-impute pipeline, which are not SQL-expressible).

Implementation lives in ``energy_data_pipeline_spark`` (plans/catalog.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from energy_data_pipeline_spark.plans.catalog import CATALOG, flagship  # noqa: E402
from energy_data_pipeline_spark.shipping import ensure_worker_imports  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_worker_imports(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def _shipped(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Python-UDF queries need the package importable on workers; the
    operators ship it themselves, but wrapping here keeps the contract
    safe for any future query regardless of the external driver's CWD."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_worker_imports(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(fn) for name, (fn, _sql) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
