"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship dashboard query at sf0.001 (smoke check).
``queries()`` — every implemented operator from SURVEY.md §2 plus the
training-data surface, as (spark, sf_dir) → DataFrame callables.
``oracle_sql()`` — matching DuckDB SQL for EVERY query; the two
spline-based queries (whose solve is not SQL-expressible) carry
GENERATED oracles — expected-value tables computed at oracle_sql()
time by the reference-parity kernel and embedded as literals.

Implementation lives in ``energy_data_pipeline_spark`` (plans/catalog.py).
"""

from __future__ import annotations

import functools
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

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_worker_imports(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(fn) for name, (fn, _sql) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """Catalog oracles. An entry may be a callable taking the grading
    sf_dir and returning SQL (used for generated expected-value tables,
    e.g. the t3/t5 spline fixtures) — resolved here against the driver's
    grading scale (sf0.01, overridable via SPARK_GRAFT_ORACLE_SF_DIR)."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    out: dict[str, str] = {}
    for name, (_fn, sql) in CATALOG.items():
        resolved = sql(sf_dir) if callable(sql) else sql
        if resolved is not None:
            out[name] = resolved
    return out
