"""Catalog-wide contract meta-tests: invariants every entry must hold
for the driver's hash compare to be meaningful, encoding the gotchas
that cost debugging rounds (tz-dependent TimestampType outputs, HUGEINT
oracle columns, duplicate output names) as cheap schema-level checks —
they validate the PLAN, not the data, so the whole catalog checks in
seconds."""

from __future__ import annotations

import re

import pytest
from pyspark.sql.types import TimestampType

from energy_data_pipeline_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"

_NAME_RE = re.compile(r"^[a-z][a-z0-9_]*$")


def test_catalog_names_are_stable_identifiers():
    bad = [n for n in CATALOG if not _NAME_RE.match(n)]
    assert not bad, bad


@pytest.mark.parametrize("name", list(CATALOG), ids=list(CATALOG))
def test_catalog_entry_schema_contract(spark, name):
    fn, _sql = CATALOG[name]
    df = fn(spark, SF)
    cols = df.columns
    # duplicate output names break the driver's sort-columns-by-name hash
    assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
    assert all(c and not c.startswith("_") for c in cols), (
        f"{name}: empty/internal column leaked: {cols}"
    )
    # raw instant TimestampType is session-timezone-dependent — outputs
    # must be TIMESTAMP_NTZ or formatted strings (verify-skill gotcha #2)
    instant = [
        f.name for f in df.schema.fields if isinstance(f.dataType, TimestampType)
    ]
    assert not instant, (
        f"{name}: instant TimestampType output columns {instant} — "
        "use timestamp_ntz or date_format strings"
    )
