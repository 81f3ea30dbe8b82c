"""Catalog-wide contract meta-tests: invariants every entry must hold
for the driver's hash compare to be meaningful, encoding the gotchas
that cost debugging rounds (tz-dependent TimestampType outputs, HUGEINT
oracle columns, duplicate output names) as cheap schema-level checks —
they validate the PLAN, not the data, so the whole catalog checks in
seconds."""

from __future__ import annotations

import re

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType, TimestampType

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
    # non-scalar output cells (array/map/struct) crash the driver's
    # pandas sort_values canonicalizer with "unhashable type: 'list'"
    # — the round-8 failure mode. Long-form (posexplode) or
    # array_join the output instead.
    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, (
        f"{name}: non-scalar output columns {nested} — the driver "
        "canonicalizer cannot hash array/map/struct cells; emit long "
        "form or array_join"
    )


def test_nested_output_check_rejects_injected_array(spark):
    """Negative control for the round-8 hole: a frame WITH an array
    output column must trip the nested-type detection this file now
    applies to every catalog entry (the exact defect class that made
    emb_quantize_int8 / emb_label_centroids err at the driver gate)."""
    df = spark.range(3).selectExpr("id", "array(id, id + 1) AS arr")
    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert nested == ["arr"]


def test_harness_canon_cell_rejects_list():
    """The local replica gate must REFUSE non-scalar cells (predicting
    the driver's unhashable-list crash), never stringify them — the
    replica-fidelity gap that let round 8 ship two red rows."""
    from tests.oracle_harness import _canon_cell

    with pytest.raises(TypeError):
        _canon_cell([1, 2, 3])
    with pytest.raises(TypeError):
        _canon_cell({"a": 1})
    # scalars still canonicalize
    assert _canon_cell(None) == "NULL"
    assert _canon_cell(2.0) == "2"
    assert _canon_cell(True) == "1"
