"""Every catalog query with an oracle must match DuckDB at sf0.001 —
the local mirror of the driver's CORRECTNESS gate (which runs sf0.01)."""

from __future__ import annotations

import pytest

from energy_data_pipeline_spark.plans.catalog import CATALOG

from .oracle_harness import compare, duck_connection

# Queries the DRIVER's 50-query correctness sample has never hashed in
# any round (union of CORRECTNESS_r01-r10 keys vs the catalog). Round
# 10 closed the union at 181/181, so only the round-11 additions
# remain — fronted in plans/catalog.py _SAMPLE_PRIORITY so their first
# external hash lands in the r11 gate. Until then their green status
# rests on this suite plus scripts/full_sweep.py (`pytest -m
# parity_extended` re-runs exactly these after a refactor).
NEVER_DRIVER_SAMPLED = {
    # round-11's six additions were all driver-hashed green in
    # CORRECTNESS_r11 and dropped from this list; round-12 additions:
    "pk_bpe_packed_sequences",
    "smp_bpe_token_budget",
    "txt_bpe_fertility",
    "rag_rrf_fusion_topk",
    "txt_nb_quality_classifier",
    "emb_bitext_margin_pairs",
    "emb_bitext_bucketed_pairs",
    "rag_mmr_diversified_topk",
    "smp_kcenter_coreset",
    "ts_holt_forecast",
    "st_top_paths",
    "smp_effective_token_budget",
    "txt_rake_keywords",
    "ts_holt_winters_forecast",
}

_unknown = NEVER_DRIVER_SAMPLED - set(CATALOG)
assert not _unknown, f"parity_extended names drifted from catalog: {_unknown}"


def _marked(name, *rest):
    if name in NEVER_DRIVER_SAMPLED:
        return pytest.param(name, *rest, marks=pytest.mark.parity_extended)
    return pytest.param(name, *rest)


# a callable oracle entry is resolved with the sf_dir inside the test
# (generated expected-value tables are scale-specific)
ORACLE_CASES = [
    _marked(name, fn, sql)
    for name, (fn, sql) in CATALOG.items()
    if sql is not None
]
ROWS_ONLY_CASES = [
    _marked(name, fn) for name, (fn, sql) in CATALOG.items() if sql is None
]


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duck_connection(sf_small)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name,fn,sql", ORACLE_CASES, ids=[c.values[0] for c in ORACLE_CASES]
)
def test_oracle_parity(spark, sf_small, duck, name, fn, sql):
    if callable(sql):
        sql = sql(sf_small)
        assert sql is not None, f"{name}: oracle generator returned None"
    df = fn(spark, sf_small)
    report = compare(df, duck, sql)
    assert report["ok"], f"{name}: {report['issues']}"


@pytest.mark.parametrize(
    "name,fn", ROWS_ONLY_CASES, ids=[c.values[0] for c in ROWS_ONLY_CASES]
)
def test_rows_only_queries_run(spark, sf_small, name, fn):
    df = fn(spark, sf_small)
    assert df.count() >= 0
    assert len(df.columns) > 0
