"""Plan-quality regression tests: the physical plans we audited into
shape must stay in shape. Catches silent regressions that correctness
tests cannot (a filter that stops pushing down, a broadcast that falls
back to an unpartitioned cross product)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from energy_data_pipeline_spark.plans.catalog import CATALOG, flagship

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_unpartitioned_cartesian_anywhere(spark):
    """CartesianProduct (non-broadcast cross join) must never appear —
    every intended cross is broadcast-shaped (BroadcastNestedLoopJoin
    with a tiny build side)."""
    offenders = []
    for name, (fn, _sql) in CATALOG.items():
        if plan_of(fn(spark, SF)).count("CartesianProduct"):
            offenders.append(name)
    assert not offenders, f"unpartitioned cross product in: {offenders}"


@pytest.mark.parametrize("name", ["a2_window_total", "t7_incomplete_days_backfill"])
def test_events_time_window_pushes_down(spark, name):
    """Time-window filters must reach the parquet scan in the raw nanos
    domain (PushedFilters range on ts), not evaluate post-scan."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert "GreaterThanOrEqual(ts," in plan or "LessThan(ts," in plan, plan[:2000]


def test_flagship_pushes_down_and_limits(spark):
    plan = plan_of(flagship(spark, SF))
    assert "GreaterThanOrEqual(ts," in plan
    assert "TakeOrderedAndProject" in plan  # top-k is limit-aware, not a full sort


@pytest.mark.parametrize(
    "name",
    [
        "j1_dim_join_agg",
        "j2_supplier_window_activity",
        "q3_top_urgent_orders",
        "q10_returned_item_topk",
    ],
)
def test_dim_joins_broadcast(spark, name):
    """Fact-dim joins must broadcast the dim, never sort-merge it."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scans_prune_columns(spark):
    """q1 reads 7 of 11 lineitem columns — ReadSchema must not contain
    the unused ones (column pruning reaches the scan)."""
    fn, _ = CATALOG["q1_pricing_summary"]
    plan = plan_of(fn(spark, SF))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_orderkey" not in read[0] and "l_partkey" not in read[0]


@pytest.mark.parametrize(
    "name", ["txt_vocab_topk", "txt_ngram_topk", "txt_bm25_topk"]
)
def test_corpus_topk_avoids_global_sort(spark, name):
    """Corpus top-k queries must compile to TakeOrderedAndProject
    (per-partition heads + k-row merge) — a global Sort of the full
    vocabulary/n-gram table would shuffle every token at 100 TB."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert "GlobalLimit" not in plan, plan


def test_contamination_join_is_not_broadcast(spark):
    """dd_cross_split_contamination must not broadcast the train-side
    fingerprint set — train is ~80% of the corpus at any scale. The
    semi-join must be shuffle-shaped (SortMerge or ShuffledHash)."""
    from energy_data_pipeline_spark.plans import plan_cache
    from energy_data_pipeline_spark.plans.catalog_corpus import (
        cross_split_contamination,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # production posture: planner must not DEPEND on the train side
    # fitting a broadcast (at sf0.001 it happens to, which AQE may use).
    # The entry is prepared-plan memoized and a memoized frame FREEZES
    # its physical plan, so clear the memo around the conf flip to force
    # a fresh plan under the no-broadcast conf (and again after, so
    # later tests don't inherit the conf-crippled plan).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    plan_cache.clear()
    try:
        plan = plan_of(cross_split_contamination(spark, SF))
        assert "BroadcastHashJoin" not in plan, plan
        assert "LeftSemi" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        plan_cache.clear()


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with NO
    Exchange on either side — the write-time shuffle is reused by every
    subsequent join (the fact-to-fact co-location path at 100 TB)."""
    from energy_data_pipeline_spark.sinks.writers import write_bucketed

    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    b = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    write_bucketed(a, "bkt_a", ["k"], num_buckets=8, sort_cols=["k"], path=str(tmp_path / "a"))
    write_bucketed(b, "bkt_b", ["k"], num_buckets=8, sort_cols=["k"], path=str(tmp_path / "b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = plan_of(j)
        assert "Exchange" not in plan, plan
        assert j.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_day_partitioned_table_prunes_partitions(spark, tmp_path):
    """The K4 sink layout (day-partitioned parquet) must let a day filter
    prune partitions at planning time — the 100 TB access path."""
    from energy_data_pipeline_spark.sinks.writers import overwrite_date_range
    from energy_data_pipeline_spark.sources.tables import load_events_window

    ev = load_events_window(spark, SF, "2024-01-01", "2024-01-11")
    path = str(tmp_path / "events_by_day")
    overwrite_date_range(ev, path, ts_col="ts")

    table = spark.read.parquet(path)
    q = table.filter("p_day = DATE '2024-01-03'").groupBy("event_type").count()
    plan = plan_of(q)
    # the day predicate must appear as a partition filter on the scan
    assert "PartitionFilters" in plan and "p_day" in plan
    assert q.count() > 0


def test_salted_agg_has_two_stage_exchange(spark):
    """sk_salted_event_totals must actually salt: the physical plan has a
    partial aggregate keyed on (event_type, _salt) with its own exchange
    BEFORE the final per-key aggregate — not a single-stage groupBy that
    would hand a hot key's entire input to one reducer."""
    fn, _ = CATALOG["sk_salted_event_totals"]
    plan = plan_of(fn(spark, SF))
    assert "_salt" in plan, plan[:2000]
    # two shuffles: hashpartitioning on (event_type, _salt) then event_type
    import re

    exchanges = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    salted = [e for e in exchanges if "_salt" in e and "event_type" in e]
    final = [e for e in exchanges if "_salt" not in e and "event_type" in e]
    assert salted, f"no salted exchange in plan: {exchanges}"
    assert final, f"no final per-key exchange in plan: {exchanges}"


def test_pack_plan_window_is_shard_partitioned(spark):
    """pk_sequence_pack_plan's cumsum window must be partitioned on the
    FULL shard key (source, lang, pack_shard) — a window missing the
    id-range bucket would serialize each (source, lang) stratum onto one
    task, the classic global-window scale killer."""
    import re

    fn, _ = CATALOG["pk_sequence_pack_plan"]
    plan = plan_of(fn(spark, SF))
    exchanges = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    sharded = [
        e
        for e in exchanges
        if "source" in e and "lang" in e and "pack_shard" in e
    ]
    assert sharded, f"window not partitioned by full shard key: {exchanges}"
    assert "SinglePartition" not in plan, "global single-partition window"


def test_tfidf_explodes_token_stream_once(spark):
    """txt_tfidf_topk must evaluate the exploded token stream exactly
    once: the global document frequency comes from a window over the
    vocab-sized per-(lang, token) table, not a join of two aggregations
    that each re-run the explode (the exploded stream is the only
    corpus-sized intermediate in the query)."""
    import re

    fn, _ = CATALOG["txt_tfidf_topk"]
    plan = plan_of(fn(spark, SF))
    explodes = re.findall(r"\(\d+\) Generate", plan)
    assert len(explodes) == 1, f"explode evaluated {len(explodes)}x:\n{plan[:1500]}"
    # the doc-count side joins in as a broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan, plan[:1500]


def test_budget_plan_single_corpus_aggregation(spark):
    """smp_token_budget_plan reads the corpus once: one aggregation to
    per-source totals, then windows over the source-count-sized table.
    A second corpus-sized subtree (e.g. recomputing totals for the
    normalizer) would double the only expensive stage."""
    import re

    fn, _ = CATALOG["smp_token_budget_plan"]
    plan = plan_of(fn(spark, SF))
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, f"corpus scanned {len(scans)}x"


@pytest.mark.parametrize("name", ["txt_doc_chunks", "emb_quantize_int8"])
def test_narrow_preprocessing_is_exchange_free(spark, name):
    """Chunking and int8 quantization are narrow transformations — the
    physical plan must contain NO exchange at all (scan -> project ->
    [explode] -> project). Any shuffle appearing here is a regression
    that would move the whole corpus for a per-row operation."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert "Exchange" not in plan, plan[:1500]
    assert "Scan parquet" in plan


@pytest.mark.parametrize("name", ["smp_dsir_weights", "dd_semantic_dedup"])
def test_round8_queries_reuse_pinned_combine(spark, name):
    """DSIR and SemDeDup each derive several consumers (distributions /
    join sides) from ONE pinned intermediate — the plan must reference
    it via InMemoryTableScan (cache-backed, computed once), never
    contain an unpartitioned cartesian, and never sort-merge a side
    that should broadcast at this scale."""
    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert "InMemoryTableScan" in plan, plan[:1500]
    assert "CartesianProduct" not in plan


def test_bloom_membership_is_shuffle_free_expression(spark):
    """The Bloom membership test is a pure expression riding a one-row
    broadcast (dense bitmap array + forall over positions) — the plan
    must show a BroadcastNestedLoopJoin and NO shuffle exchange, and no
    aggregate: the round-7 explode+regroup shape shuffled every payload
    column k times."""
    from energy_data_pipeline_spark.operators import bloom

    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], "g string")
    bitmap = bloom.build_bitmap(keys, "g")
    probe = spark.createDataFrame(
        [(f"k{i}", f"payload {i}")  for i in range(20)], "g string, text string"
    )
    plan = plan_of(bloom.might_contain(probe, "g", bitmap))
    assert "BroadcastNestedLoopJoin" in plan, plan[:1500]
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert "HashAggregate" not in plan, plan[:1500]


def test_bm25_scans_prune_and_filter_before_aggregate(spark):
    """BM25 composes on the pinned tokenized-silver frame (round 11):
    every InMemoryTableScan must prune to (doc_id, wl) — the scorer
    never touches lang/source/text, those columns stay inside the
    shared silver materialization — and the query-term filter must
    appear in the plan so the aggregated stream is hit-sized, not
    corpus-token-sized. (The single parquet ReadSchema belongs to the
    silver build and deliberately reads the full silver width once.)"""
    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["txt_bm25_topk"]
    plan = plan_of(fn(spark, SF))
    lines = plan.splitlines()
    imts_outputs = [
        lines[i + 1]
        for i, ln in enumerate(lines)
        if ln.startswith("(") and "InMemoryTableScan" in ln
    ]
    assert imts_outputs and all(
        "lang" not in ln and "source" not in ln and "text" not in ln
        for ln in imts_outputs
    ), imts_outputs
    assert "Filter" in plan


def test_pq_codes_is_narrow_single_scan(spark):
    """PQ code assignment is a per-row argmin over a broadcast codebook
    literal — one scan, no key-partitioned exchange, no join, no
    aggregate (the only allowed exchange is fan_out's round-robin on
    the under-parallel local test file)."""
    from energy_data_pipeline_spark.plans import plan_cache

    import re

    plan_cache.clear()
    fn, _ = CATALOG["emb_pq_codes"]
    plan = plan_of(fn(spark, SF))
    # formatted plans list each scan in the tree AND the detail section
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:1500]
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert "SortMergeJoin" not in plan, plan[:1500]
    assert "HashAggregate" not in plan, plan[:1500]


@pytest.mark.parametrize("name", ["ann_pq_adc_topk", "ann_ivfpq_topk"])
def test_pq_search_broadcasts_lut_no_sort_merge(spark, name):
    """ADC search joins the corpus's exploded codes against the
    query-side lookup table — the LUT side must broadcast (it is
    |q|·M·K rows by construction) and nothing may fall back to a
    sort-merge join, which would shuffle the codes stream at 100 TB."""
    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan, plan[:1500]


def test_q14_pushes_month_window_single_lineitem_scan(spark):
    """Q14's ship-month window must reach the lineitem scan, the part
    dim must broadcast, and the conditional-sum ratio must come from
    ONE pass (exactly one lineitem scan — CASE inside SUM, never a
    promo-filtered second scan)."""
    fn, _ = CATALOG["q14_promo_revenue_share"]
    plan = plan_of(fn(spark, SF))
    assert "GreaterThanOrEqual(l_shipdate," in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1, plan[:2000]


def test_q18_aggregates_big_fact_before_joins(spark):
    """Q18's quantity rollup must partial-aggregate (map-side combine
    absorbs the per-order fan-in before the shuffle) and the final
    top-100 must be a TakeOrderedAndProject, not a global sort."""
    fn, _ = CATALOG["q18_large_order_customers"]
    plan = plan_of(fn(spark, SF))
    assert "partial_sum(l_quantity" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan


def test_q4_exists_is_semi_join_with_pruned_orders_scan(spark):
    """Q4's EXISTS must compile to one LEFT SEMI join (lineitem never
    aggregated or deduplicated) with the quarter window pushed to the
    orders scan."""
    fn, _ = CATALOG["q4_late_priority_counts"]
    plan = plan_of(fn(spark, SF))
    assert "LeftSemi" in plan, plan[:2000]
    assert "GreaterThanOrEqual(o_orderdate," in plan, plan[:2000]
    assert plan.count("lineitem.parquet") == 1, plan[:2000]


def test_q19_disjunction_factors_into_both_scans(spark):
    """Q19's OR-of-ANDs spans both join sides; Catalyst must factor the
    single-table conjuncts out so EACH scan prunes pre-join: the
    lineitem scan carries the pushed quantity-envelope disjunction and
    the part scan the brand/size disjunction."""
    fn, _ = CATALOG["q19_bracket_revenue"]
    plan = plan_of(fn(spark, SF))
    # assert against the PushedFilters lines specifically — matching the
    # whole plan text would also match the post-join residual Filter and
    # pass even when nothing reaches the scans
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_quantity,1.0" in ln for ln in pushed), pushed
    assert any("EqualTo(p_brand,Brand#1)" in ln for ln in pushed), pushed
    assert "BroadcastHashJoin" in plan


def test_q22_scalar_broadcast_and_orders_scan_pruned(spark):
    """Q22's global-average scalar must ride a broadcast nested-loop
    cross join (one-row build side, never a shuffle) and the lapse
    cutoff must prune at the orders scan."""
    fn, _ = CATALOG["q22_idle_rich_customers"]
    plan = plan_of(fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "GreaterThanOrEqual(o_orderdate," in plan, plan[:2000]


@pytest.mark.parametrize(
    "name",
    [
        "ts_daily_peak_hours",
        "ts_day_over_day_change",
        "ts_rolling_zscore_anomalies",
        "ts_load_duration_curve",
        "ts_peak_offpeak_profile",
    ],
)
def test_ts_analytics_aggregate_before_windowing(spark, name):
    """The dashboard analytics must roll events up with a map-side
    partial aggregate FIRST; any window/rank state then runs over the
    calendar-bounded aggregate, never the raw event stream."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert "partial_sum(value" in plan or "partial_sum(" in plan, plan[:2000]


def test_q10_pushes_both_fact_filters_and_takes_ordered(spark):
    """Q10's date window must reach the orders scan and the returnflag
    filter the lineitem scan (both prune BEFORE the fact-to-fact
    joins); the top-20 must be a TakeOrderedAndProject, not a global
    sort of the customer aggregate."""
    fn, _ = CATALOG["q10_returned_item_topk"]
    plan = plan_of(fn(spark, SF))
    assert "GreaterThanOrEqual(o_orderdate," in plan, plan[:2000]
    assert "EqualTo(l_returnflag,R)" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan


def test_q6_all_three_predicates_reach_single_scan(spark):
    """Q6 is the pushdown litmus: date window, discount band and
    quantity cap must ALL land in PushedFilters of ONE lineitem scan —
    no join, no second scan, nothing evaluated post-scan that the
    reader could have skipped."""
    fn, _ = CATALOG["q6_revenue_uplift"]
    plan = plan_of(fn(spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert len(pushed) == 1, pushed
    for frag in (
        "GreaterThanOrEqual(l_shipdate,",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24",
    ):
        assert frag in pushed[0], (frag, pushed)
    assert plan.count("lineitem.parquet") == 1


def test_q7_dims_broadcast_and_shipwindow_pushed(spark):
    """Q7's supplier + both nation sides must broadcast (the pair
    filter lives inside the 2-row broadcast dims) and the two-year ship
    window must prune the lineitem scan before any join."""
    fn, _ = CATALOG["q7_volume_shipping"]
    plan = plan_of(fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThanOrEqual(l_shipdate," in ln for ln in pushed), pushed
    assert "CartesianProduct" not in plan


def test_q8_filters_reach_part_orders_scans(spark):
    """Q8's seven-table join must prune at the scans: the type filter
    on part, the two-year window on orders; lineitem is read exactly
    once and the five dims ride broadcasts."""
    fn, _ = CATALOG["q8_market_share"]
    plan = plan_of(fn(spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(p_type,ECONOMY)" in ln for ln in pushed), pushed
    assert any("GreaterThanOrEqual(o_orderdate," in ln for ln in pushed), pushed
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]


def test_q13_priority_filter_pushed_zero_groups_kept(spark):
    """Q13's priority exclusion touches only orders columns, so it must
    be a PushedFilters Not(EqualTo(...)) at the orders scan — never a
    post-join residual that would break the left join's zero-count
    groups — and each base table is read exactly once."""
    fn, _ = CATALOG["q13_order_count_distribution"]
    plan = plan_of(fn(spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(
        "Not(EqualTo(o_orderpriority,1-URGENT))" in ln for ln in pushed
    ), pushed
    assert plan.count("orders.parquet") == 1
    assert plan.count("customer.parquet") == 1


def test_q15_scalar_max_is_broadcast_never_global_sort(spark):
    """Q15's winner selection must be a 1-row broadcast compare (Spark
    even collapses the crossJoin+filter into a BroadcastHashJoin on the
    rounded revenue) — never a global sort of the revenue table; the
    quarter window prunes every lineitem scan."""
    fn, _ = CATALOG["q15_top_supplier"]
    plan = plan_of(fn(spark, SF))
    assert "SortMergeJoin" not in plan, plan[:2000]
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    li_pushed = [ln for ln in pushed if "l_shipdate" in ln]
    assert li_pushed and all(
        "GreaterThanOrEqual(l_shipdate," in ln for ln in li_pushed
    ), pushed


def test_q17_brand_prunes_before_per_part_average(spark):
    """Q17's decorrelated avg must compute over the brand-PRUNED stream:
    the brand equality is pushed at the part scan, part broadcasts, and
    lineitem is read at most twice (once per consumer of the pruned
    stream), never a third time for the correlated subquery."""
    fn, _ = CATALOG["q17_small_quantity_revenue"]
    plan = plan_of(fn(spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(p_brand,Brand#23)" in ln for ln in pushed), pushed
    assert plan.count("lineitem.parquet") <= 2, plan[:2000]
    assert "BroadcastHashJoin" in plan


def test_funnel_prefilters_event_types_and_preaggregates(spark):
    """The funnel must push both event_type equality filters to the
    scans (clicks and purchases are each a pruned read, not a post-scan
    filter of the full stream) and partial-aggregate the first-click
    table before the purchase join."""
    fn, _ = CATALOG["st_funnel_conversion"]
    plan = plan_of(fn(spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(event_type,click)" in ln for ln in pushed), pushed
    assert any("EqualTo(event_type,purchase)" in ln for ln in pushed), pushed
    assert "partial_min(ts" in plan, plan[:2000]


def test_label_affinity_centroids_broadcast_onto_vectors(spark):
    """Label-affinity's centroid table (labels x dim) must ride back
    onto the vector stream as a BROADCAST join — the vector side is the
    100 TB side and must never shuffle on label."""
    fn, _ = CATALOG["emb_label_affinity"]
    plan = plan_of(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_pivot_is_single_pass_conditional_aggregate(spark):
    """The pinned-values pivot must be ONE events scan with a map-side
    partial aggregate — never the two-pass value-discovery pivot (extra
    scan, data-dependent schema)."""
    fn, _ = CATALOG["r2_pivot_daily_type_totals"]
    plan = plan_of(fn(spark, SF))
    assert plan.count("events.parquet") == 1, plan[:2000]
    assert "partial_sum(" in plan, plan[:2000]


def test_rfm_windows_run_over_entity_sized_profile(spark):
    """RFM's ntile sorts must run over the per-user PROFILE aggregate
    (partial-aggregated before any window) with the stream max riding a
    one-row broadcast — the purchase slice pruned at the scan."""
    fn, _ = CATALOG["a14_rfm_segments"]
    plan = plan_of(fn(spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(event_type,purchase)" in ln for ln in pushed), pushed
    assert "partial_max(" in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_zipf_topk_is_take_ordered_single_explode(spark):
    """The Zipf fit's top-256 vocab cut must compile to
    TakeOrderedAndProject (per-partition heads, never a full vocab
    sort) over ONE token explode; the regression runs over the 256-row
    cut only."""
    fn, _ = CATALOG["txt_zipf_alpha"]
    plan = plan_of(fn(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    gen_nodes = [
        ln for ln in plan.splitlines() if ln.strip().startswith("(") and "Generate" in ln
    ]
    assert len(gen_nodes) == 1, gen_nodes


def test_purged_mix_report_antijoin_not_broadcast_on_corpus(spark):
    """The purged mixture report must keep the purge's posture: the
    anti-join is un-hinted, so under a no-broadcast conf the planner
    must produce a SHUFFLE-shaped LeftAnti (the loser set may be 30-50%
    of a crawl at scale — the plan must not DEPEND on it broadcasting;
    AQE may still size-gate at runtime). Same pattern and memo-clearing
    discipline as test_contamination_join_is_not_broadcast."""
    from energy_data_pipeline_spark.plans import plan_cache

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    plan_cache.clear()
    try:
        fn, _ = CATALOG["smp_purged_mix_report"]
        plan = plan_of(fn(spark, SF))
        assert "LeftAnti" in plan, plan[:2000]
        # the anti-join itself must not be broadcast-shaped under the
        # no-broadcast conf; scan the join lines specifically
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti and all("Broadcast" not in ln for ln in anti), anti
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        plan_cache.clear()


def test_winsorized_totals_bands_broadcast_back(spark):
    """Winsorization's per-type quantile band (a |types|-row table)
    must ride back onto the event stream as a BROADCAST join — the
    stream never shuffles on event_type for the clamp — and the daily
    rollup must partial-aggregate."""
    fn, _ = CATALOG["ts_winsorized_daily_totals"]
    plan = plan_of(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "partial_sum(" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_value_histogram_bounds_broadcast_back(spark):
    """A15's per-type min/max band (|types| rows) must broadcast back
    onto the event stream — the stream never shuffles on event_type for
    the binning — and both passes partial-aggregate."""
    fn, _ = CATALOG["a15_value_histogram"]
    plan = plan_of(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "partial_count(" in plan or "partial_min(" in plan, plan[:2000]


@pytest.mark.parametrize(
    "name,source,max_scans",
    [
        ("a16_retention_cohorts", "events.parquet", 1),
        ("a17_value_concentration", "events.parquet", 1),
        ("st_dau_wau_stickiness", "events.parquet", 1),
        ("st_time_to_convert", "events.parquet", 1),
        ("ts_autocorrelation", "events.parquet", 1),
        ("ts_cusum_changepoints", "events.parquet", 1),
        ("emb_dim_stats", "embeddings.parquet", 1),
        ("txt_hapax_ratio", "documents.parquet", 1),
        # readability: ONE raw-text scan (the sentence regex, which
        # genuinely needs punctuation context) + the pinned silver
        # token-count frame, whose cached subtree also names the file
        ("txt_readability_profile", "documents.parquet", 2),
        ("smp_epoch_allocation", "documents.parquet", 1),
        ("dd_shingle_df_spectrum", "documents.parquet", 1),
        ("sk_key_skew_report", "events.parquet", 1),
    ],
)
def test_round9_queries_are_single_scan(spark, name, source, max_scans):
    """Every round-9 query reads its source exactly once: the cohort
    size / grand total / DAU sides are derived from the first pass via
    windows or conditional aggregates, never a second aggregate branch
    over the raw table (at 100 TB the second scan dwarfs everything
    downstream). All partial-aggregate before their one shuffle; no
    sort-merge joins or cartesian products anywhere."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert plan.count(source) <= max_scans, f"{plan.count(source)} scans of {source}"
    assert "partial_" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_time_to_convert_pushes_type_filter(spark):
    """st_time_to_convert's two-type slice must reach the scan as an
    In() pushed filter — the conversion pair is a fraction of the
    stream and the scan must skip the rest."""
    fn, _ = CATALOG["st_time_to_convert"]
    plan = plan_of(fn(spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("In(event_type" in ln for ln in pushed), pushed


@pytest.mark.parametrize(
    "name",
    [
        "q2_min_cost_supplier",
        "q9_product_type_profit",
        "q11_important_parts",
        "q12_delay_priority_audit",
        "q16_part_supplier_variety",
        "q20_candidate_suppliers",
        "q21_sole_slow_shipper",
    ],
)
def test_tpch_completion_single_fact_scan_no_smj(spark, name):
    """The seven adapted shapes that complete the 22-shape TPC-H sweep
    each read lineitem exactly once (the correlated subqueries are
    decorrelated into windows over pair-sized aggregates, never a
    join-back that re-derives the fact subtree), join every dim via
    broadcast, and partial-aggregate before their one fact shuffle."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan, plan[:2000]


def test_tpch_completion_dim_filters_reach_scans(spark):
    """Each adapted shape's selective dim predicate must land in
    PushedFilters at the dim scan (LIKE-contains for Q9, NOT/IN for
    Q16, prefix-LIKE for Q20, status equality for Q21, region for Q2)
    — never a post-join residual."""
    expectations = {
        "q2_min_cost_supplier": ["EqualTo(r_name,EUROPE)", "EqualTo(p_size,15)"],
        "q9_product_type_profit": ["StringContains(p_name,bolt)"],
        "q11_important_parts": ["EqualTo(n_name,NATION_7)"],
        "q12_delay_priority_audit": ["GreaterThanOrEqual(l_shipdate,"],
        "q16_part_supplier_variety": [
            "Not(EqualTo(p_brand,Brand#45))",
            "Not(StringStartsWith(p_type,MEDIUM))",
            "LessThan(s_acctbal,0.0)",
        ],
        "q20_candidate_suppliers": [
            "StringStartsWith(p_name,small)",
            "In(n_name, [NATION_3,NATION_4,NATION_5])",
        ],
        "q21_sole_slow_shipper": ["EqualTo(o_orderstatus,F)"],
    }
    for name, frags in expectations.items():
        fn, _ = CATALOG[name]
        plan = plan_of(fn(spark, SF))
        pushed = "\n".join(
            ln for ln in plan.splitlines() if "PushedFilters" in ln
        )
        for frag in frags:
            assert frag in pushed, (name, frag, pushed)


@pytest.mark.parametrize(
    "name",
    [
        "st_event_transition_matrix",
        "cdc_scd2_type_history",
        "lay_zorder_compaction_plan",
    ],
)
def test_round9b_event_queries_single_scan(spark, name):
    """The transition matrix, the SCD2 history build and the Z-order
    layout plan each read events exactly once; everything after the
    first shuffle runs on pair-/user×day-/file-sized frames. No
    sort-merge joins, no cartesian, and the aggregate paths partial-
    aggregate before the shuffle (the Morton groupBy and the daily
    combine are map-side-combined)."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert plan.count("events.parquet") == 1, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    if name != "st_event_transition_matrix":  # windows before first agg
        assert "partial_" in plan, plan[:2000]


@pytest.mark.parametrize(
    "name", ["txt_token_entropy", "txt_js_divergence_sources"]
)
def test_round9b_distribution_queries_reuse_pinned_tokens(spark, name):
    """Entropy and JS divergence compose on the ONE pinned
    (doc, token, n) frame — the plan must read it via
    InMemoryTableScan (the explode runs once per snapshot, not once
    per query), and the JSD's absent-token side must be the algebraic
    residual, never a |sources|x|vocab| cross join of the vocabulary."""
    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert "InMemoryTableScan" in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_hll_register_aggregate_is_single_distinct_pass(spark):
    """The HLL report must be: one events scan → one distinct shuffle →
    a 256-row register aggregate. The exact count must read off the
    register frame's n_keys sums — never a second count-distinct branch
    over the raw stream."""
    fn, _ = CATALOG["sk_hll_distinct_report"]
    plan = plan_of(fn(spark, SF))
    assert plan.count("events.parquet") == 1, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan, plan[:2000]


def test_cms_sketch_builds_from_pinned_per_key_counts(spark):
    """CMS linearity: the sketch and the top-k probe must BOTH read the
    pinned per-user aggregate (InMemoryTableScan — one raw-events
    pass), and the probe side must join the sketch as a broadcast,
    never shuffle the sketch against the probes."""
    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["sk_cms_heavy_hitters"]
    plan = plan_of(fn(spark, SF))
    assert "InMemoryTableScan" in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan


def test_rollup_is_single_expand_aggregate(spark):
    """The ROLLUP lattice must compile to ONE Expand + aggregate over a
    single events scan (Spark's grouping-sets expansion) — never one
    aggregate job per subtotal level — with partial aggregation before
    the shuffle."""
    fn, _ = CATALOG["a18_type_day_rollup"]
    plan = plan_of(fn(spark, SF))
    assert plan.count("events.parquet") == 1, plan[:2000]
    assert "Expand" in plan, plan[:2000]
    assert "partial_" in plan
    assert "SortMergeJoin" not in plan


def test_covariance_is_narrow_fold_not_self_join(spark):
    """The covariance query must generate its d(d+1)/2 product terms by
    a narrow array transform folded in ONE map-side-combined groupBy —
    never by self-joining the exploded (vec, dim) frame, which would
    shuffle corpus x d rows twice. The d dimension sums ride back as
    ONE broadcast array row (BroadcastNestedLoopJoin with a 1-row
    build side — the repo's scalar-broadcast pattern); embeddings is
    read at most twice (products + sums)."""
    fn, _ = CATALOG["emb_covariance_matrix"]
    plan = plan_of(fn(spark, SF))
    assert plan.count("embeddings.parquet") <= 2, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "partial_" in plan


@pytest.mark.parametrize(
    "name",
    [
        "sk_hll_daily_users",
        "a19_pareto_value_share",
        "ts_seasonality_strength",
    ],
)
def test_round9c_queries_single_scan(spark, name):
    """Daily HLL, the Pareto table and seasonality strength each read
    events exactly once; every later step runs on day×register-,
    user-, or type-sized frames. Partial aggregation before the one
    fact shuffle; no sort-merge joins or cartesian products."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert plan.count("events.parquet") == 1, plan[:2000]
    assert "partial_" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rfm_segments_has_no_window_and_single_scan(spark):
    """The round-10 RFM rewrite: quartile thresholds are collected once
    and embedded as literals, so the physical plan must contain NO
    Window operator (the former three full-sort ntile windows
    serialized the whole profile through one reducer) and exactly ONE
    events scan. The output orderBy is the only global sort left —
    presentation-bounded by |users|."""
    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["a14_rfm_segments"]
    plan = plan_of(fn(spark, SF))
    assert "Window" not in plan, plan[:2000]
    # the query reads the PINNED profile; the parquet scans live only
    # inside the InMemoryRelation's one-time materialization subtree
    # (profile + 1-row anchor branch — the per-execution path reads
    # the cache, so ≤ 2 distinct build-time scan nodes and none
    # outside it). explain("formatted") repeats nodes across the AQE
    # initial/final renderings, so count DISTINCT node ids.
    assert "InMemoryTableScan" in plan, plan[:2000]
    import re as _re

    scan_ids = set(_re.findall(r"Scan parquet\s+\((\d+)\)", plan))
    assert len(scan_ids) <= 2, (scan_ids, plan[:2000])
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize(
    "name,source",
    [
        ("ts_linear_trend", "events.parquet"),
        ("a20_benford_digit_profile", "events.parquet"),
    ],
)
def test_round10b_event_queries_single_scan(spark, name, source):
    """The OLS trend and the Benford profile each read events exactly
    ONCE: the regression runs on the |types|x|days| daily aggregate,
    and the Benford total is a window over the 9-row digit counts —
    never a second pass over the fact table. Partial aggregation
    before the one fact shuffle; no sort-merge joins or cartesians."""
    fn, _ = CATALOG[name]
    plan = plan_of(fn(spark, SF))
    assert plan.count(source) == 1, plan[:2000]
    assert "partial_" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_vocab_growth_tokenizes_once(spark):
    """txt_vocab_growth must tokenize the corpus exactly once: the
    (bucket, token) counts chain into per-token (min-bucket,
    collect_list) and re-explode, so new-token attribution and
    per-slice widths come from ONE token-keyed pass. documents may
    appear at most twice (the doc_id-pruned 1-row max anchor is the
    second). Two Generates are allowed — the corpus words explode and
    the re-explode of the ≤10-element per-token pairs list — but only
    ONE may sit over the words split (corpus-sized)."""
    fn, _ = CATALOG["txt_vocab_growth"]
    plan = plan_of(fn(spark, SF))
    assert plan.count("documents.parquet") <= 2, plan[:2000]
    import re as _re

    gen_ids = set(_re.findall(r"Generate\s+\((\d+)\)", plan))
    assert len(gen_ids) <= 2, (gen_ids, plan[:2000])
    assert plan.count("split(text") <= 1, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_source_overlap_reads_pinned_fp_frame(spark):
    """dd_source_overlap_matrix pins the DISTINCT (source, fp) frame
    (it feeds per-source totals plus both self-join sides), so the
    per-execution plan reads the cache — documents is scanned only in
    the InMemoryRelation's one-time materialization subtree."""
    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["dd_source_overlap_matrix"]
    plan = plan_of(fn(spark, SF))
    assert "InMemoryTableScan" in plan, plan[:2000]
    import re as _re

    scan_ids = set(_re.findall(r"Scan parquet\s+\((\d+)\)", plan))
    assert len(scan_ids) <= 1, (scan_ids, plan[:2000])


def test_rrf_fusion_legs_end_in_shortlist_cuts(spark):
    """Both fusion legs must cut to the POOL shortlist via
    TakeOrderedAndProject (never a global sort of the scored stream),
    and the 1-row dense query must ride in broadcast. The ONE allowed
    sort-merge join is the POOLxPOOL full-outer fusion itself (Spark
    cannot broadcast FULL OUTER; both inputs are constant-sized
    shortlists) — any other SMJ means a data-sized shuffle leaked in."""
    import re

    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["rag_rrf_fusion_topk"]
    plan = plan_of(fn(spark, SF))
    assert plan.count("TakeOrderedAndProject") >= 3, plan[:2000]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    smj = re.findall(r"SortMergeJoin \w+", plan)
    assert set(smj) <= {"SortMergeJoin FullOuter"}, smj


def test_nb_classifier_scores_via_broadcast_weights(spark):
    """NB scoring must join the pinned token frame against the
    BROADCAST vocab-sized weight table — a shuffled join there would
    re-partition the corpus token stream per invocation. The ONE
    allowed sort-merge join is the final doc-keyed label<->score
    LeftOuter (both sides are corpus-doc-sized at scale, and LeftOuter
    cannot broadcast its left side)."""
    import re

    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["txt_nb_quality_classifier"]
    plan = plan_of(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    smj = re.findall(r"SortMergeJoin \w+", plan)
    assert set(smj) <= {"SortMergeJoin LeftOuter"}, smj


def test_bitext_margin_reads_pinned_pairs(spark):
    """The margin algebra must read the PINNED candidate frame
    (InMemoryTableScan), broadcast the per-side NN-mean dims back, and
    never shuffle-join the pair stream."""
    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["emb_bitext_margin_pairs"]
    plan = plan_of(fn(spark, SF))
    assert "InMemoryTableScan" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_holt_forecast_single_fold_no_window(spark):
    """The Holt recurrence is ONE array fold after the per-series
    collect — no WindowExec (a windowed formulation would sort the
    daily stream once per lag), no join, exactly one events scan."""
    import re

    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["ts_holt_forecast"]
    plan = plan_of(fn(spark, SF))
    assert "Window" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:1500]


def test_top_paths_two_windows_one_scan(spark):
    """Path mining must stay window-composed: one events scan, the
    session-label window plus the lead window (both sorted on the same
    (user, ts) stream), a single path aggregate with a TakeOrdered cut
    — no self-join, no explode."""
    import re

    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["st_top_paths"]
    plan = plan_of(fn(spark, SF))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:1500]
    # three window ops (lag flag, label sum, lead taps) sharing ONE
    # user-keyed exchange — the (user, session) sort reuses the user
    # partitioning, so only the two aggregate exchanges remain
    assert len(re.findall(r"\(\d+\) Window\b", plan)) <= 3, plan[:1500]
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) <= 3, plan[:1500]
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan, plan[:1500]
    assert "Generate" not in plan, plan[:1500]


def test_bitext_bucketed_margin_never_crosses(spark):
    """The bucketed twin's margin algebra must read the PINNED probed
    candidate frame and broadcast the NN-mean dims — and unlike the
    exact twin, NO cross/nested-loop join may appear anywhere in its
    consumer plan (the cell hash join lives inside the pin build)."""
    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["emb_bitext_bucketed_pairs"]
    plan = plan_of(fn(spark, SF))
    assert "InMemoryTableScan" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_rake_run_split_has_no_window(spark):
    """RAKE's run split is a per-row array fold — NO WindowExec may
    appear (the window formulation sorted the whole corpus token
    stream), the word-stats join must broadcast, and the final cut is
    a TakeOrderedAndProject."""
    import re

    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["txt_rake_keywords"]
    plan = plan_of(fn(spark, SF))
    assert not re.findall(r"\(\d+\) Window\b", plan), plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_effective_budget_composes_without_extra_scan(spark):
    """The effective-token-budget table must compose on the PINNED
    silver frame and the memoized CC weights — the token side reads
    the in-memory silver pin (InMemoryTableScan), and the only parquet
    scans are the weights side's documents id scans (the formatted
    plan also lists scans inside the cached relation's child plan)."""
    import re

    from energy_data_pipeline_spark.plans import plan_cache

    plan_cache.clear()
    fn, _ = CATALOG["smp_effective_token_budget"]
    plan = plan_of(fn(spark, SF))
    assert "InMemoryTableScan" in plan, plan[:1500]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2, plan[:1500]


def test_anti_join_new_keys_never_shuffles_committed_side(spark):
    """The incremental-ingest idempotency filter (silver/BPE/PQ-codes
    appends) must keep per-batch work batch-bounded: the committed key
    set is semi-filtered by the broadcast batch keys and the anti-join
    builds on the broadcast overlap — NO SortMergeJoin, no Exchange of
    the committed side. Also pins the correctness identity
    anti(batch, T) == anti(batch, T ∩ batch-keys)."""
    from energy_data_pipeline_spark.operators.dedup import anti_join_new_keys

    batch = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    committed = (
        spark.range(5, 1000).withColumnRenamed("id", "doc_id")
    )
    fresh = anti_join_new_keys(batch, committed, "doc_id")
    plan = plan_of(fresh)
    assert "SortMergeJoin" not in plan, plan[:2000]
    # tree + details each print the operator once → 2 joins, 4 mentions
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "LeftAnti" in plan and "LeftSemi" in plan, plan[:2000]
    got = sorted(r["doc_id"] for r in fresh.collect())
    assert got == [0, 1, 2, 3, 4]
