"""Additional TPC-H-shaped relational queries (Q6/Q7/Q8/Q13/Q15/Q17).

These extend the q* family in catalog_core.py with the remaining TPC-H
shapes expressible over the driver's table set (no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode columns — Q2/Q9/Q11/Q12/Q16/Q20/Q21
are out of reach by schema, not by engine capability).

Each shape exercises a distinct planner capability:
- Q6  — pure scan+filter+agg; every predicate must reach the parquet scan.
- Q7  — two fact-to-fact shuffles with BOTH nation dims broadcast and the
        two-name filter pushed into the broadcast sides.
- Q8  — seven-table join with a conditional-aggregate ratio per year.
- Q13 — left join preserving zero-count groups, then an aggregate OVER an
        aggregate (the classic histogram-of-counts).
- Q15 — decorrelated MAX subquery: the scalar max rides back as a 1-row
        broadcast, never a sort of the whole revenue table.
- Q17 — correlated avg-per-group subquery decorrelated into a pre-pruned
        self-aggregate (dim filter applied BEFORE the per-part average,
        which is sound because the filter touches only part attributes).

Conventions match catalog_core.py: revenue sums round to 4, ratios to 6,
int-ish outputs cast to bigint, year() cast to bigint so both engines
agree on the schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rnd
from ..sources import load_table


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


# --- Q6: forecast revenue change — filter-only scan + global aggregate ---
def revenue_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the pushdown litmus test: three independent
    range predicates (date window, discount band, quantity cap) and a
    two-column global aggregate. The correct plan is ONE parquet scan
    with all three predicates in PushedFilters and only the four
    referenced columns in ReadSchema — no join, no shuffle beyond the
    final 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


REVENUE_UPLIFT_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- Q7: volume shipping between two nations, by direction and year ---
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bidirectional trade volume between two nations.
    The two-name filter lands inside BOTH broadcast nation dims (each 2
    rows after the filter), so the supplier and customer joins prune
    the fact stream before the cross-nation pair predicate runs; the
    pair predicate itself is a residual filter over the two broadcast
    outputs, not a join condition that would force a shuffle. supplier
    (100 rows) broadcasts onto lineitem; orders⋈lineitem and
    customer⋈orders are the only shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = (
        nation.filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        nation.filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            rnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


VOLUME_SHIPPING_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q8: national market share within a region's orders ---
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — one nation's share of a part-type's revenue
    inside one region, per order year. Seven tables: part (type filter
    pushed, broadcast), supplier + both nation sides + region all
    broadcast, orders⋈lineitem and customer⋈orders the only shuffles.
    The share is a conditional-aggregate ratio (Q14 convention):
    sum(CASE)/sum(*) in one pass, rounded to 6."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
            li.l_partkey == part.p_partkey,
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
                & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n1_region") == region.r_regionkey,
        )
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            rnd(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


MARKET_SHARE_SQL = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
)
GROUP BY o_year
ORDER BY o_year
"""


# --- Q13: distribution of per-customer order counts ---
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — histogram of how many orders customers place,
    INCLUDING the zero-order bucket: a left join (the join-side filter
    touches only orders columns, so it is pushed to the orders scan,
    not evaluated as a post-join residual) feeding count(o_orderkey)
    — which counts non-null keys, yielding 0 for unmatched customers —
    then a second aggregate over the first (histogram of counts).
    At scale the first groupBy shuffles on c_custkey and the second on
    the tiny count domain, so the expensive shuffle happens exactly
    once over the fact stream."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            cust.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORDER_COUNT_DIST_SQL = """
WITH c_orders AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q15: the top supplier(s) by quarterly revenue ---
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — suppliers whose quarterly revenue equals the
    maximum. The revenue table is computed ONCE (Spark reuses the
    aggregate subtree on both sides via exchange reuse); the scalar max
    returns as a 1-row broadcast crossJoin, so selecting the winner is
    a filter, not a global sort. Revenue rounds to 4 BEFORE the max
    compare, so cross-engine summation-order ulps cannot flip the
    winner or the tie set."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            rnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("_best"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("_best"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q17: small-quantity order revenue (correlated avg subquery) ---
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue lost to small-quantity orders of one
    brand: lines with l_quantity below half the part's average
    quantity. The correlated per-part avg subquery decorrelates into a
    self-aggregate over a PRE-PRUNED stream: the brand filter touches
    only part attributes, so joining the broadcast filtered part dim
    BEFORE computing the per-part average gives identical averages
    while scanning ~brand-sized data instead of the whole fact table.
    The qty limit rounds to 4 before the compare so the boundary rows
    cannot flip on cross-engine avg ulps. The limits table is
    brand-part-sized → broadcast back onto the pruned stream."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pruned = li.join(
        F.broadcast(
            part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
        ),
        li.l_partkey == F.col("p_partkey"),
    )
    limits = pruned.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        rnd(F.avg("l_quantity") * 0.5, 4).alias("qty_limit")
    )
    return (
        pruned.join(F.broadcast(limits), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            rnd(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SMALL_QUANTITY_SQL = """
WITH pruned AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23'
), limits AS (
  SELECT l_partkey AS a_partkey, round(avg(l_quantity) * 0.5, 4) AS qty_limit
  FROM pruned GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
       count(*) AS n_lines
FROM pruned JOIN limits ON l_partkey = a_partkey
WHERE l_quantity < qty_limit
"""


TPCH_QUERIES = {
    "q6_revenue_uplift": (revenue_uplift, REVENUE_UPLIFT_SQL),
    "q7_volume_shipping": (volume_shipping, VOLUME_SHIPPING_SQL),
    "q8_market_share": (market_share, MARKET_SHARE_SQL),
    "q13_order_count_distribution": (
        order_count_distribution,
        ORDER_COUNT_DIST_SQL,
    ),
    "q15_top_supplier": (top_supplier, TOP_SUPPLIER_SQL),
    "q17_small_quantity_revenue": (small_quantity_revenue, SMALL_QUANTITY_SQL),
}
