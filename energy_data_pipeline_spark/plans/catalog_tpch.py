"""Additional TPC-H-shaped relational queries (Q2/Q6-Q9/Q11-Q13/Q15-Q17/Q20/Q21).

These extend the q* family in catalog_core.py so that all 22 TPC-H
planner shapes are exercised. The driver's table set has no partsupp
table and no l_commitdate/l_receiptdate/l_shipmode columns, so
Q2/Q9/Q11/Q12/Q16/Q20/Q21 cannot be run verbatim; each is instead
ADAPTED onto the available schema (lineitem's (partkey, suppkey) pairs
stand in for partsupp; shipdate-vs-orderdate delay stands in for the
commit/receipt lateness predicate; s_acctbal < 0 stands in for the
complaints exclusion) while preserving the query's *plan shape* — the
correlated-min decorrelation of Q2, the multi-alias exists/not-exists
of Q21, the having-vs-global-scalar of Q11, and so on. The adaptation
is a data-model substitution, not a semantic dilution: each docstring
names the capability the original exercises and how the adapted plan
exercises the same one.

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
- Q2  — correlated MIN-per-part subquery decorrelated into a per-part
        min join-back over a region-pruned supplier set.
- Q9  — LIKE-filtered dim pruning a multi-join profit rollup.
- Q11 — HAVING against a global-scalar fraction of the same aggregate.
- Q12 — computed-bucket conditional counts over a fact-fact join.
- Q16 — distinct-pair dedup + NOT-IN exclusion + count distinct.
- Q20 — nested aggregate threshold (share-of-part) feeding a semi-join.
- Q21 — multi-alias exists/not-exists collapsed into one pass of
        per-order window aggregates (the distributed-friendly plan).

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


# --- Q2 (adapted): min-cost supplier per part within a region ---
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — for each qualifying part, the supplier offering
    the minimum cost, suppliers restricted to one region. partsupp is
    absent, so lineitem's (partkey, suppkey) pairs stand in and
    ps_supplycost becomes the pair's average unit sell price.
    Plan shape preserved: the correlated MIN-per-part subquery
    decorrelates into a per-part window MIN over the SAME pre-pruned
    pair aggregate (the pair frame is |parts×suppliers|-bounded,
    dim-sized next to the fact scan) — a groupBy+join-back would
    re-derive the aggregate subtree and scan the fact table twice.
    Pruning is applied before the aggregate on BOTH dims — the part
    size/type filter and the region filter touch only dim attributes,
    so the per-pair average and per-part min are unchanged while the
    fact scan drops to the qualifying slice. Unit cost rounds to 4
    BEFORE the min compare so cross-engine avg ulps cannot flip the
    winner set."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    eu_supp = (
        supp.join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    qual_part = part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    costs = (
        li.join(F.broadcast(qual_part), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            rnd(
                F.avg(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    / F.col("l_quantity")
                ),
                4,
            ).alias("unit_cost")
        )
    )
    min_cost = F.min("unit_cost").over(Window.partitionBy("p_partkey"))
    return (
        costs.withColumn("_min_cost", min_cost)
        .filter(F.col("unit_cost") == F.col("_min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


MIN_COST_SUPPLIER_SQL = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), costs AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         round(avg(l_extendedprice * (1 - l_discount) / l_quantity), 4)
           AS unit_cost
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN eu_supp ON l_suppkey = s_suppkey
  WHERE p_size = 15 AND p_type = 'STANDARD'
  GROUP BY 1, 2, 3, 4, 5, 6
), best AS (
  SELECT p_partkey AS b_partkey, min(unit_cost) AS min_cost
  FROM costs GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM costs JOIN best ON p_partkey = b_partkey AND unit_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- Q9 (adapted): product-type profit by supplier nation and year ---
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — profit on a LIKE-filtered part family, rolled
    up by supplier nation and ship year. ps_supplycost is absent, so
    cost is proxied as 60% of the part's retail price per unit; the
    plan shape — a contains-LIKE filter pushed into the part dim scan
    pruning a part⋈lineitem⋈supplier⋈nation join before a
    nation×year rollup — is the original's. part and supplier/nation
    broadcast; the fact stream shuffles exactly once (the final
    groupBy)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(
            F.broadcast(
                part.filter(F.col("p_name").contains("bolt")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(rnd(F.sum(profit), 4).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


PRODUCT_TYPE_PROFIT_SQL = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 4) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# --- Q11 (adapted): parts concentrating one nation's revenue ---
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — line items sourced from one nation's
    suppliers, per-part value, keeping parts whose value exceeds a
    fixed fraction of the nation's total. partsupp value is absent, so
    value is discounted revenue. Plan shape preserved: the
    HAVING-vs-global-scalar subquery decorrelates into a window SUM
    over the per-part aggregate (a part-sized frame — the expensive
    fact shuffle happens once, and the global total is a second tiny
    exchange over the aggregate, never a second fact scan). Per-part
    value rounds to 4 before both the threshold compare and output."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    vals = (
        li.join(
            F.broadcast(
                supp.join(
                    F.broadcast(
                        nation.filter(F.col("n_name") == "NATION_7")
                    ),
                    supp.s_nationkey == nation.n_nationkey,
                ).select("s_suppkey")
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            rnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("value")
        )
    )
    total = F.sum("value").over(Window.partitionBy())
    return (
        vals.withColumn("_threshold", total * 0.001)
        .filter(F.col("value") > F.col("_threshold"))
        .select("p_partkey", "value")
        .orderBy(F.col("value").desc(), "p_partkey")
    )


IMPORTANT_PARTS_SQL = """
WITH vals AS (
  SELECT l_partkey AS p_partkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY 1
)
SELECT p_partkey, value
FROM vals
WHERE value > (SELECT sum(value) * 0.001 FROM vals)
ORDER BY value DESC, p_partkey
"""


# --- Q12 (adapted): priority mix by shipping-delay bucket ---
def delay_priority_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional priority counts per shipping
    class. l_shipmode/l_commitdate/l_receiptdate are absent, so the
    class is a computed delay bucket (ship date minus order date) —
    the same fact⋈fact join feeding CASE-bucketed conditional counts,
    with the ship-year window pushed into the lineitem scan. The
    bucket expression is evaluated once per row inside the single
    post-join aggregate; no second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 0, "EARLY")
        .when(delay <= 30, "FAST")
        .when(delay <= 90, "NORMAL")
        .otherwise("SLOW")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


DELAY_PRIORITY_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 0 THEN 'EARLY'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'NORMAL'
            ELSE 'SLOW' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY delay_bucket
"""


# --- Q16 (adapted): supplier variety per part attribute group ---
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — how many distinct suppliers can provide each
    (brand, type, size) group, with a brand/type/size exclusion list
    and a supplier blacklist. partsupp is absent, so lineitem's
    distinct (partkey, suppkey) pairs stand in; the complaints
    predicate becomes s_acctbal < 0. Plan: the part-attribute filter
    and the supplier blacklist apply BEFORE the distinct-pair dedup —
    both are sound there (the filter touches only part attributes
    riding the broadcast join; the anti-join removes whole suppliers
    independent of dedup), so the one fact-volume shuffle deduplicates
    only the qualifying slice instead of every pair. The blacklist is
    a broadcast LEFT ANTI join (the NOT-IN decorrelation — sound
    because s_suppkey is never null), then count distinct per group."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    qual_part = part.filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blacklist = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(qual_part), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(blacklist),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .select("l_suppkey", "p_brand", "p_type", "p_size")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        # count(l_suppkey), not countDistinct: the preceding 4-column
        # distinct already guarantees one row per (group, suppkey), so
        # the two are identical (both skip nulls) — and plain count
        # drops the planner's extra distinct-tracking aggregate layer
        # (r12 before-plan: HashAggregate x3 + Exchange x2 for the
        # dedup+countDistinct tail; after: dedup + cheap count).
        .agg(F.count("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


PART_SUPPLIER_VARIETY_SQL = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (5,10,15,20,25,30,35,40)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q20 (adapted): dominant shippers of a part family ---
def candidate_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers in a nation group who moved an
    outsized share of a LIKE-named part family in one year. partsupp
    availability is absent, so the threshold becomes a share of the
    part's total shipped quantity (>20%). Plan shape preserved: the
    nested aggregate (per-pair quantity, then per-part total via a
    window over the pair frame — never a second fact scan) feeds a
    semi-join-shaped distinct onto the broadcast supplier/nation dim.
    The part-name LIKE and ship window prune the fact scan first."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    shipped = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        )
        .join(
            F.broadcast(
                part.filter(F.col("p_name").startswith("small")).select(
                    "p_partkey"
                )
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = F.sum("qty").over(Window.partitionBy("l_partkey"))
    dominant = (
        shipped.withColumn("_part_total", part_total)
        .filter(F.col("qty") > 0.2 * F.col("_part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(
            F.broadcast(
                supp.join(
                    F.broadcast(
                        nation.filter(
                            F.col("n_name").isin(
                                "NATION_3", "NATION_4", "NATION_5"
                            )
                        )
                    ),
                    supp.s_nationkey == nation.n_nationkey,
                ).select("s_suppkey", "s_name", "s_acctbal")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


CANDIDATE_SUPPLIERS_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
), tot AS (SELECT l_partkey, sum(qty) AS part_total FROM shipped GROUP BY 1),
dominant AS (
  SELECT DISTINCT l_suppkey
  FROM shipped JOIN tot USING (l_partkey)
  WHERE qty > 0.2 * part_total
)
SELECT s_name, s_acctbal
FROM dominant JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3','NATION_4','NATION_5')
ORDER BY s_name
"""


# --- Q21 (adapted): the sole slow shipper in multi-supplier orders ---
def sole_slow_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers who were the ONLY late shipper in a
    finished multi-supplier order. l_commitdate/l_receiptdate are
    absent, so "late" is shipping >60 days after the order date. The
    original's EXISTS (another supplier in the order) + NOT EXISTS
    (another LATE supplier in the order) double self-join collapses
    into ONE pass: aggregate lines to (order, supplier, any_late)
    pairs, then window-count suppliers and late-suppliers per order
    over the pair frame — at scale this replaces two extra fact-table
    joins with two cheap aggregates over an orders-sized frame, which
    is the plan a distributed engine wants. Status filter pushed to
    the orders scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    # ONE fact-volume shuffle, not two: project the 1-bit late flag
    # immediately after the broadcast join, repartition by l_orderkey
    # once, and let BOTH the (order, supplier) aggregate and the
    # per-order window reuse that partitioning (hash partitioning on a
    # subset of the grouping keys satisfies the clustering requirement,
    # so neither adds an Exchange). The old shape shuffled the partial
    # pair aggregate by (orderkey, suppkey) and then re-shuffled the
    # pair frame by orderkey for the window — more total bytes (pairs
    # barely compress lineitem here: few lines per (order, supplier))
    # and one more fact-scale exchange.
    pair = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(late, 1).otherwise(0).alias("_late_bit"),
        )
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_late_bit").alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    annotated = pair.withColumn("n_supp", F.count(F.lit(1)).over(w)).withColumn(
        "n_late", F.sum("late").over(w)
    )
    return (
        annotated.filter(
            (F.col("late") == 1) & (F.col("n_late") == 1) & (F.col("n_supp") > 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


SOLE_SLOW_SHIPPER_SQL = """
WITH pair AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
), annotated AS (
  SELECT l_suppkey, late,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         sum(late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM pair
)
SELECT s_name, count(*) AS numwait
FROM annotated JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1 AND n_late = 1 AND n_supp > 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
"""


TPCH_QUERIES = {
    "q2_min_cost_supplier": (min_cost_supplier, MIN_COST_SUPPLIER_SQL),
    "q9_product_type_profit": (product_type_profit, PRODUCT_TYPE_PROFIT_SQL),
    "q11_important_parts": (important_parts, IMPORTANT_PARTS_SQL),
    "q12_delay_priority_audit": (delay_priority_audit, DELAY_PRIORITY_SQL),
    "q16_part_supplier_variety": (
        part_supplier_variety,
        PART_SUPPLIER_VARIETY_SQL,
    ),
    "q20_candidate_suppliers": (candidate_suppliers, CANDIDATE_SUPPLIERS_SQL),
    "q21_sole_slow_shipper": (sole_slow_shipper, SOLE_SLOW_SHIPPER_SQL),
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
