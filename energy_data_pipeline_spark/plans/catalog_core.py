"""Relational query surface — SURVEY.md §2.3/§2.5/§2.6/§2.7 (P/J/A/O/R ops).

Every entry is a (spark, sf_dir) → DataFrame callable plus a DuckDB
oracle SQL string with IDENTICAL output column names and value rounding.

Conventions shared with the oracle (see plans/catalog.py):
- timestamp outputs are formatted strings (tz-independent);
- double aggregates round to 4 decimals, ratios to 6;
- integer-ish outputs cast to bigint to match DuckDB's int64.

The reference queries these shapes serve are cited per entry (Grafana
dashboard SQL / pipeline SQL from /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rnd

from ..operators import dedup, topk
from ..operators.rollup import daily_stats
from ..sources import load_table
from ..sources.tables import load_events_window

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _fmt(col) -> F.Column:
    return F.date_format(col, TS_FMT_SPARK)


# --- A1: group-by SUM over time bucket + entity (dashboard timeseries) ---
# Parity: docker/grafana/dashboards/pv_dashboard.json:211 — hourly bucket,
# entity, SUM(generation).
def hourly_sum_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.concat(F.date_format("ts", "yyyy-MM-dd HH"), F.lit(":00:00"))
    return ev.groupBy(
        bucket.alias("bucket_hour"), F.col("event_type")
    ).agg(rnd(F.sum("value"), 4).alias("sum_value"))


HOURLY_SUM_SQL = """
SELECT strftime(ts, '%Y-%m-%d %H') || ':00:00' AS bucket_hour,
       event_type,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


# --- A2: global SUM over a time window (stat panel) ---
# Parity: pv_dashboard.json:296 — SUM(generation) WHERE datetime BETWEEN.
def window_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    # time predicate pushed in the nanos domain (row-group pruning at scale)
    ev = load_events_window(spark, sf_dir, "2024-01-10", "2024-01-20")
    return ev.agg(
        rnd(F.sum("value"), 4).alias("total_value"),
        F.count(F.lit(1)).alias("n_rows"),
    )


WINDOW_TOTAL_SQL = """
SELECT round(sum(value), 4) AS total_value, count(*) AS n_rows
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
"""


# --- A3: COUNT / COUNT(DISTINCT) stats ---
# Parity: pv_dashboard.json:364 — COUNT(DISTINCT plant_name).
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_clicks"),
    )


COUNT_DISTINCT_SQL = """
SELECT count(DISTINCT user_id) AS n_users, count(*) AS n_clicks
FROM events WHERE event_type = 'click'
"""


# --- A4: Top-K — group-by SUM, ORDER BY DESC, LIMIT 10 ---
# Parity: pv_test/grafana/dashboards/pv_dashboard.json panels 20-21.
def topk_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = topk.top_k(ev, ["user_id"], rnd(F.sum("value"), 4), k=10, tie_break=["user_id"])
    return out.select("user_id", F.col("total").alias("total_value"))


TOPK_USERS_SQL = """
SELECT user_id, round(sum(value), 4) AS total_value
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id ASC LIMIT 10
"""


# --- A5: per-key MAX (watermark discovery) ---
# Parity: daily_pv_automation.py:79-87.
def watermark_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        _fmt(F.max("ts")).alias("last_ts"),
        F.max("event_type").alias("max_type"),
    )


WATERMARK_SQL = f"""
SELECT user_id, strftime(max(ts), '{TS_FMT_DUCK}') AS last_ts,
       max(event_type) AS max_type
FROM events GROUP BY user_id
"""


# --- A6: COUNT(DISTINCT hour) per key+day (completeness metric) ---
# Parity: daily_pv_automation.py:51-71, nambu_backfill.py:161-182.
def day_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.countDistinct(F.hour("ts")).cast("bigint").alias("n_hours"))
        .filter(F.col("n_hours") < 24)
    )


DAY_COMPLETENESS_SQL = """
SELECT user_id, CAST(ts AS DATE) AS day,
       count(DISTINCT EXTRACT(hour FROM ts)) AS n_hours
FROM events GROUP BY 1, 2 HAVING count(DISTINCT EXTRACT(hour FROM ts)) < 24
"""


# --- A7: calendar-slot mean (historical imputation profile) ---
# Parity: impute_missing.py:101-129.
def calendar_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.month("ts").cast("bigint").alias("m"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
    ).agg(rnd(F.avg("value"), 4).alias("slot_mean"))


CALENDAR_PROFILE_SQL = """
SELECT EXTRACT(month FROM ts) AS m, EXTRACT(day FROM ts) AS d,
       EXTRACT(hour FROM ts) AS h, round(avg(value), 4) AS slot_mean
FROM events GROUP BY 1, 2, 3
"""


# --- A8: group-by N-unique (multi-unit plant detection) ---
# Parity: namdong_collect_pv.py:285.
def nunique_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_unique_users")
    )


NUNIQUE_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_unique_users
FROM events GROUP BY event_type
"""


# --- A9: column stats — mean/std/null-count (impute debug report) ---
# Parity: impute_missing.py:241-257.
def value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.col("value").isNull().cast("int")).cast("bigint").alias("n_nulls"),
        rnd(F.avg("value"), 4).alias("mean_value"),
        rnd(F.stddev_samp("value"), 4).alias("std_value"),
    )


VALUE_STATS_SQL = """
SELECT event_type,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       round(avg(value), 4) AS mean_value,
       round(stddev_samp(value), 4) AS std_value
FROM events GROUP BY event_type
"""


# --- A10: distinct key list ---
# Parity: pv_test/init_db.py:353.
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("event_type").distinct()


DISTINCT_TYPES_SQL = "SELECT DISTINCT event_type FROM events"


# --- A11: denormalized daily stats per row (window aggregates) ---
# Parity: daily_pv_automation.py:176-179 (qvodgen/avg/max/min columns).
def daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = daily_stats(ev, "ts", "value", keys=["user_id"])
    return out.select(
        "event_id",
        "user_id",
        F.to_date("ts").alias("day"),
        "value",
        "daily_total",
        "daily_avg",
        F.col("daily_max").alias("daily_max"),
        F.col("daily_min").alias("daily_min"),
    )


DAILY_ROLLUP_SQL = """
SELECT event_id, user_id, CAST(ts AS DATE) AS day, value,
       round(sum(value) OVER w, 4) AS daily_total,
       round(avg(value) OVER w, 4) AS daily_avg,
       max(value) OVER w AS daily_max,
       min(value) OVER w AS daily_min
FROM events
WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE))
"""


# --- A13: calendar-true trailing moving average (RANGE frame) ---
def moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving average of daily totals per event type —
    the dashboard smoothing the reference serves from Grafana
    time-series panels, expressed with a calendar-true RANGE frame:
    the frame is keyed on the DAY INDEX, so a missing day shrinks the
    window (ROWS BETWEEN 6 PRECEDING would silently reach 7 calendar
    days back across gaps). The window runs over the per-(type, day)
    aggregate — |types| x |days| rows, never event-sized. Inputs to
    the average are the ALREADY-4-ROUNDED daily totals, so the frame
    average is an average of identical doubles in both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(rnd(F.sum("value"), 4).alias("day_total"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "day_total",
        rnd(F.avg("day_total").over(w), 4).alias("ma_7d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days_in_window"),
    )


MOVING_AVG_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, round(sum(value), 4) AS day_total
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, day_total,
       round(avg(day_total) OVER w, 4) AS ma_7d,
       CAST(count(*) OVER w AS BIGINT) AS n_days_in_window
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
"""


# --- TPC-H Q1 shape: pricing summary (scan + filter + wide agg) ---
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 4).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            rnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            rnd(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            rnd(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- J1: fact ⋈ small dim (broadcast) + agg ---
# Parity: nambu_merge_pv_data.py:66-67 (spec dim join).
def dim_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            rnd(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


DIM_JOIN_SQL = """
SELECT p_brand, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --- J2: left join with range predicate in the join condition ---
# Parity: pv_dashboard.json:83 — plants LEFT JOIN generation within the
# dashboard window; COALESCE(SUM, 0) keeps zero-output plants.
def supplier_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    joined = sup.join(
        li,
        (sup.s_suppkey == li.l_suppkey)
        & (li.l_shipdate >= lo)
        & (li.l_shipdate < hi),
        "left",
    )
    return joined.groupBy("s_suppkey", "s_name").agg(
        rnd(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)), 4).alias("total_price"),
        F.count("l_orderkey").alias("n_lineitems"),
    )


SUPPLIER_WINDOW_SQL = """
SELECT s_suppkey, s_name,
       round(coalesce(sum(l_extendedprice), 0), 4) AS total_price,
       count(l_orderkey) AS n_lineitems
FROM supplier LEFT JOIN lineitem
  ON s_suppkey = l_suppkey
 AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
 AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY s_suppkey, s_name
"""


# --- J3: anti-join (expected vs existing) ---
# Parity: nambu_bulk_sync.py:24-40; NOT IN at pv_test/init_db.py:404-408.
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# --- Q3 shape: 3-way join + agg + top-k ---
def top_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderkey")
        .agg(
            rnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


TOP_URGENT_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderpriority = '1-URGENT'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


# --- Q5-shape: six-table join, revenue per nation in a region/year ---
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the planner's join-breadth exercise: two
    fact-to-fact shuffle joins (customer⋈orders⋈lineitem), a
    same-nation co-location predicate on the supplier join, and two
    broadcast dims (nation, region) with the region filter pushed into
    the broadcast side. Revenue sums are rounded to 4 so cross-engine
    summation order cannot move the result (q1 convention)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    y0 = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    y1 = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .filter((F.col("o_orderdate") >= y0) & (F.col("o_orderdate") < y1))
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("n_name")
        .agg(
            rnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


LOCAL_SUPPLIER_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --- TPC-H Q10 shape: top customers by returned-item revenue ---
def returned_item_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — the returned-item report: which customers
    returned the most revenue in a quarter. Two fact-to-fact shuffle
    joins with the date window pushed to the orders scan and the
    returnflag filter pushed to the lineitem scan (both prune BEFORE
    the joins), one broadcast dim, and a rounded-revenue
    TakeOrderedAndProject top-20 (rank on the rounded value, q1
    convention, so both engines cut identical rows)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    q0 = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    q1 = F.lit("1996-07-01 00:00:00").cast("timestamp_ntz")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .filter((F.col("o_orderdate") >= q0) & (F.col("o_orderdate") < q1))
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            orders.o_orderkey == li.l_orderkey,
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            rnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


RETURNED_ITEM_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-04-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- TPC-H Q14 shape: conditional-aggregate ratio over a date window ---
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion revenue share for one ship month:
    the month window is pushed to the lineitem scan, the part dim rides
    in on a broadcast, and ONE aggregate computes the conditional-sum
    ratio (CASE inside SUM — no second scan, no self-join). Both sums
    round before the division so the published share is a pure function
    of already-hash-checked values in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    m0 = F.lit("1996-09-01 00:00:00").cast("timestamp_ntz")
    m1 = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.filter((F.col("l_shipdate") >= m0) & (F.col("l_shipdate") < m1))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            rnd(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0.0)
                    )
                ),
                4,
            ).alias("promo_revenue"),
            rnd(F.sum(rev), 4).alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        rnd(
            100.0 * F.col("promo_revenue") / F.col("total_revenue"), 4
        ).alias("promo_share_pct"),
    )


PROMO_REVENUE_SQL = """
WITH agg AS (
  SELECT round(sum(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END), 4) AS promo_revenue,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
)
SELECT promo_revenue, total_revenue,
       round(100.0 * promo_revenue / total_revenue, 4) AS promo_share_pct
FROM agg
"""


# --- TPC-H Q18 shape: HAVING on the big fact drives the enrichment ---
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — the large-volume-order report. The groupBy +
    HAVING runs on the BIGGEST fact first and produces an order-key set
    orders of magnitude smaller than lineitem; only that survivor set
    joins orders and customer (the filter-before-join shape that keeps
    both enrichment joins small at any scale). The per-order quantity
    fan-in is absorbed by the partial aggregate (map-side combine), the
    HAVING lands on the rounded sum so both engines cut identical
    orders, and the final top-100 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(rnd(F.sum("l_quantity"), 4).alias("total_qty"))
        .filter(F.col("total_qty") > 250.0)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            _fmt("o_orderdate").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
        )
        .limit(100)
    )


LARGE_ORDER_SQL = f"""
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(l_quantity), 4) > 250.0
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '{TS_FMT_DUCK}') AS orderdate,
       o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# --- TPC-H Q4 shape: EXISTS semi-join with a cross-table predicate ---
def late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — order-priority checking: how many orders per
    priority had at least one LATE line item (shipped > 90 days after
    the order date; the schema has no commit/receipt dates, so
    lateness is ship-vs-order). The EXISTS compiles to ONE left-semi
    join carrying the cross-table lateness predicate in the join
    condition — lineitem is scanned once, never aggregated or
    deduplicated (semi-join short-circuits per order), and the
    quarter window prunes the orders scan before the join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    q0 = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    q1 = F.lit("1997-04-01 00:00:00").cast("timestamp_ntz")
    windowed = orders.filter(
        (F.col("o_orderdate") >= q0) & (F.col("o_orderdate") < q1)
    )
    late = windowed.join(
        li,
        (windowed.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > F.timestamp_add("DAY", F.lit(90), windowed.o_orderdate)
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_late_orders"))
    )


LATE_PRIORITY_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


# --- TPC-H Q19 shape: disjunctive multi-table predicate pushdown ---
def discounted_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — discounted revenue across three
    (brand, size-range, quantity-range) brackets expressed as an
    OR-of-ANDs spanning BOTH join sides. The optimizer test: Catalyst
    must factor the single-table conjuncts out of the disjunction so
    each scan still prunes (part: brand/size envelope; lineitem:
    quantity envelope) before the broadcast join evaluates the full
    residual — a naive plan evaluates the whole OR post-join over an
    unfiltered cartesian-ish input. One row out; both sums rounded
    before publishing."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            rnd(F.sum(rev), 4).alias("revenue"),
        )
    )


BRACKET_REVENUE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 20 AND 35)
"""


# --- TPC-H Q22 shape: scalar subquery + anti-join + dim rollup ---
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — sales-opportunity report: customers whose
    balance beats the positive-balance average but who have placed no
    RECENT order (every customer in this corpus has ordered at some
    point, so the anti-join window is the lapse cutoff — Q22's "no
    orders in N years" clause), rolled up per nation. The global
    average is a one-row broadcast scalar (the only sane plan for a
    scalar subquery — never a shuffle), the lapse test is an UN-HINTED
    LEFT ANTI against the date-filtered orders keyed on custkey (the
    cutoff prunes at the orders scan; AQE size-gates the strategy, so
    the fact side broadcasts only while it genuinely fits — the purge
    convention), and the nation rollup broadcasts the dim. The
    threshold compares against the ROUNDED average so the cut is
    engine-portable."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    cutoff = F.lit("2000-07-01 00:00:00").cast("timestamp_ntz")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(rnd(F.avg("c_acctbal"), 4).alias("_avg_bal"))
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg_bal")
    )
    idle = rich.join(
        orders.filter(F.col("o_orderdate") >= cutoff),
        rich.c_custkey == orders.o_custkey,
        "left_anti",
    )
    return (
        idle.join(
            F.broadcast(nation), idle.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            rnd(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


IDLE_RICH_SQL = """
WITH avg_bal AS (
  SELECT round(avg(c_acctbal), 4) AS a FROM customer WHERE c_acctbal > 0.0
), idle AS (
  SELECT c.* FROM customer c, avg_bal
  WHERE c.c_acctbal > avg_bal.a
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
)
SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 4) AS total_acctbal
FROM idle JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- O3: dedup keep-first on key with explicit ordering ---
# Parity: initial_db_ingestion.py:99 (+ SURVEY §7.1 determinism fix).
def dedup_keep_first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = dedup.dedup_keep_first(
        ev.withColumn("_ord", F.col("event_id")), ["user_id", "event_type"], "_ord"
    )
    return out.select("user_id", "event_type", "event_id", _fmt("ts").alias("first_ts"))


DEDUP_FIRST_SQL = f"""
SELECT user_id, event_type, event_id, strftime(ts, '{TS_FMT_DUCK}') AS first_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1
"""


# --- O4: dedup keep-last (new data wins) ---
# Parity: prefect_flows/merge_to_all.py:57-79.
def dedup_keep_last_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = dedup.dedup_keep_last(
        ev.withColumn("_ord", F.col("event_id")), ["user_id", "event_type"], "_ord"
    )
    return out.select("user_id", "event_type", "event_id", _fmt("ts").alias("last_ts"))


DEDUP_LAST_SQL = f"""
SELECT user_id, event_type, event_id, strftime(ts, '{TS_FMT_DUCK}') AS last_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --- O5: union-all of per-source frames + agg ---
# Parity: collect_asos.py:119 (pd.concat of station frames).
def union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id", "value")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id", "value")
    return a.unionByName(b).groupBy("user_id").agg(
        rnd(F.sum("value"), 4).alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


UNION_SLICES_SQL = """
SELECT user_id, round(sum(value), 4) AS total_value, count(*) AS n_events
FROM (
  SELECT user_id, value FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, value FROM events WHERE event_type = 'purchase'
) GROUP BY user_id
"""


# --- O6: set difference ---
# Parity: nambu_bulk_sync.py:35-37 (expected - existing dates).
def users_click_not_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.exceptAll(buys)


EXCEPT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
"""


# --- O7: set intersection (completes the union/except/intersect family) ---
def users_click_and_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users present in BOTH behavior sets — native INTERSECT; Catalyst
    rewrites it to a left-semi join on the deduplicated sides, the same
    shuffle shape as o6's except/anti."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.intersect(buys)


INTERSECT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
"""


# --- R1: unpivot wide→long ---
# Parity: pd.melt sites (nambu_merge_pv_data.py:71-81 et al.); here the
# wide shape is lineitem's four measure columns.
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "amount",
    )


UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS amount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


# --- P9: hour-24 → next-day-00 rollover ---
# Parity: namdong_wind_collect.py:127-138. Rebuild each event's hour slot
# under the 1-based-exclusive labeling and roll hour 24 into next day.
def hour24_rollover(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    h24 = F.hour("ts") + F.lit(1)  # 1-based exclusive hour label
    rebuilt = F.timestamp_add(
        "HOUR", h24.cast("int"), day.cast("timestamp_ntz")
    )
    return ev.select(
        "event_id",
        h24.cast("bigint").alias("hour_label"),
        F.date_format(rebuilt, TS_FMT_SPARK).alias("slot_end_ts"),
    )


HOUR24_SQL = f"""
SELECT event_id,
       EXTRACT(hour FROM ts) + 1 AS hour_label,
       strftime(CAST(CAST(ts AS DATE) AS TIMESTAMP) + (EXTRACT(hour FROM ts) + 1) * INTERVAL 1 HOUR,
                '{TS_FMT_DUCK}') AS slot_end_ts
FROM events
"""


# --- P6/P12/P13: expression suite on part (safe cast, regex numeric
# extraction, concat keys, conditional column) ---
# Parity: initial_db_ingestion.py:57-62; namdong_collect_pv.py:284-288.
def part_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"(\d+)", 1).try_cast("bigint").alias("brand_num"),
        F.concat_ws("_", "p_brand", F.col("p_size").cast("string")).alias("brand_size_key"),
        F.when(F.col("p_size") >= 25, F.concat(F.col("p_name"), F.lit(" (large)")))
        .otherwise(F.col("p_name"))
        .alias("display_name"),
        rnd(F.col("p_retailprice") * 1.1, 4).alias("price_with_tax"),
    )


PART_EXPR_SQL = """
SELECT p_partkey,
       TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
       p_brand || '_' || CAST(p_size AS VARCHAR) AS brand_size_key,
       CASE WHEN p_size >= 25 THEN p_name || ' (large)' ELSE p_name END AS display_name,
       round(p_retailprice * 1.1, 4) AS price_with_tax
FROM part
"""


# --- JSON prop extraction (schema-on-read projection) ---
# Parity: schema-on-read JSON handling (collect_asos.py:86).
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_value"),
    )


PROPS_JSON_SQL = """
SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
"""


# --- P11: name normalization (strip unit suffix, collapse space, lower) ---
# Parity: pv_test/init_db.py:75-81 — supplier names 'Supplier#000000001'
# normalize to their base token.
def normalize_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    norm = F.lower(
        F.trim(F.regexp_replace(F.regexp_replace("s_name", r"[#＃_\-]\s*\d+\s*$", ""), r"\s+", " "))
    )
    return sup.select("s_suppkey", "s_name", norm.alias("norm_name"))


NORMALIZE_SQL = """
SELECT s_suppkey, s_name,
       lower(trim(regexp_replace(regexp_replace(s_name, '[#＃_\\-]\\s*[0-9]+\\s*$', '', 'g'), '\\s+', ' ', 'g'))) AS norm_name
FROM supplier
"""


# --- A5+A6+T6: incremental watermark resume planning ---
# Parity: get_active_targets (daily_pv_automation.py:74-126): per key,
# last ts; if the last day is incomplete (<24 distinct hours) restart on
# that day, else the next day.
def watermark_resume_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    last = ev.groupBy("user_id").agg(F.max("ts").alias("_last_ts"))
    per_day = ev.groupBy(
        "user_id", F.to_date("ts").alias("_day")
    ).agg(F.countDistinct(F.hour("ts")).alias("_n_hours"))
    joined = last.join(
        per_day,
        (last.user_id == per_day.user_id)
        & (F.to_date(last._last_ts) == per_day._day),
    ).select(last.user_id, "_last_ts", "_n_hours")
    return joined.select(
        "user_id",
        _fmt("_last_ts").alias("last_ts"),
        F.when(F.col("_n_hours") < 24, F.to_date("_last_ts"))
        .otherwise(F.date_add(F.to_date("_last_ts"), 1))
        .alias("restart_day"),
    )


WATERMARK_RESUME_SQL = f"""
WITH last AS (
  SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id
), per_day AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         count(DISTINCT EXTRACT(hour FROM ts)) AS n_hours
  FROM events GROUP BY 1, 2
)
SELECT l.user_id, strftime(l.last_ts, '{TS_FMT_DUCK}') AS last_ts,
       CASE WHEN p.n_hours < 24 THEN CAST(l.last_ts AS DATE)
            ELSE CAST(l.last_ts AS DATE) + 1 END AS restart_day
FROM last l JOIN per_day p
  ON l.user_id = p.user_id AND CAST(l.last_ts AS DATE) = p.day
"""

CORE_QUERIES = {
    "a1_hourly_sum_by_type": (hourly_sum_by_type, HOURLY_SUM_SQL),
    "a2_window_total": (window_total, WINDOW_TOTAL_SQL),
    "a13_moving_avg_7d": (moving_avg_7d, MOVING_AVG_SQL),
    "a3_count_distinct_users": (count_distinct_users, COUNT_DISTINCT_SQL),
    "a4_topk_users_by_value": (topk_users_by_value, TOPK_USERS_SQL),
    "a5_watermark_per_user": (watermark_per_user, WATERMARK_SQL),
    "a6_day_completeness": (day_completeness, DAY_COMPLETENESS_SQL),
    "a7_calendar_profile": (calendar_profile, CALENDAR_PROFILE_SQL),
    "a8_nunique_users_per_type": (nunique_users_per_type, NUNIQUE_SQL),
    "a9_value_stats": (value_stats, VALUE_STATS_SQL),
    "a10_distinct_event_types": (distinct_event_types, DISTINCT_TYPES_SQL),
    "a11_daily_rollup": (daily_rollup, DAILY_ROLLUP_SQL),
    "q1_pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "j1_dim_join_agg": (dim_join_agg, DIM_JOIN_SQL),
    "j2_supplier_window_activity": (supplier_window_activity, SUPPLIER_WINDOW_SQL),
    "j3_customers_without_orders": (customers_without_orders, CUSTOMERS_WITHOUT_ORDERS_SQL),
    "q3_top_urgent_orders": (top_urgent_orders, TOP_URGENT_SQL),
    "q5_local_supplier_volume": (local_supplier_volume, LOCAL_SUPPLIER_SQL),
    "q10_returned_item_topk": (returned_item_topk, RETURNED_ITEM_SQL),
    "q14_promo_revenue_share": (promo_revenue_share, PROMO_REVENUE_SQL),
    "q18_large_order_customers": (large_order_customers, LARGE_ORDER_SQL),
    "q4_late_priority_counts": (late_order_priority_counts, LATE_PRIORITY_SQL),
    "q19_bracket_revenue": (discounted_bracket_revenue, BRACKET_REVENUE_SQL),
    "q22_idle_rich_customers": (idle_rich_customers, IDLE_RICH_SQL),
    "o3_dedup_keep_first": (dedup_keep_first_events, DEDUP_FIRST_SQL),
    "o4_dedup_keep_last": (dedup_keep_last_events, DEDUP_LAST_SQL),
    "o5_union_slices": (union_slices, UNION_SLICES_SQL),
    "o6_users_click_not_purchase": (users_click_not_purchase, EXCEPT_SQL),
    "o7_users_click_and_purchase": (users_click_and_purchase, INTERSECT_SQL),
    "r1_unpivot_measures": (unpivot_measures, UNPIVOT_SQL),
    "p9_hour24_rollover": (hour24_rollover, HOUR24_SQL),
    "p_part_expressions": (part_expressions, PART_EXPR_SQL),
    "p_props_json_extract": (props_json_extract, PROPS_JSON_SQL),
    "p11_normalize_supplier_names": (normalize_supplier_names, NORMALIZE_SQL),
    "t6_watermark_resume_plan": (watermark_resume_plan, WATERMARK_RESUME_SQL),
}
