"""Scale probes for the round-9 session-2 shapes, on synthetic data
17-20x the sf0.1 bench size (same conventions as scale_probe.py).
Appends results into scale_probe_results.json under "round9b".

Probes:
- hll_20x_events      — HLL register fold at 0.6M vs 12M events: the
                        distinct + 256-row register aggregate should be
                        scan-bounded.
- q21_window_vs_selfjoin — the adapted Q21 per-order window-aggregate
                        plan vs the textbook EXISTS/NOT-EXISTS double
                        self-join, same 6M-line synthetic data: the
                        window plan aggregates once, the self-join
                        re-joins the fact twice.
- jsd_20x_docs        — per-source JS divergence at 5k vs 100k docs:
                        explode + (source, token) combine + token
                        window; cost tracks tokens.
- scd2_20x_events     — the SCD2 history build at 0.6M vs 12M events.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scale_probe import synth_docs, synth_events, timed  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    from energy_data_pipeline_spark.operators import sketches as SK

    for label, n in [("0.6M", 600_000), ("12M", 12_000_000)]:
        ev = synth_events(spark, n)
        results[f"hll_{label}"] = timed(
            lambda: noop(SK.hll_estimate(SK.hll_registers(ev, "user_id")))
        )
        daily = ev.groupBy(
            "user_id", F.to_date("ts").alias("day"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
        rk = F.row_number().over(
            Window.partitionBy("user_id", "day").orderBy(
                F.col("n").desc(), F.col("event_type").asc()
            )
        )
        dom = daily.withColumn("_rk", rk).filter("_rk = 1")
        rn_all = F.row_number().over(
            Window.partitionBy("user_id").orderBy("day")
        )
        rn_type = F.row_number().over(
            Window.partitionBy("user_id", "event_type").orderBy("day")
        )
        runs = dom.select(
            "user_id", "day", "event_type", (rn_all - rn_type).alias("_g")
        )
        results[f"scd2_{label}"] = timed(
            lambda: noop(
                runs.groupBy("user_id", "event_type", "_g").agg(
                    F.min("day"), F.max("day"), F.count(F.lit(1))
                )
            )
        )

    # Q21 shape: 6M lines, ~1.5M orders, ~4 suppliers/order, 10% late
    lines = spark.range(0, 6_000_000, 1, 64).select(
        (F.col("id") % 1_500_000).alias("orderkey"),
        F.pmod(F.xxhash64("id"), 400).alias("suppkey"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 10) == 0).cast("int").alias("late"),
    )

    def q21_window():
        pair = lines.groupBy("orderkey", "suppkey").agg(
            F.max("late").alias("late")
        )
        w = Window.partitionBy("orderkey")
        ann = pair.withColumn("n_supp", F.count(F.lit(1)).over(w)).withColumn(
            "n_late", F.sum("late").over(w)
        )
        noop(
            ann.filter("late = 1 and n_late = 1 and n_supp > 1")
            .groupBy("suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
        )

    def q21_selfjoin():
        pair = lines.groupBy("orderkey", "suppkey").agg(
            F.max("late").alias("late")
        )
        l1 = pair.filter("late = 1")
        l2 = pair.select(
            F.col("orderkey").alias("o2"), F.col("suppkey").alias("s2")
        )
        l3 = pair.filter("late = 1").select(
            F.col("orderkey").alias("o3"), F.col("suppkey").alias("s3")
        )
        exists = l1.join(
            l2, (l1.orderkey == F.col("o2")) & (l1.suppkey != F.col("s2")),
            "left_semi",
        )
        notex = exists.join(
            l3,
            (exists.orderkey == F.col("o3")) & (exists.suppkey != F.col("s3")),
            "left_anti",
        )
        noop(notex.groupBy("suppkey").agg(F.count(F.lit(1)).alias("numwait")))

    results["q21_window_6M"] = timed(q21_window)
    results["q21_selfjoin_6M"] = timed(q21_selfjoin)

    from energy_data_pipeline_spark.functions import text as T

    for label, n in [("5k", 5_000), ("100k", 100_000)]:
        docs = synth_docs(spark, n).withColumn(
            "source", F.concat(F.lit("src"), (F.col("doc_id") % 20))
        )
        dt = (
            docs.select(
                "source", F.explode(T.words("text")).alias("w")
            )
            .groupBy("source", "w")
            .agg(F.count(F.lit(1)).alias("n"))
        )

        def jsd():
            st = dt.withColumn(
                "gn", F.sum("n").over(Window.partitionBy("w"))
            )
            srctot = dt.groupBy("source").agg(F.sum("n").alias("s"))
            grand = srctot.agg(F.sum("s").alias("t"))
            p = F.col("n") / F.col("s")
            q = F.col("gn") / F.col("t")
            noop(
                st.join(F.broadcast(srctot), "source")
                .crossJoin(F.broadcast(grand))
                .groupBy("source")
                .agg(F.sum(p * F.log(2.0 * p / (p + q))).alias("x"))
            )

        results[f"jsd_{label}"] = timed(jsd)

    summary = {
        "hll_20x_events": round(results["hll_12M"] / results["hll_0.6M"], 2),
        "scd2_20x_events": round(results["scd2_12M"] / results["scd2_0.6M"], 2),
        "q21_window_vs_selfjoin_6M": round(
            results["q21_window_6M"] / results["q21_selfjoin_6M"], 2
        ),
        "jsd_20x_docs": round(results["jsd_100k"] / results["jsd_5k"], 2),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_probe_results.json",
    )
    try:
        existing = json.load(open(out_path))
    except Exception:
        existing = {}
    existing["round9b"] = {"raw": results, "summary": summary}
    json.dump(existing, open(out_path, "w"), indent=1)
    print(json.dumps({"raw": results, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
