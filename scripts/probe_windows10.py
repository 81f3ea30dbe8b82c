"""Window-operator growth probes (appends under "round10b_windows" in
scale_probe_results.json; conventions of scale_probe.py).

The TPC-H 16x probe covered join/agg shapes; this covers the two
window families the catalog leans on:
- sessions_10x — st_user_sessions' shape (lag over user_id partitions
                 then gap-split aggregation) at 6M vs 60M events: the
                 per-user window is shuffle-bound, so growth should
                 track the shuffle (~linear), never user-count-squared.
- ma7_10x      — a13's calendar-true RANGE window over the per-(type,
                 day) aggregate at 6M vs 60M events: the window input
                 is |types| x |days| rows regardless of event volume,
                 so growth should be scan-bound (the daily aggregate),
                 with the window cost flat.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scale_probe import synth_events, timed  # noqa: E402


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

    for label, n in (("6M", 6_000_000), ("60M", 60_000_000)):
        ev = synth_events(spark, n)

        def sessions():
            w = Window.partitionBy("user_id").orderBy("ts")
            secs = F.col("ts").cast("timestamp").cast("long")
            gap = secs - F.lag(secs).over(w)
            flagged = ev.select(
                "user_id",
                "ts",
                F.when(
                    gap.isNull() | (gap > 1800), F.lit(1)
                ).otherwise(F.lit(0)).alias("new_s"),
            )
            sess = flagged.select(
                "user_id",
                "ts",
                F.sum("new_s").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ).alias("session_id"),
            )
            noop(
                sess.groupBy("user_id", "session_id").agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.min("ts").alias("start"),
                    F.max("ts").alias("end"),
                )
            )

        def ma7():
            daily = ev.groupBy(
                "event_type", F.to_date("ts").alias("day")
            ).agg(F.sum("value").alias("day_total"))
            w = (
                Window.partitionBy("event_type")
                .orderBy(
                    F.datediff(
                        F.col("day"), F.lit("2024-01-01").cast("date")
                    )
                )
                .rangeBetween(-6, 0)
            )
            noop(
                daily.select(
                    "event_type",
                    "day",
                    F.avg("day_total").over(w).alias("ma_7d"),
                )
            )

        results[f"sessions_{label}"] = timed(sessions)
        results[f"ma7_{label}"] = timed(ma7)

    summary = {
        "sessions_10x": round(
            results["sessions_60M"] / results["sessions_6M"], 2
        ),
        "ma7_10x": round(results["ma7_60M"] / results["ma7_6M"], 2),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_probe_results.json",
    )
    try:
        existing = json.load(open(out_path))
    except Exception:
        existing = {}
    existing["round10b_windows"] = {"raw": results, "summary": summary}
    json.dump(existing, open(out_path, "w"), indent=1)
    print(json.dumps({"raw": results, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
