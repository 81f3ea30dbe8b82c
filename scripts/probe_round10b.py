"""Round-10 continuation scale probes (conventions of scale_probe.py;
appends results under "round10b" in scale_probe_results.json).

Probes:
- tpch_16x          — q1 / q9 / q21 on a 16x-scaled copy of sf0.1's
                      lineitem+orders (orderkeys shifted per copy, so
                      order->lineitem fan-out is preserved), the other
                      tables shared. Ratio t(16x)/t(1x) near 16 = linear
                      scan/shuffle behaviour; >>16 = a superlinear join
                      or window that would be a 100 TB scale-killer
                      (a first 4x run produced ratios of 0.85-1.26 —
                      pure fixed overhead, below the signal floor).
                      Runs the ACTUAL catalog plans via a synthetic
                      sf_dir, not re-declared shapes.
- hll_overlap_10x   — the sk_hll_split_overlap shape at 100k vs 1M
                      docs x 10 sources, split into the register/
                      estimate path (which must be ~scan-flat: state is
                      |S| x m regardless of volume) and the exact-audit
                      fingerprint self-join (expected to grow with the
                      data; it is the audit column, dropped at real
                      scale).
- qsketch_10x       — the sk_binned_quantiles shape at 6M vs 60M
                      events, split into the histogram/sketch path
                      (bin counts merge by +, ~scan-linear) and the
                      exact-percentile audit aggregate (sort-heavy,
                      the column a 100 TB run drops).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scale_probe import synth_events, timed  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
KEY_SHIFT = 10_000_000  # > any sf0.1 orderkey


def build_scaled_dir(spark: SparkSession, base: str, k: int) -> str:
    """A synthetic sf_dir with lineitem+orders scaled k-fold (orderkey
    shifted per copy) and every other table symlinked from sf0.1."""
    out = os.path.join(base, f"tpch_{k}x")
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for t in TABLES:
        if t in ("lineitem", "orders") and k > 1:
            continue
        os.symlink(f"{SF_DIR}/{t}.parquet", f"{out}/{t}.parquet")
    if k > 1:
        for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
            df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
            copies = [
                df.withColumn(key, F.col(key) + F.lit(i * KEY_SHIFT))
                for i in range(k)
            ]
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
            scaled.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


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

    # --- TPC-H growth: the real catalog plans on scaled inputs ---
    from energy_data_pipeline_spark.plans.catalog import CATALOG

    base = "/tmp/probe_round10b"
    os.makedirs(base, exist_ok=True)
    # 16x (9.6M lineitem rows): at 4x the 0.9-1.4 s measurements were
    # fixed-overhead-dominated (4x ratios of 0.85-1.26 — i.e. noise)
    dirs = {k: build_scaled_dir(spark, base, k) for k in (1, 16)}
    for q in ("q1_pricing_summary", "q9_product_type_profit",
              "q21_sole_slow_shipper"):
        fn, _sql = CATALOG[q]
        for k, d in dirs.items():
            results[f"{q.split('_')[0]}_{k}x"] = timed(
                lambda f=fn, dd=d: noop(f(spark, dd))
            )

    # --- HLL split overlap: sketch path vs exact-audit path ---
    from energy_data_pipeline_spark.operators import sketches as SK

    def synth_src_docs(n: int):
        vocab = F.array(*[F.lit(f"w{i:03d}") for i in range(400)])
        word_at = lambda j: F.element_at(  # noqa: E731
            vocab, (F.pmod(F.xxhash64("id", F.lit(j)), 400) + 1).cast("int")
        )
        return spark.range(0, n, 1, 64).select(
            F.concat(
                F.lit("src"), F.pmod(F.xxhash64("id", F.lit(99)), 10)
            ).alias("source"),
            F.concat_ws(" ", *[word_at(j) for j in range(40)]).alias("text"),
        )

    for label, n in (("100k", 100_000), ("1M", 1_000_000)):
        docs = synth_src_docs(n)
        fp = docs.select(
            "source", F.md5(F.col("text")).alias("fp")
        ).distinct()

        def sketch_only():
            keyed = fp.select(
                "source", SK.hll_hash(F.col("fp")).alias("hv")
            )
            reg = keyed.groupBy(
                "source", SK.hll_bucket(F.col("hv")).alias("bucket")
            ).agg(F.max(SK.hll_rho(F.col("hv"))).alias("rho"))
            srcs = reg.select("source").distinct()
            pairs = (
                srcs.alias("a")
                .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
                .select(
                    F.col("a.source").alias("sa"),
                    F.col("b.source").alias("sb"),
                )
            )
            preg = (
                F.broadcast(pairs)
                .join(
                    reg,
                    (F.col("source") == F.col("sa"))
                    | (F.col("source") == F.col("sb")),
                )
                .groupBy("sa", "sb", "bucket")
                .agg(F.max("rho").alias("rho"))
            )
            noop(
                preg.groupBy("sa", "sb").agg(
                    F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("sp"),
                    F.count(F.lit(1)).alias("used"),
                )
            )

        def exact_audit():
            noop(
                fp.alias("x")
                .join(
                    fp.alias("y"),
                    (F.col("x.fp") == F.col("y.fp"))
                    & (F.col("x.source") < F.col("y.source")),
                )
                .groupBy("x.source", "y.source")
                .agg(F.count(F.lit(1)).alias("n"))
            )

        results[f"hll_overlap_sketch_{label}"] = timed(sketch_only)
        results[f"hll_overlap_exact_{label}"] = timed(exact_audit)

    # --- binned quantiles: histogram path vs exact-percentile audit ---
    for label, n in (("6M", 6_000_000), ("60M", 60_000_000)):
        # synth_events' value has only 10k distinct values, which lets
        # the exact-percentile aggregate collapse to a tiny counts map —
        # override with a ~continuous domain so the audit-column cost is
        # measured honestly
        ev = synth_events(spark, n).withColumn(
            "value",
            F.pmod(F.xxhash64("event_id", F.lit(7)), 1_000_000_000) / 1e7,
        )

        def hist_path():
            row = ev.agg(
                F.min("value").alias("lo"), F.max("value").alias("hi")
            ).collect()[0]
            lo, hi = float(row["lo"]), float(row["hi"])
            width = (hi - lo) / 64.0
            noop(
                ev.select(
                    F.least(
                        F.floor((F.col("value") - F.lit(lo)) / F.lit(width))
                        .cast("int"),
                        F.lit(63),
                    ).alias("bin")
                )
                .groupBy("bin")
                .count()
            )

        def exact_path():
            noop(
                ev.agg(
                    F.percentile(
                        "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
                    ).alias("ex")
                )
            )

        results[f"qsketch_hist_{label}"] = timed(hist_path)
        results[f"qsketch_exact_{label}"] = timed(exact_path)

    summary = {
        "q1_16x_vs_1x": round(results["q1_16x"] / results["q1_1x"], 2),
        "q9_16x_vs_1x": round(results["q9_16x"] / results["q9_1x"], 2),
        "q21_16x_vs_1x": round(results["q21_16x"] / results["q21_1x"], 2),
        "hll_sketch_10x_docs": round(
            results["hll_overlap_sketch_1M"]
            / results["hll_overlap_sketch_100k"],
            2,
        ),
        "hll_exact_10x_docs": round(
            results["hll_overlap_exact_1M"]
            / results["hll_overlap_exact_100k"],
            2,
        ),
        "qsketch_hist_10x": round(
            results["qsketch_hist_60M"] / results["qsketch_hist_6M"], 2
        ),
        "qsketch_exact_10x": round(
            results["qsketch_exact_60M"] / results["qsketch_exact_6M"], 2
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_probe_results.json",
    )
    try:
        existing = json.load(open(out_path))
    except Exception:
        existing = {}
    existing["round10b"] = {"raw": results, "summary": summary}
    json.dump(existing, open(out_path, "w"), indent=1)
    print(json.dumps({"raw": results, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
