"""Round-12 session-2 probe: scale behavior of the new curation ops.

Replicates the sf0.1 documents/embeddings tables into a synthetic
snapshot directory at several multipliers and times the new catalog
entries against each, recording the scaling bend:

- emb_bitext_margin_pairs: the exact cross product is the honest
  QUADRATIC path (|src| x |tgt| pairs) — measured so the bend is on
  record next to the documented bucketed (IVF/LSH-cell) alternative.
- txt_nb_quality_classifier: training + scoring should be corpus-
  LINEAR (one token-frame aggregate + one broadcast-join scan).
- smp_kcenter_coreset: k rounds of corpus-linear maximin aggregates.
- rag_mmr_diversified_topk: shortlist-CONSTANT (only the pool cut
  scans the corpus).

Writes a round12b section into scale_probe_results.json.
Quiet host required — run nothing else concurrently.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
WORK = "/tmp/probe12b"


def calibrate() -> float:
    t0 = time.monotonic()
    acc = 0
    for i in range(4_000_000):
        acc += i * i
    return round(time.monotonic() - t0, 3)


def replicate(spark: SparkSession, mult: int) -> str:
    """Synthetic snapshot dir with documents/embeddings replicated
    ``mult`` times (ids offset per copy so keys stay unique)."""
    out = f"{WORK}/x{mult}"
    if os.path.exists(out):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    n_d = docs.count()
    n_e = emb.count()
    d_parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * n_d))
        for k in range(mult)
    ]
    e_parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_e))
        for k in range(mult)
    ]
    d = d_parts[0]
    for p in d_parts[1:]:
        d = d.unionByName(p)
    e = e_parts[0]
    for p in e_parts[1:]:
        e = e.unionByName(p)
    d.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    e.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def timed(fn, reps: int = 3) -> float:
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-round12b")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from energy_data_pipeline_spark.plans import catalog_corpus as CC
    from energy_data_pipeline_spark.plans import plan_cache

    results: dict = {"calibration_s": calibrate()}

    for mult in (1, 4):
        sf = BASE_SF if mult == 1 else replicate(spark, mult)
        plan_cache.clear()
        # cold build of the pinned pair frame + margin algebra
        results[f"bitext_cold_x{mult}"] = timed(
            lambda: CC.bitext_margin_pairs(spark, sf).count(), reps=1
        )
        results[f"bitext_warm_x{mult}"] = timed(
            lambda: CC.bitext_margin_pairs(spark, sf).count()
        )

    for mult in (1, 8):
        sf = BASE_SF if mult == 1 else replicate(spark, mult)
        plan_cache.clear()
        results[f"nb_cold_x{mult}"] = timed(
            lambda: CC.nb_quality_classifier(spark, sf).count(), reps=1
        )
        results[f"nb_warm_x{mult}"] = timed(
            lambda: CC.nb_quality_classifier(spark, sf).count()
        )
        plan_cache.clear()
        results[f"kcenter_cold_x{mult}"] = timed(
            lambda: CC.kcenter_coreset(spark, sf).count(), reps=1
        )
        plan_cache.clear()
        results[f"mmr_cold_x{mult}"] = timed(
            lambda: CC.mmr_diversified_topk(spark, sf).count(), reps=1
        )

    results["calibration_end_s"] = calibrate()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_probe_results.json",
    )
    with open(path) as fh:
        existing = json.load(fh)
    existing["round12b"] = results
    with open(path, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(results, indent=1))
    shutil.rmtree(WORK, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
