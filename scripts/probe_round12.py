"""Round-12 probe: base PQ fidelity vs cost (r11 advice #4).

Measures recall@5 against exact L2 and warm search latency for the
PQ/ADC and IVFADC paths across codebook configs (M subspaces x K
centroids/subspace), on the sf0.1 embeddings (2k x 64f). Decides
whether the catalog's 8x16 default should move. Writes a round12
section into scale_probe_results.json.

Quiet host required — run nothing else concurrently.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-round12")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from energy_data_pipeline_spark.operators import pq
    from energy_data_pipeline_spark.operators.ivf import kmeans_lloyd
    from energy_data_pipeline_spark.plans import catalog_ext as CE
    from energy_data_pipeline_spark.sources import load_table
    from energy_data_pipeline_spark.sources.tables import fan_out

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    queries = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < CE.PQ_QUERY_MAX)
        .repartition(1)
        .persist()
    )
    queries.count()

    exact = CE._ann_exact_top5(spark, sf_dir)
    exact.count()
    n_q = queries.count()

    def recall_of(topk_df) -> float:
        hits = exact.join(
            topk_df.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        ).count()
        return round(hits / (n_q * 5.0), 4)

    results: dict = {}
    for m, k in [(8, 16), (8, 32), (8, 64), (16, 16), (16, 32)]:
        t0 = time.perf_counter()
        cents = pq.pq_train(emb, "vec_id", "embedding", m=m, k=k)
        train_s = round(time.perf_counter() - t0, 2)
        codes = (
            pq.pq_assign(emb, cents, "vec_id", "embedding")
            .repartition(1)
            .persist()
        )
        codes.count()
        adc = pq.adc_topk_from_codes(codes, queries, cents, k=5)
        adc.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        adc.write.format("noop").mode("overwrite").save()
        adc_s = round(time.perf_counter() - t0, 3)
        r = recall_of(adc)
        results[f"adc_m{m}_k{k}"] = {
            "recall5": r, "train_s": train_s, "warm_search_s": adc_s,
        }
        print(f"ADC m={m} k={k}: recall@5={r} train={train_s}s "
              f"search={adc_s}s", file=sys.stderr)
        codes.unpersist()

    # IVFADC at the two most promising PQ configs
    coarse = kmeans_lloyd(
        emb, "vec_id", "embedding",
        k=CE.IVFPQ_COARSE_K, iterations=CE.IVFPQ_COARSE_ITERS,
    )
    for m, k in [(8, 16), (8, 64)]:
        _, pq_cents = pq.ivfpq_train(
            emb, "vec_id", "embedding",
            coarse_k=CE.IVFPQ_COARSE_K, coarse_iters=CE.IVFPQ_COARSE_ITERS,
            m=m, k=k, coarse=coarse,
        )
        codes = (
            pq.ivfpq_assign_codes(emb, coarse, pq_cents)
            .repartition(1)
            .persist()
        )
        codes.count()
        ivf = pq.ivfpq_topk_from_codes(
            codes, queries, coarse, pq_cents, k=5, nprobe=CE.IVFPQ_NPROBE
        )
        r = recall_of(ivf)
        ref = pq.ivfpq_refine_topk(
            emb, queries, coarse, pq_cents,
            k=5, nprobe=CE.IVFPQ_NPROBE, shortlist=CE.IVFPQ_SHORTLIST,
            codes=codes,
        )
        rr = recall_of(ref)
        results[f"ivfadc_m{m}_k{k}"] = {"recall5": r, "refined_recall5": rr}
        print(f"IVFADC m={m} k={k}: recall@5={r} +R={rr}", file=sys.stderr)
        codes.unpersist()

    out = "scale_probe_results.json"
    blob = {}
    if os.path.exists(out):
        blob = json.load(open(out))
    blob["round12_pq_fidelity"] = {"sf_dir": sf_dir, **results}
    with open(out, "w") as f:
        json.dump(blob, f, indent=1)
        f.write("\n")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
