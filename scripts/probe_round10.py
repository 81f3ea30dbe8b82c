"""Round-10 scale probes (same conventions as scale_probe.py; appends
results into scale_probe_results.json under "round10").

Probes:
- pareto_20x_users  — the a19 cumulative-share window over the USER
                      profile at 10k vs 200k users: the watch-item
                      single-partition ordered window. Flat-ish growth
                      = the entity-profile bound holds; superlinear =
                      switch to the bucketed prefix-sum plan.
- rfm_20x_users     — the NEW threshold-banded RFM (one
                      approx_percentile aggregate broadcast back, no
                      global sort) at 10k vs 200k users — should be
                      scan-bounded flat.
- bloom_1M          — bloom vs exact decontamination at 1M train docs
                      with the train bitmap PINNED (snapshot-derived
                      state): the crossover the toy-scale probe never
                      reached. Bitmap build is timed separately
                      (amortized, one-off) from the per-query probe
                      membership test.
- dsir_1M           — DSIR importance weights at 100k vs 1M docs.
- pq_lloyd_minibatch — Lloyd assign step at 1M vectors: full-batch
                      assign vs mini-batch (10%) per round — where the
                      index build's dominant term starts needing
                      mini-batching.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scale_probe import synth_docs, synth_events, timed  # noqa: E402


def synth_profile(spark, n_users: int):
    """Per-user (total) profile — what a19/a14 window over."""
    return spark.range(0, n_users, 1, 64).select(
        F.col("id").alias("user_id"),
        (F.pmod(F.xxhash64("id"), 1_000_000) / 100.0).alias("total"),
    )


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

    # --- a19 Pareto cumulative share over the user profile ---
    for label, n in [("10k", 10_000), ("200k", 200_000)]:
        prof = synth_profile(spark, n)

        def pareto():
            w_ord = Window.orderBy(
                F.col("total").desc(), F.col("user_id")
            ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            w_all = Window.partitionBy()
            ranked = prof.select(
                F.row_number()
                .over(Window.orderBy(F.col("total").desc(), F.col("user_id")))
                .alias("rk"),
                F.sum("total").over(w_ord).alias("cum"),
                F.sum("total").over(w_all).alias("grand"),
                F.count(F.lit(1)).over(w_all).alias("n_users"),
            )
            pcts = F.explode(
                F.array(F.lit(50), F.lit(80), F.lit(90))
            ).alias("pct")
            noop(
                ranked.select("rk", "cum", "grand", "n_users", pcts)
                .filter(F.col("cum") >= F.col("grand") * F.col("pct") / 100.0)
                .groupBy("pct")
                .agg(F.min("rk").alias("n_users_needed"))
            )

        results[f"pareto_{label}"] = timed(pareto)

    # --- NEW banded RFM over synthetic events with scaled user count ---
    for label, n_ev, n_users in [
        ("10k_users", 600_000, 10_000),
        ("200k_users", 12_000_000, 200_000),
    ]:
        ev = (
            spark.range(0, n_ev, 1, 64)
            .select(
                F.timestamp_add(
                    "SECOND",
                    (F.col("id") * 7 % 5_184_000).cast("long"),
                    F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                ).alias("ts"),
                F.pmod(F.xxhash64("id"), n_users).alias("user_id"),
                F.lit("purchase").alias("event_type"),
                (F.pmod(F.xxhash64("id", F.lit(2)), 10_000) / 100.0).alias(
                    "value"
                ),
            )
        )

        def rfm():
            prof = ev.groupBy("user_id").agg(
                F.max(F.to_date("ts")).alias("last_day"),
                F.count(F.lit(1)).alias("frequency"),
                F.round(F.sum("value"), 4).alias("monetary"),
            )
            anchor = ev.agg(F.max(F.to_date("ts")).alias("anchor_day"))
            scored = prof.crossJoin(F.broadcast(anchor)).select(
                "user_id",
                F.datediff("anchor_day", "last_day").alias("recency_days"),
                "frequency",
                "monetary",
            )
            probs = [0.25, 0.5, 0.75]
            bands = scored.agg(
                F.percentile_approx("recency_days", probs, 1_000_000).alias(
                    "_rq"
                ),
                F.percentile_approx("frequency", probs, 1_000_000).alias(
                    "_fq"
                ),
                F.percentile_approx("monetary", probs, 1_000_000).alias(
                    "_mq"
                ),
            )
            b = scored.crossJoin(F.broadcast(bands)).select(
                "user_id",
                (
                    F.lit(1)
                    + (F.col("recency_days") > F.col("_rq")[0]).cast("long")
                    + (F.col("recency_days") > F.col("_rq")[1]).cast("long")
                    + (F.col("recency_days") > F.col("_rq")[2]).cast("long")
                ).alias("r_q"),
                (
                    F.lit(1)
                    + (F.col("frequency") < F.col("_fq")[2]).cast("long")
                    + (F.col("frequency") < F.col("_fq")[1]).cast("long")
                    + (F.col("frequency") < F.col("_fq")[0]).cast("long")
                ).alias("f_q"),
                (
                    F.lit(1)
                    + (F.col("monetary") < F.col("_mq")[2]).cast("long")
                    + (F.col("monetary") < F.col("_mq")[1]).cast("long")
                    + (F.col("monetary") < F.col("_mq")[0]).cast("long")
                ).alias("m_q"),
            )
            noop(b)

        results[f"rfm_banded_{label}"] = timed(rfm)

    # --- bloom vs exact decontamination at 1M train docs ---
    from energy_data_pipeline_spark.operators import bloom as B

    train = synth_docs(spark, 1_000_000)
    probe = synth_docs(spark, 20_000).select(
        F.col("doc_id"), F.col("text")
    )
    from energy_data_pipeline_spark.functions import text as T

    def exact_decon():
        tgrams = train.select(
            F.explode(T.shingles(F.col("text"), 8)).alias("g")
        ).distinct()
        pgrams = probe.select(
            "doc_id", F.explode(T.shingles(F.col("text"), 8)).alias("g")
        )
        noop(
            pgrams.join(tgrams, "g", "left_semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_contaminated"))
        )

    results["decon_exact_1M"] = timed(exact_decon)

    # bitmap build timed once (snapshot-derived, pinned in real use)
    import time as _time

    t0 = _time.perf_counter()
    bitmap = B.build_bitmap(
        train.select(F.explode(T.shingles(F.col("text"), 8)).alias("g")), "g"
    )
    results["bloom_build_1M"] = round(_time.perf_counter() - t0, 2)

    def bloom_decon():
        pgrams = probe.select(
            "doc_id", F.explode(T.shingles(F.col("text"), 8)).alias("g")
        )
        noop(
            B.might_contain(pgrams, "g", bitmap)
            .filter(F.col("_bloom_hit"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_contaminated"))
        )

    results["decon_bloom_query_1M"] = timed(bloom_decon)

    # --- DSIR weights at 1M docs (same shape as scale_probe.py) ---
    from energy_data_pipeline_spark.functions.text import (
        shingles_from_words as _sfw,
    )
    from energy_data_pipeline_spark.functions.text import words as _words

    def dsir_shape(docs_df):
        wl = _words(F.col("text"))
        feats = F.concat(wl, _sfw(wl, 2))
        bkt = F.conv(F.substring(F.md5(F.col("f")), 1, 8), 16, 10).cast(
            "long"
        ) % F.lit(4096)
        per_doc = (
            docs_df.withColumn(
                "source", (F.col("doc_id") % 20).cast("string")
            )
            .select("doc_id", "source", F.explode(feats).alias("f"))
            .select("doc_id", "source", bkt.alias("b"))
            .groupBy("doc_id", "source", "b")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        raw = per_doc.groupBy("b").agg(F.sum("n").alias("c_r"))
        tgt = (
            per_doc.filter(F.col("source") == "0")
            .groupBy("b")
            .agg(F.sum("n").alias("c_t"))
        )
        totals = raw.agg(F.sum("c_r").alias("_nr")).crossJoin(
            tgt.agg(F.sum("c_t").alias("_nt"))
        )
        weight = (
            raw.join(tgt, "b", "left")
            .crossJoin(F.broadcast(totals))
            .select(
                "b",
                (
                    F.log(
                        (F.coalesce("c_t", F.lit(0)) + 1)
                        / (F.col("_nt") + 4096)
                    )
                    - F.log((F.col("c_r") + 1) / (F.col("_nr") + 4096))
                ).alias("w"),
            )
        )
        return (
            per_doc.join(F.broadcast(weight), "b")
            .groupBy("doc_id")
            .agg((F.sum(F.col("n") * F.col("w")) / F.sum("n")).alias("s"))
        )

    for label, n in [("100k", 100_000), ("1M", 1_000_000)]:
        docs = synth_docs(spark, n)
        results[f"dsir_{label}"] = timed(lambda d=docs: noop(dsir_shape(d)))

    # --- PQ/Lloyd assign at 1M vectors: full vs mini-batch round ---
    dim = 16
    vecs = spark.range(0, 1_000_000, 1, 64).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.xxhash64("id", F.lit(j)), 1000) / 500.0 - 1.0)
                for j in range(dim)
            ]
        ).alias("emb"),
    )
    k = 64
    cents = vecs.limit(k).collect()
    cent_arr = F.array(
        *[
            F.array(*[F.lit(float(r["emb"][j])) for j in range(dim)])
            for r in cents
        ]
    )

    def assign(df):
        dist = F.transform(
            cent_arr,
            lambda c: F.aggregate(
                F.zip_with("emb", c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        noop(
            df.select(
                "vec_id", F.array_position(dist, F.array_min(dist)).alias("c")
            )
        )

    results["lloyd_assign_full_1M"] = timed(lambda: assign(vecs))
    mini = vecs.filter(F.pmod(F.xxhash64("vec_id"), 10) == 0)
    results["lloyd_assign_mini10pct_1M"] = timed(lambda: assign(mini))

    summary = {
        "pareto_20x_users": round(
            results["pareto_200k"] / results["pareto_10k"], 2
        ),
        "rfm_banded_20x_users": round(
            results["rfm_banded_200k_users"] / results["rfm_banded_10k_users"],
            2,
        ),
        "bloom_query_vs_exact_1M": round(
            results["decon_bloom_query_1M"] / results["decon_exact_1M"], 2
        ),
        "dsir_10x_docs": round(results["dsir_1M"] / results["dsir_100k"], 2),
        "lloyd_mini_vs_full_1M": round(
            results["lloyd_assign_mini10pct_1M"]
            / results["lloyd_assign_full_1M"],
            2,
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
    existing["round10"] = {"raw": results, "summary": summary}
    json.dump(existing, open(out_path, "w"), indent=1)
    print(json.dumps({"raw": results, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
