"""Growth probes for the round-10 session-2 queries (appends under
"round10b_vocab_overlap" in scale_probe_results.json).

Runs the REAL catalog plans (txt_vocab_growth, dd_source_overlap_matrix)
against synthetic documents parquet dirs at 100k vs 1M docs x 20
sources, with cross-source exact duplicates injected (every 40th doc
shares its text with a doc in another source) so the overlap join has
signal.

Expectations:
- vocab_growth   ~scan-linear: one token-keyed groupBy of (bucket,
  token) pairs; the decile bounds are a 1-row broadcast and the only
  window covers 10 rows.
- source_overlap ~scan-linear: distinct (source, fp) collapses the
  corpus before the fp-keyed self-join, and per-fp pair fan-out is
  bounded by |sources|^2.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from energy_data_pipeline_spark.plans import plan_cache  # noqa: E402
from energy_data_pipeline_spark.plans.catalog_corpus import (  # noqa: E402
    source_overlap_matrix,
    vocab_growth,
)
from scale_probe import timed  # noqa: E402

N_SOURCES = 20


def build_docs_dir(spark: SparkSession, n: int) -> str:
    """Synthetic documents.parquet: 400-word vocab, 40-word docs, a
    source column, and every 40th doc a byte-exact copy of the doc 17
    ids earlier (different source with overwhelming probability)."""
    vocab = [f"w{i:03d}" for i in range(400)]
    varr = F.array(*[F.lit(w) for w in vocab])

    def text_of(idc):
        word_at = lambda j: F.element_at(  # noqa: E731
            varr, (F.pmod(F.xxhash64(idc, F.lit(j)), 400) + 1).cast("int")
        )
        return F.concat_ws(" ", *[word_at(j) for j in range(40)])

    base = F.when(
        (F.col("id") % 40 == 0) & (F.col("id") >= 17),
        F.col("id") - 17,
    ).otherwise(F.col("id"))
    docs = spark.range(0, n, 1, 64).select(
        F.col("id").alias("doc_id"),
        text_of(base).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("id", F.lit(3)), N_SOURCES)
        ).alias("source"),
        F.lit(40 * 5).cast("long").alias("n_chars"),
    )
    out = f"/tmp/probe_vocab_overlap_{n}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}
    for label, n in (("100k", 100_000), ("1M", 1_000_000)):
        d = build_docs_dir(spark, n)
        results[f"vocab_growth_{label}"] = timed(
            lambda: vocab_growth(spark, d).collect()
        )
        def overlap_cold():
            # source_overlap_matrix pins its (source, fp) frame via
            # plan_cache — clear per rep so every rep pays the full
            # scan/tokenize/DISTINCT, not just the post-cache self-join
            plan_cache.clear()
            source_overlap_matrix(spark, d).collect()

        results[f"source_overlap_{label}"] = timed(overlap_cold)
    summary = {
        "vocab_growth_10x": round(
            results["vocab_growth_1M"] / results["vocab_growth_100k"], 2
        ),
        "source_overlap_10x": round(
            results["source_overlap_1M"] / results["source_overlap_100k"], 2
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
    existing["round10b_vocab_overlap"] = {"raw": results, "summary": summary}
    json.dump(existing, open(out_path, "w"), indent=1)
    print(json.dumps({"raw": results, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
