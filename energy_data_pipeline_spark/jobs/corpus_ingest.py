"""Incremental corpus ingest — the end-to-end admission pipeline a
training corpus runs on every new crawl batch, composed from the
engine's training-data operators:

  quality gate (C4/Gopher-style keep/drop cascade, catalog_corpus
  thresholds) → exact-dedup WITHIN the batch (order-insensitive content
  fingerprint, keep lowest doc_id) → anti-join against the ALREADY
  ADMITTED corpus on the same fingerprint → append survivors with
  their fingerprint and admission batch id.

There is no reference twin (the reference ingests sensor rows, not
documents — initial_db_ingestion.py stops at per-key dedup); this is
the training-data surface composed end-to-end.

Scale posture:
- One scan of the batch; the quality gate is pure JVM expressions.
- In-batch dedup is a fingerprint groupBy (map-side combine), not a
  window over the whole corpus.
- The against-corpus check is a shuffled left join on the fingerprint
  hash carrying a dup flag (same shuffle shape as a left_anti, but the
  unique/admitted stats fall out of one aggregation) — the corpus side
  is read fingerprint-column-only (column pruning at the scan) and is
  NEVER broadcast: the admitted corpus is the big side by definition.
- Append is an atomic-per-batch parquet append; re-running a FAILED
  batch is safe (the anti-join removes anything the partial append
  admitted), making the job idempotent under retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.dedup import dedup_keep_first
from ..sinks.writers import append


def corpus_ingest_job(
    batch_df: DataFrame,
    corpus_path: str,
    batch_id: str,
) -> dict:
    """Admit one batch of documents into the corpus at ``corpus_path``.

    ``batch_df`` columns: doc_id (long), source, lang, text. Returns
    admission stats: arrived / failed_quality / dup_in_batch /
    dup_in_corpus / admitted.
    """
    spark = batch_df.sparkSession

    # One scan of the batch: the quality-gate regex cascade runs once and
    # is cached; arrived/passed come from a single aggregation instead of
    # two counts that would each re-run the gate from the source.
    gated = batch_df.withColumn("_q", T.quality_keep("text")).persist()
    try:
        row = gated.agg(
            F.count(F.lit(1)).alias("arrived"),
            F.sum(F.col("_q").cast("long")).alias("passed"),
        ).collect()[0]
        n_arrived = row["arrived"]
        n_passed = row["passed"] or 0

        fp = gated.filter("_q").withColumn("fp", T.fingerprint("text"))
        in_batch = dedup_keep_first(fp, keys=["fp"], order_col="doc_id")

        # Annotate against-corpus dups instead of anti-joining, so
        # unique/admitted fall out of ONE aggregation over ONE cached
        # lineage (fingerprint + dedup shuffle + corpus join computed
        # once); the admitted rows are then a cache-served filter. Same
        # shuffle shape as left_anti; the corpus side is still never
        # broadcast (left side of a left join can't be the build side).
        existing = _existing_fingerprints(spark, corpus_path)
        if existing is not None:
            # semi-join pre-filter (then broadcast): prune the corpus
            # fingerprint column to fps present in THIS batch before
            # the dup-annotate join, so the corpus side is only
            # SCANNED (column-pruned), never shuffled — the previous
            # shape's distinct + left join shuffled the entire corpus
            # fp set on every micro-batch. The annotate result is
            # identical: membership of a batch fp in T equals its
            # membership in T ∩ batch-fps.
            overlap = (
                existing.join(
                    F.broadcast(in_batch.select("fp")), "fp", "left_semi"
                )
                .distinct()
                .withColumn("_dup_corpus", F.lit(True))
            )
            annotated = in_batch.join(F.broadcast(overlap), "fp", "left")
        else:
            annotated = in_batch.withColumn("_dup_corpus", F.lit(None).cast("boolean"))
        annotated = annotated.persist()
        try:
            row = annotated.agg(
                F.count(F.lit(1)).alias("unique"),
                F.sum(
                    F.coalesce("_dup_corpus", F.lit(False)).cast("long")
                ).alias("dup_corpus"),
            ).collect()[0]
            n_unique = row["unique"]
            n_admitted = n_unique - (row["dup_corpus"] or 0)

            if n_admitted:
                admitted = annotated.filter(
                    ~F.coalesce("_dup_corpus", F.lit(False))
                ).select(
                    "doc_id",
                    "source",
                    "lang",
                    "text",
                    "fp",
                    F.lit(batch_id).alias("batch_id"),
                )
                append(admitted, corpus_path)
        finally:
            annotated.unpersist()
    finally:
        gated.unpersist()
    return {
        "arrived": n_arrived,
        "failed_quality": n_arrived - n_passed,
        "dup_in_batch": n_passed - n_unique,
        "dup_in_corpus": n_unique - n_admitted,
        "admitted": n_admitted,
    }


def _existing_fingerprints(spark: SparkSession, corpus_path: str) -> DataFrame | None:
    """Fingerprint column of the admitted corpus, or None on first run.
    Column-pruned scan: only ``fp`` is read, not the document text.
    NOT deduplicated here — the caller dedups AFTER its batch-bounded
    semi-filter, so the full corpus fp set is never shuffled."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(corpus_path).select("fp")
    except AnalysisException:  # PATH_NOT_FOUND on the very first batch
        return None


def crawl_to_silver_flow(
    spark: SparkSession,
    wet_glob: str,
    corpus_path: str,
    silver_path: str,
    batch_id: str,
):
    """The full crawl-to-statistics chain as ONE orchestrated flow
    (jobs/orchestrate.Flow): WET shard parse (sources/wet — the only
    Python kernel in the chain) → quality/dedup admission
    (``corpus_ingest_job``) → incremental tokenized-silver maintenance
    (``jobs/silver_tokenize``, doc_id anti-join = tokenize once EVER)
    → corpus statistics off the silver table. Every step is
    independently idempotent, so a crashed or double-run tick
    converges: re-parsing yields the same xxhash64 doc_ids, admission
    anti-joins them away, the silver job tokenizes nothing, and the
    stats re-read identical state.

    This is the engine's end-to-end answer to "point it at a crawl
    snapshot": at 100 TB the wet_glob lists a shard manifest
    (parallelism = file count, no shuffle in the parse), and each
    downstream stage is the same operator the catalog verifies
    value-by-value at gate scale."""
    from ..sources import wet as W
    from .orchestrate import Flow
    from .silver_tokenize import read_silver, tokenize_silver_job

    def parse():
        raw = spark.read.format("binaryFile").load(wet_glob)
        docs = W.wet_to_document_batch(W.wet_text_records(raw)).persist()
        # pinned: the Python record parse must run once, not once for
        # this count and again for the admission pass (batch-bounded)
        return {"parsed": docs.count(), "frame": docs}

    def _unpin(parse):
        parse["frame"].unpersist(blocking=False)

    def admit(parse):
        return corpus_ingest_job(parse["frame"], corpus_path, batch_id)

    def tokenize(admit):
        admitted = spark.read.parquet(corpus_path).select(
            "doc_id", "source", "lang", "text"
        )
        return tokenize_silver_job(spark, admitted, silver_path)

    def stats(tokenize):
        silver = read_silver(spark, silver_path)
        row = silver.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("wl")).alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
        ).collect()[0]
        vocab = (
            silver.select(F.explode("wl").alias("w")).distinct().count()
        )
        return {
            "n_docs": row["n_docs"],
            "n_tokens": int(row["n_tokens"] or 0),
            "n_langs": row["n_langs"],
            "vocab": vocab,
        }

    flow = Flow("crawl-to-silver")
    flow.task("parse", retries=1)(parse)
    flow.task("admit", depends_on=["parse"])(admit)
    flow.task("unpin", depends_on=["admit", "parse"])(_unpin)
    flow.task("tokenize", depends_on=["admit"])(tokenize)
    flow.task("stats", depends_on=["tokenize"])(stats)
    return flow
