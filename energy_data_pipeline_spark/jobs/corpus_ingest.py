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
- The against-corpus check is a shuffled ``left_anti`` on the
  fingerprint hash — the corpus side is read fingerprint-column-only
  (column pruning at the scan) and is NEVER broadcast: the admitted
  corpus is the big side by definition.
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
    n_arrived = batch_df.count()

    passed = batch_df.filter(T.quality_keep("text"))
    n_passed = passed.count()

    fp = passed.withColumn("fp", T.fingerprint("text"))
    in_batch = dedup_keep_first(fp, keys=["fp"], order_col="doc_id")
    n_unique = in_batch.count()

    existing = _existing_fingerprints(spark, corpus_path)
    fresh = (
        in_batch.join(existing, "fp", "left_anti")
        if existing is not None
        else in_batch
    )
    admitted = fresh.select(
        "doc_id", "source", "lang", "text", "fp", F.lit(batch_id).alias("batch_id")
    )
    n_admitted = admitted.count()
    if n_admitted:
        append(admitted, corpus_path)
    return {
        "arrived": n_arrived,
        "failed_quality": n_arrived - n_passed,
        "dup_in_batch": n_passed - n_unique,
        "dup_in_corpus": n_unique - n_admitted,
        "admitted": n_admitted,
    }


def _existing_fingerprints(spark: SparkSession, corpus_path: str) -> DataFrame | None:
    """Fingerprint column of the admitted corpus, or None on first run.
    Column-pruned scan: only ``fp`` is read, not the document text."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(corpus_path).select("fp").distinct()
    except AnalysisException:  # PATH_NOT_FOUND on the very first batch
        return None
