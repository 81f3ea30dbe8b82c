"""Tokenized-silver materialization — the DISK form of the catalog's
pinned word-array frame (`plans/catalog_corpus._doc_words_silver`).

At 100 TB the silver zone is not a cache: it is a parquet table
between the raw bronze corpus and the statistics layer, maintained
incrementally as documents land — tokenize ONCE per document ever,
not once per snapshot per process. This job is that maintenance step:

- new documents anti-join against the silver table's doc_ids, so a
  redelivered batch (at-least-once ingest, crash replay) tokenizes
  nothing and converges to a no-op;
- the tokenization is the same ``functions.text.words`` expression the
  catalog uses (ONE definition of a token repo-wide);
- the append publishes through the manifest commit (one atomic pointer
  flip; a crash leaves the previous version live and only invisible
  orphans on disk).

A deployment that reads statistics from the silver table instead of
re-tokenizing bronze points the catalog's loader at this table; the
catalog's in-process pinned frame remains the oracle-checked local
form (same schema, same tokenizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup
from ..sinks import manifest_table

SILVER_COLUMNS = ("doc_id", "source", "lang", "wl")


def _tokenize(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "source", "lang", T.words("text").alias("wl")
    )


def tokenize_silver_job(
    spark: SparkSession,
    new_docs: DataFrame,
    table_path: str,
    compare_and_swap=None,
) -> dict:
    """Incrementally fold a document batch into the silver table.

    Returns {"arrived", "tokenized", "skipped", "version"}; replayed
    or overlapping batches skip already-tokenized doc_ids via the
    anti-join (idempotent), and batch-internal doc_id duplicates keep
    one row. The ONLY per-batch work is tokenizing the genuinely new
    documents — the silver table itself is never rewritten, only
    appended through one manifest pointer flip.

    The anti-join and the commit form ONE optimistic transaction: the
    append is pinned to the exact manifest the anti-join read
    (``expected_parent``), so two concurrent ingests of overlapping
    batches cannot both commit — the loser's CAS raises, the anti-join
    re-runs against the winner's table, and the doc_id uniqueness
    invariant (tokenize once EVER) holds under concurrency, not just
    under replay."""
    batch = new_docs.select("doc_id", "source", "lang", "text").dropDuplicates(
        ["doc_id"]
    )
    arrived = batch.count()
    attempts = 5
    for attempt in range(attempts):
        parent = manifest_table.read_manifest(table_path)
        if parent is not None:
            existing_ids = manifest_table.manifest_read(
                spark, table_path, version=parent["version"]
            ).select("doc_id")
            # semi-filtered anti-join (operators/dedup.py): the
            # committed id column is scanned column-pruned, never
            # shuffled, and the anti-join's build side is batch-bounded
            # — the plain left_anti shuffled + sorted the ENTIRE
            # committed id set on every micro-batch.
            fresh = dedup.anti_join_new_keys(batch, existing_ids, "doc_id")
        else:
            fresh = batch
        silver_rows = _tokenize(fresh)
        tokenized = silver_rows.count()
        if tokenized == 0:
            return {
                "arrived": arrived,
                "tokenized": 0,
                "skipped": arrived,
                "version": parent["version"] if parent else None,
            }
        try:
            m = manifest_table.manifest_append(
                silver_rows,
                table_path,
                compare_and_swap=compare_and_swap,
                expected_parent=parent,
            )
        except manifest_table.CommitConflictError:
            if attempt == attempts - 1:
                raise
            continue  # someone committed since the anti-join: re-derive
        return {
            "arrived": arrived,
            "tokenized": tokenized,
            "skipped": arrived - tokenized,
            "version": m["version"],
        }


def read_silver(spark: SparkSession, table_path: str) -> DataFrame:
    """Snapshot-isolated read of the published silver table
    (doc_id, source, lang, wl)."""
    return manifest_table.manifest_read(spark, table_path).select(
        *SILVER_COLUMNS
    )


BPE_SILVER_COLUMNS = ("doc_id", "source", "lang", "btoks")


def bpe_silver_job(
    spark: SparkSession,
    new_docs: DataFrame,
    table_path: str,
    merges_table: str,
    compare_and_swap=None,
) -> dict:
    """Incrementally fold a document batch into the BPE-token silver
    table (doc_id, source, lang, btoks) — the disk form of the
    catalog's pinned ``_doc_bpe_tokens`` frame, tokenized by the
    COMMITTED merge list (``jobs/bpe_model``), never by a per-batch
    retrain: the tokenizer is a frozen model artifact, exactly like
    the IVFADC append path's frozen quantizers.

    Same optimistic transaction as ``tokenize_silver_job``: doc_id
    anti-join against the parent the append is pinned to, so replays
    and concurrent overlapping ingests converge to one row per
    document EVER. Per-batch tokenization cost is BATCH-VOCAB-sized —
    the merge fold runs over the fresh batch's distinct words, and the
    per-document reassembly is one posexplode + broadcast segmentation
    join + order-preserving flatten (the ``_doc_bpe_tokens`` shape)."""
    from ..operators import bpe

    batch = new_docs.select(
        "doc_id", "source", "lang", "text"
    ).dropDuplicates(["doc_id"])
    arrived = batch.count()
    merges = None
    attempts = 5
    for attempt in range(attempts):
        parent = manifest_table.read_manifest(table_path)
        if parent is not None:
            existing_ids = manifest_table.manifest_read(
                spark, table_path, version=parent["version"]
            ).select("doc_id")
            # same semi-filtered anti-join as tokenize_silver_job
            fresh = dedup.anti_join_new_keys(batch, existing_ids, "doc_id")
        else:
            fresh = batch
        words = _tokenize(fresh)
        if merges is None:
            from .bpe_model import read_merges

            merges = read_merges(spark, merges_table)
        vocab = (
            words.select(F.explode("wl").alias("w")).distinct()
        )
        seg = bpe.apply_merges(vocab, merges).select("w", "syms")
        rows = (
            words.select(
                "doc_id",
                "source",
                "lang",
                F.posexplode("wl").alias("pos", "w"),
            )
            .join(F.broadcast(seg), "w")
            .groupBy("doc_id", "source", "lang")
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "syms"))
                        ),
                        lambda s: s["syms"],
                    )
                ).alias("btoks")
            )
            # zero-word docs still get a (empty-btoks) row: without it
            # they would re-arrive as "fresh" on every redelivery and
            # the tokenize-once-EVER accounting would never converge
            .unionByName(
                words.filter(F.size("wl") == 0).select(
                    "doc_id",
                    "source",
                    "lang",
                    F.array().cast("array<string>").alias("btoks"),
                )
            )
        )
        tokenized = rows.count()
        if tokenized == 0:
            return {
                "arrived": arrived,
                "tokenized": 0,
                "skipped": arrived,
                "version": parent["version"] if parent else None,
            }
        try:
            m = manifest_table.manifest_append(
                rows,
                table_path,
                compare_and_swap=compare_and_swap,
                expected_parent=parent,
            )
        except manifest_table.CommitConflictError:
            if attempt == attempts - 1:
                raise
            continue  # someone committed since the anti-join: re-derive
        return {
            "arrived": arrived,
            "tokenized": tokenized,
            "skipped": arrived - tokenized,
            "version": m["version"],
        }


def read_bpe_silver(spark: SparkSession, table_path: str) -> DataFrame:
    """Snapshot-isolated read of the published BPE-token silver table
    (doc_id, source, lang, btoks)."""
    return manifest_table.manifest_read(spark, table_path).select(
        *BPE_SILVER_COLUMNS
    )


def silver_maintenance_flow(
    spark: SparkSession,
    landing_glob: str,
    table_path: str,
    max_files: int = 8,
    keep_versions: int = 3,
):
    """The silver zone's maintenance tick as an orchestrated flow
    (jobs/orchestrate.Flow — the engine's Prefect-equivalent): ingest
    whatever landed → compact small files → vacuum trimmed history.
    Each step is independently idempotent (anti-join ingest, no-op
    compaction, reference-counted vacuum), so a crashed tick re-runs
    whole — the reference's cron-flow discipline applied to table
    maintenance."""
    from .orchestrate import Flow

    def ingest():
        docs = spark.read.parquet(landing_glob).select(
            "doc_id", "source", "lang", "text"
        )
        return tokenize_silver_job(spark, docs, table_path)

    def compact(ingest):
        return manifest_table.manifest_compact(
            spark, table_path, max_files=max_files
        )

    def vacuum(compact):
        return manifest_table.vacuum(table_path, keep_versions=keep_versions)

    flow = Flow("silver-maintenance")
    flow.task("ingest", retries=1)(ingest)
    flow.task("compact", depends_on=["ingest"])(compact)
    flow.task("vacuum", depends_on=["compact"])(vacuum)
    return flow
