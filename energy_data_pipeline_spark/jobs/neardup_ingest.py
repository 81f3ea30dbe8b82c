"""Incremental near-dup-aware corpus admission — the production ingest
path at 100 TB: the corpus is NEVER re-minhashed. A persisted LSH index
(operators/neardup.band_signature_table: one (doc, band) row with the
band's minhash tuple) is maintained alongside the corpus; each incoming
batch minhashes only itself, probes the index for corpus near-dups,
resolves its own in-batch near-dup clusters, and appends the admitted
documents plus THEIR band rows to the index. Per-ingest work is
O(batch) + the index equi-join — independent of corpus size except for
the probe join, which touches only matching band buckets.

Crash/retry safety: re-delivered documents are byte-identical to their
already-admitted copies, so they probe out at jaccard 1.0 and are
rejected — a replayed batch converges to a no-op (same admission
invariant as jobs/corpus_ingest's exact-fingerprint path, extended to
near-dups). Two write modes:

- Plain-parquet (``near_dup_ingest_job``): the INDEX rows are appended
  BEFORE the corpus rows, which makes every crash window self-healing:
  an index-only orphan (crash between the two appends) merely creates
  candidate probes that find no corpus row to verify against — the
  replayed batch re-admits, and the duplicate index rows it leaves are
  collapsed by the probe's candidate dedup. The REVERSE order would be
  unrecoverable: corpus rows invisible to the index re-admit forever as
  duplicate corpus rows. (Round-7 advice finding, fixed round 8.)
- Manifest-committed (``near_dup_ingest_job_atomic``): corpus + index
  live as sub-tables of one sinks/manifest_table commit GROUP; both
  appends publish with a single atomic pointer flip — both-or-neither,
  no orphan states at all, and readers are snapshot-isolated.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import neardup
from ..operators.components import connected_components
from ..sinks import manifest_table

NEAR_DUP_THRESHOLD = 0.5

CORPUS_SUB = "corpus"
INDEX_SUB = "band_index"


def _admission_counts(
    batch_df: DataFrame,
    index: DataFrame | None,
    corpus: DataFrame | None,
    threshold: float,
    pins: list,
) -> tuple[DataFrame, dict]:
    """Shared admission dataflow: reject in-batch near-dup losers, then
    probe the corpus index. Returns (persisted admitted frame, stats);
    the admitted frame's pin is registered in ``pins`` for release."""
    from pyspark.storagelevel import StorageLevel

    n_arrived = batch_df.count()

    # in-batch near-dup clusters: keeper = min doc_id per component
    batch_pairs = neardup.minhash_lsh_near_dups(
        batch_df, "doc_id", "text", threshold=threshold, n=3, pins_out=pins
    )
    batch_losers = (
        connected_components(batch_pairs, "id1", "id2")
        .filter(F.col("vertex") != F.col("cluster_id"))
        .select(F.col("vertex").alias("doc_id"))
    )
    batch_keep = batch_df.join(batch_losers, "doc_id", "left_anti")

    if corpus is not None and index is not None:
        hits = neardup.probe_index_near_dups(
            batch_keep,
            index,
            corpus,
            "doc_id",
            "text",
            threshold=threshold,
            pins_out=pins,
        )
        rejected = hits.select(F.col("batch_id").alias("doc_id")).distinct()
        admit = batch_keep.join(rejected, "doc_id", "left_anti")
    else:
        admit = batch_keep

    # one pass over the admitted set serves both appends; count it once
    admit = admit.persist(StorageLevel.MEMORY_AND_DISK)
    pins.append((admit, StorageLevel.MEMORY_AND_DISK))
    n_admitted = admit.count()
    n_in_batch = n_arrived - batch_keep.count()
    stats = {
        "arrived": n_arrived,
        "dup_in_batch": n_in_batch,
        "near_dup_of_corpus": n_arrived - n_in_batch - n_admitted,
        "admitted": n_admitted,
    }
    return admit, stats


def _release(pins: list) -> None:
    for frame, _level in pins:
        try:
            frame.unpersist(blocking=False)
        except Exception:
            pass


def near_dup_ingest_job(
    batch_df: DataFrame,
    corpus_path: str,
    index_path: str,
    threshold: float = NEAR_DUP_THRESHOLD,
) -> dict:
    """Admit ``batch_df`` (doc_id, text, + payload columns) into the
    corpus at ``corpus_path`` with near-dup rejection against both the
    batch itself and the indexed corpus. Returns admission stats:
    arrived / dup_in_batch / near_dup_of_corpus / admitted."""
    spark = batch_df.sparkSession
    pins: list = []
    corpus_exists = os.path.exists(corpus_path)
    index = spark.read.parquet(index_path) if corpus_exists else None
    corpus = spark.read.parquet(corpus_path) if corpus_exists else None
    try:
        admit, stats = _admission_counts(batch_df, index, corpus, threshold, pins)
        if stats["admitted"]:
            # INDEX FIRST (see module docstring): an index-only orphan
            # self-heals; a corpus-only orphan re-admits forever
            neardup.band_signature_table(admit, "doc_id", "text").write.mode(
                "append"
            ).parquet(index_path)
            admit.write.mode("append").parquet(corpus_path)
        return stats
    finally:
        _release(pins)


def compact_band_index_job(spark, group_root: str) -> dict:
    """Rewrite the band index dropping duplicate rows, in one atomic
    group commit. The self-healing replay path deliberately tolerates
    duplicate (doc, band) index rows (extra candidate probes, no wrong
    answers) — this job is the periodic hygiene pass that reclaims the
    probe cost: distinct over the full index, staged as a fresh file
    set, one pointer flip. Readers mid-probe keep their snapshot.
    Returns {rows_before, rows_after}."""
    index = manifest_table.group_read(spark, group_root, INDEX_SUB)
    if index is None:
        return {"rows_before": 0, "rows_after": 0}
    before = index.count()
    compacted = index.distinct()
    after = compacted.count()
    if after < before:
        manifest_table.group_overwrite({INDEX_SUB: compacted}, group_root)
    return {"rows_before": before, "rows_after": after}


def corpus_forget_job(spark, group_root: str, doc_ids: DataFrame) -> dict:
    """Atomic removal of documents from the corpus AND the band index —
    the retention / right-to-be-forgotten primitive a production corpus
    needs: both sub-tables lose the requested ids and publish under ONE
    pointer flip, so no reader or ingest probe ever sees a corpus doc
    whose index rows are gone (or vice versa).

    FILE-PRUNED: the rewrite goes through
    ``manifest_table.group_prune_rewrite`` — only the parquet files
    whose footer [min, max] doc_id range intersects the forget set are
    read and rewritten; every other file carries over into the new
    version untouched (same path, no read, no copy). At 100 TB that is
    the difference between rewriting the corpus and rewriting the
    handful of files the ids live in. The forget set is collected to
    the driver (retention requests are human-scale — ids, not
    predicates); the per-file anti-join stays a DataFrame op. Old
    versions still reference the forgotten rows until ``group_vacuum``
    trims history — run it after the commit when deletion must be
    physical. Returns {corpus_removed, index_removed, files_touched,
    files_carried}."""
    ids = {
        r["doc_id"] for r in doc_ids.select("doc_id").distinct().collect()
    }
    corpus = manifest_table.group_read(spark, group_root, CORPUS_SUB)
    index = manifest_table.group_read(spark, group_root, INDEX_SUB)
    if corpus is None or index is None or not ids:
        return {
            "corpus_removed": 0,
            "index_removed": 0,
            "files_touched": 0,
            "files_carried": 0,
        }
    c_before, i_before = corpus.count(), index.count()
    ids_df = spark.createDataFrame(
        [(i,) for i in sorted(ids)], "doc_id long"
    )

    def drop_ids(df: DataFrame) -> DataFrame:
        return df.join(ids_df, "doc_id", "left_anti")

    res = manifest_table.group_prune_rewrite(
        spark,
        group_root,
        {
            CORPUS_SUB: ("doc_id", drop_ids),
            INDEX_SUB: ("doc_id", drop_ids),
        },
        prune_values={CORPUS_SUB: ids, INDEX_SUB: ids},
    )
    c_after = manifest_table.group_read(spark, group_root, CORPUS_SUB).count()
    i_after = manifest_table.group_read(spark, group_root, INDEX_SUB).count()
    return {
        "corpus_removed": c_before - c_after,
        "index_removed": i_before - i_after,
        "files_touched": sum(res["touched"].values()),
        "files_carried": sum(res["carried"].values()),
    }


def near_dup_ingest_job_atomic(
    batch_df: DataFrame,
    group_root: str,
    threshold: float = NEAR_DUP_THRESHOLD,
) -> dict:
    """Same admission semantics as :func:`near_dup_ingest_job`, but the
    corpus and its band index are sub-tables of one manifest commit
    GROUP at ``group_root`` — the two appends publish with a single
    atomic pointer flip (sinks/manifest_table.group_append), so a crash
    at ANY point leaves either both appends visible or neither. This is
    the mode a deployment with concurrent readers should run."""
    spark = batch_df.sparkSession
    pins: list = []
    index = manifest_table.group_read(spark, group_root, INDEX_SUB)
    corpus = manifest_table.group_read(spark, group_root, CORPUS_SUB)
    try:
        admit, stats = _admission_counts(batch_df, index, corpus, threshold, pins)
        if stats["admitted"]:
            manifest_table.group_append(
                {
                    CORPUS_SUB: admit,
                    INDEX_SUB: neardup.band_signature_table(
                        admit, "doc_id", "text"
                    ),
                },
                group_root,
            )
        return stats
    finally:
        _release(pins)
