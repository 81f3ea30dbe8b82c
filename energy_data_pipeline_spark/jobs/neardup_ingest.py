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
near-dups). The append of corpus+index rows for ADMITTED docs is the
one non-atomic step; for a manifest-committed variant, route both
writes through sinks/manifest_table in one staged commit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import neardup
from ..operators.components import connected_components

NEAR_DUP_THRESHOLD = 0.5


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
    n_arrived = batch_df.count()

    # in-batch near-dup clusters: keeper = min doc_id per component
    batch_pairs = neardup.minhash_lsh_near_dups(
        batch_df, "doc_id", "text", threshold=threshold, n=3
    )
    batch_losers = (
        connected_components(batch_pairs, "id1", "id2")
        .filter(F.col("vertex") != F.col("cluster_id"))
        .select(F.col("vertex").alias("doc_id"))
    )
    batch_keep = batch_df.join(batch_losers, "doc_id", "left_anti")

    corpus_exists = os.path.exists(corpus_path)
    if corpus_exists:
        index = spark.read.parquet(index_path)
        corpus = spark.read.parquet(corpus_path)
        hits = neardup.probe_index_near_dups(
            batch_keep, index, corpus, "doc_id", "text", threshold=threshold
        )
        rejected = hits.select(
            F.col("batch_id").alias("doc_id")
        ).distinct()
        admit = batch_keep.join(rejected, "doc_id", "left_anti")
    else:
        admit = batch_keep

    # one pass over the admitted set serves both appends; count it once
    admit = admit.persist()
    try:
        n_admitted = admit.count()
        n_in_batch = n_arrived - batch_keep.count()
        if n_admitted:
            admit.write.mode("append").parquet(corpus_path)
            neardup.band_signature_table(admit, "doc_id", "text").write.mode(
                "append"
            ).parquet(index_path)
        n_vs_corpus = n_arrived - n_in_batch - n_admitted
        return {
            "arrived": n_arrived,
            "dup_in_batch": n_in_batch,
            "near_dup_of_corpus": n_vs_corpus,
            "admitted": n_admitted,
        }
    finally:
        admit.unpersist()
