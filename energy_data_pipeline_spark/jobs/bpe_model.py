"""Committed BPE tokenizer model — the DISK form of the catalog's
memoized merge list (`plans/catalog_corpus._bpe_segmented_vocab`).

A production pipeline does not retrain its tokenizer per process: the
merge list is trained once per corpus snapshot and PUBLISHED, and every
downstream tokenization (packing, silver maintenance, serving) applies
the committed merges. This module is that publish/consume seam:

- ``train_and_commit_merges`` trains with the engine's deterministic
  trainer (operators/bpe.bpe_train) and publishes the ordered
  (rank, a, b) merge table through the manifest commit — one atomic
  pointer flip, versioned like any other model artifact, so a crash
  leaves the previous tokenizer live and a re-train on identical data
  publishes an identical (if redundant) version.
- ``read_merges`` loads the committed list in training order (rank).
- ``tokenize_with_committed_merges`` is the inference half: the
  operators/bpe.apply_merges fold driven by the COMMITTED model, which
  is how tokenizer -> packing -> token-budget becomes one reproducible
  lineage across processes (the catalog's in-process memoized model is
  the same computation, proven equivalent by test).

Reference parity: the reference pins its processing constants in
config and republishes derived tables through Postgres
(SURVEY.md §3.2's bronze->silver->serving chain); this is that
discipline applied to a trained tokenizer artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import bpe
from ..sinks import manifest_table

MERGES_COLUMNS = ("rank", "a", "b")


def train_and_commit_merges(
    spark: SparkSession,
    vocab: DataFrame,
    table_path: str,
    n_merges: int,
    word_col: str = "w",
    freq_col: str = "freq",
    compare_and_swap=None,
) -> dict:
    """Train ``n_merges`` BPE merges over a (word, freq) vocabulary and
    publish the ordered merge list as a manifest-committed table.
    Returns {"n_merges", "version"}. Deterministic end to end: same
    vocabulary -> same merges -> byte-identical table content (only the
    version/manifest name differ on republish)."""
    merges, _final = bpe.bpe_train(
        vocab, n_merges, word_col=word_col, freq_col=freq_col
    )
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    df = spark.createDataFrame(rows, "rank INT, a STRING, b STRING")
    m = manifest_table.manifest_overwrite(
        df, table_path, compare_and_swap=compare_and_swap
    )
    return {"n_merges": len(merges), "version": m["version"]}


def read_merges(
    spark: SparkSession, table_path: str
) -> list[tuple[str, str]]:
    """The committed merge list in training order."""
    rows = (
        manifest_table.manifest_read(spark, table_path)
        .orderBy("rank")
        .collect()
    )
    return [(r["a"], r["b"]) for r in rows]


def tokenize_with_committed_merges(
    spark: SparkSession,
    vocab: DataFrame,
    merges_table: str,
    word_col: str = "w",
) -> DataFrame:
    """Apply the COMMITTED tokenizer to a (word, ...) frame — the
    inference path every downstream consumer shares. Output carries the
    input columns plus ``syms`` (the symbol array)."""
    return bpe.apply_merges(
        vocab, read_merges(spark, merges_table), word_col=word_col
    )
