"""Sequence packing — the concat-and-chunk plan a pretraining data
loader needs: the token stream of each shard is concatenated in a
deterministic document order and cut into fixed-length training
sequences; every document gets the (sequence, offset) where its tokens
begin.

This is the "document packing" step between a cleaned corpus and a
trainer (GPT-style pipelines concatenate docs with an EOS separator and
chunk into seq_len blocks; see e.g. the dataset preparation described in
Brown et al. 2020 §2.2 / The Pile appendix). The PLAN is what the
engine computes — pure metadata (doc → position), so the trainer's
reader can slice tokens without a second pass over the text.

Scale posture: the running token total is a window cumsum, which is
sequential per PARTITION KEY — so the pack shard, not the whole corpus,
is the unit of sequentiality. Shards are (source, lang, doc_id-range
bucket): the id-range bucket caps shard size at ``shard_docs``
documents regardless of corpus size, so parallelism grows with the
corpus while order inside a shard stays deterministic (contiguous
doc_id ranges — reproducible across engines and run-to-run, unlike any
partition-order-dependent packing). No UDFs, no collect; one window
over one shuffle by shard key.

Reference parity: the reference has no trainer feed; this extends the
LLM-corpus surface (SURVEY.md §6) like the dedup/sampling operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SEQ_LEN = 2048  # tokens per training sequence
SHARD_DOCS = 100_000  # docs per pack shard (bounds the sequential unit)


def sequence_pack_plan(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    shard_cols: Sequence[str],
    seq_len: int = SEQ_LEN,
    shard_docs: int = SHARD_DOCS,
) -> DataFrame:
    """Concat-and-chunk packing plan.

    Within each shard (``shard_cols`` + the id-range bucket), documents
    are laid out in ``id_col`` order on a conceptual token tape;
    ``seq_id`` / ``seq_offset`` locate each document's first token in
    the seq_len-chunked tape. Documents longer than ``seq_len`` simply
    span multiple sequences — concat-and-chunk splits documents at
    sequence boundaries by design (no bin-packing NP-hardness, zero
    padding waste except the final partial sequence per shard).

    Output: input columns + pack_shard, n_tokens, seq_id, seq_offset.
    """
    shard_list = list(shard_cols)
    bucket = F.floor(F.col(id_col) / F.lit(shard_docs)).alias("pack_shard")
    toks = df.select(
        *shard_list, F.col(id_col), bucket, token_count.alias("n_tokens")
    )
    w = (
        Window.partitionBy(*shard_list, "pack_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        *shard_list,
        id_col,
        "pack_shard",
        "n_tokens",
        F.floor(cum_before / F.lit(seq_len)).cast("long").alias("seq_id"),
        (cum_before % F.lit(seq_len)).cast("long").alias("seq_offset"),
    )


def packed_sequences(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    shard_cols: Sequence[str],
    seq_len: int = SEQ_LEN,
    shard_docs: int = SHARD_DOCS,
) -> DataFrame:
    """MATERIALIZE the training sequences the pack plan describes: each
    shard's token tape (documents concatenated in id order) cut into
    ``seq_len`` chunks, returned as one row per sequence with the
    packed token array — the actual trainer feed, not just offsets.

    Fully native: a document spanning sequence boundaries is split by
    explode(sequence(first_seq, last_seq)) + an array ``slice`` per
    touched sequence; per-sequence assembly is collect_list of
    (doc_id, piece) structs, ``array_sort``-ed (doc_id is unique, so
    the struct sort is a total order — deterministic regardless of
    partition arrival order) and flattened. Every sequence except the
    final one per shard is exactly ``seq_len`` tokens — asserted by
    tests and checkable from ``n_tokens``. Shuffle cost: the explode
    emits one row per (doc, touched sequence) — at most
    1 + n_tokens/seq_len rows per doc — and the assembly groups by
    (shard, seq_id): partition-parallel, no driver involvement.

    Output: shard_cols + pack_shard, seq_id, n_docs, n_tokens,
    tokens (array<string>).
    """
    shard_list = list(shard_cols)
    L = F.lit(seq_len)
    base = df.select(
        *shard_list,
        F.col(id_col).alias("_id"),
        F.floor(F.col(id_col) / F.lit(shard_docs)).alias("pack_shard"),
        tokens.alias("_toks"),
    ).withColumn("_n", F.size("_toks")).filter(F.col("_n") > 0)
    w = (
        Window.partitionBy(*shard_list, "pack_shard")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long")
    spans = (
        base.withColumn("_c", cum)
        .withColumn(
            "seq_id",
            # floor() already yields LONG, so the exploded element is
            # the right type (a cast cannot wrap a generator anyway)
            F.explode(
                F.sequence(
                    F.floor(F.col("_c") / L),
                    F.floor((F.col("_c") + F.col("_n") - 1) / L),
                )
            ),
        )
        .withColumn(
            "_start", F.greatest(F.lit(0), F.col("seq_id") * L - F.col("_c"))
        )
        .withColumn(
            "_end",
            F.least(F.col("_n"), (F.col("seq_id") + 1) * L - F.col("_c")),
        )
        .withColumn(
            "_piece",
            F.slice(
                "_toks",
                (F.col("_start") + 1).cast("int"),
                (F.col("_end") - F.col("_start")).cast("int"),
            ),
        )
    )
    assembled = F.flatten(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("_id").alias("i"), F.col("_piece").alias("p"))
                )
            ),
            lambda s: s["p"],
        )
    )
    return (
        spans.groupBy(*shard_list, "pack_shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            assembled.alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("bigint"))
        .select(*shard_list, "pack_shard", "seq_id", "n_docs", "n_tokens", "tokens")
    )
