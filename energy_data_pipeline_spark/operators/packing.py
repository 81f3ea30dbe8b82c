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
