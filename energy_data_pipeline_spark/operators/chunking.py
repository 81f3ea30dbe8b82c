"""Document chunking — fixed-size overlapping character windows, the
preprocessing step every embedding/RAG/context-packing pipeline runs
before a long document can be embedded or packed.

Not present in the reference (its documents are time-series rows); this
is part of the LLM-corpus surface the engine adds on top of the
reference's operator set.

Scale design: chunking is a NARROW transformation — one projection
computes the chunk count from the text length, one ``explode(sequence)``
fans each document out to its chunk indices, and substring/hash run
per-row inside whole-stage codegen. No shuffle, no UDF, no state: the
plan is scan -> project -> generate -> project at any corpus size, and
partition counts are inherited from the scan. (A pipeline that needs
approximately equal OUTPUT partition sizes afterwards can follow with
the pk_ sequence-packing operator, which shards explicitly.)

Chunk geometry: ``stride = chunk_size - overlap``; a document of length
L yields ``1`` chunk when ``L <= chunk_size`` else
``floor((L - chunk_size + stride - 1) / stride) + 1`` — i.e. every
character is covered, consecutive chunks share ``overlap`` characters,
and the final chunk may be shorter. All arithmetic is integral, so the
DuckDB oracle reproduces counts exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK_SIZE = 200
CHUNK_OVERLAP = 50


def n_chunks_expr(length: Column, chunk_size: int, stride: int) -> Column:
    """Chunk count for a text of ``length`` chars (integer arithmetic
    only — floor((L - cs + stride - 1) / stride) + 1, min 1)."""
    return (
        F.when(length <= chunk_size, F.lit(1).cast("long"))
        .otherwise(
            F.floor(
                (length - chunk_size + (stride - 1)) / F.lit(stride)
            ).cast("long")
            + 1
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Explode each document into overlapping character-window chunks.

    Output columns: ``<id_col>, chunk_idx, chunk_start, chunk_len,
    chunk_hash, n_chunks`` — the chunk CONTENT is carried as its md5
    (compact, and still proves byte-identical chunking cross-engine);
    callers that need the text itself can substring it back from the
    source row with (chunk_start, chunk_len).
    """
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_size ({chunk_size})"
        )
    stride = chunk_size - overlap
    text = F.col(text_col)
    base = df.select(
        id_col,
        text_col,
        n_chunks_expr(F.length(text), chunk_size, stride).alias("n_chunks"),
    )
    idx = F.col("chunk_idx")
    chunk = text.substr(
        (idx * stride + 1).cast("int"), F.lit(chunk_size).cast("int")
    )
    return base.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)
        ).alias("chunk_idx"),
        text_col,
        "n_chunks",
    ).select(
        id_col,
        "chunk_idx",
        (idx * stride).cast("long").alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_hash"),
        "n_chunks",
    )
