"""PQ vector-index lifecycle as manifest-committed jobs.

The catalog's ``emb_pq_codes`` / ``ann_pq_adc_topk`` verify the PQ
math; this module is the OPERATIONAL surface a vector store runs:

- ``pq_index_build``: train the codebooks on a corpus snapshot and
  publish codebook + codes as ONE commit group (two sub-tables, one
  pointer flip — a crash stages orphans, never a codes table whose
  codebook is missing or mismatched).
- ``pq_index_append``: assign NEW vectors with the COMMITTED codebook
  (no retrain — the standard grow path; codes stay comparable because
  the quantizer is frozen) and append them in one group commit.
- ``pq_index_topk``: ADC search served entirely from the committed
  index — the plan reads codes + a collected codebook; the corpus's
  raw vectors are not touched, which is the point of the index at
  100 TB (gigabytes of codes for terabytes of vectors).

Same atomicity machinery as the near-dup ingest
(``sinks/manifest_table.group_*``): snapshot-isolated reads, versioned
manifests, vacuum for orphans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import pq
from ..sinks import manifest_table

CODEBOOK_SUB = "codebook"
CODES_SUB = "codes"


def _codebook_frame(
    spark: SparkSession, cents: list[list[list[float]]]
) -> DataFrame:
    rows = [
        (mi, ci, cents[mi][ci])
        for mi in range(len(cents))
        for ci in range(len(cents[mi]))
    ]
    return spark.createDataFrame(
        rows, "m int, cid int, centroid array<double>"
    )


def _codebook_from_frame(df: DataFrame) -> list[list[list[float]]]:
    rows = df.collect()  # M*K rows — codebook-sized, never corpus-sized
    by_key = {(r["m"], r["cid"]): [float(x) for x in r["centroid"]] for r in rows}
    m = 1 + max(k[0] for k in by_key)
    k = 1 + max(k[1] for k in by_key)
    return [[by_key[(mi, ci)] for ci in range(k)] for mi in range(m)]


def pq_index_build(
    spark: SparkSession,
    vectors: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> dict:
    """Train on the snapshot and publish (codebook, codes) atomically.
    Overwrites any previous index version (retrain = new epoch; old
    versions stay readable until vacuumed). ``sample_fraction``
    mini-batches the Lloyd training rounds (deterministic hash
    subsets) — the ≥1M-vector scale path; the published codes always
    come from one exact full-corpus assign."""
    cents = pq.pq_train(
        vectors, id_col, vec_col, sample_fraction=sample_fraction
    )
    codes = pq.pq_assign(vectors, cents, id_col, vec_col)
    manifest = manifest_table.group_overwrite(
        {CODEBOOK_SUB: _codebook_frame(spark, cents), CODES_SUB: codes},
        root,
    )
    return {
        "version": manifest["version"],
        "m": len(cents),
        "k": len(cents[0]),
    }


def pq_index_append(
    spark: SparkSession,
    new_vectors: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Assign new vectors with the committed codebook and append their
    codes in one commit — no retrain, so existing codes stay valid and
    the append's cost is batch-sized.

    Idempotent under replay: ids already in the committed codes table
    are anti-joined out of the batch (a retried/overlapping append must
    NOT double a vector's code rows — duplicated codes would double its
    ADC distance terms and corrupt every ranking it appears in), and an
    all-duplicate batch commits nothing."""
    cb = manifest_table.group_read(spark, root, CODEBOOK_SUB)
    if cb is None:
        raise ValueError(f"pq_index_append: no committed index at {root}")
    cents = _codebook_from_frame(cb)
    fresh = new_vectors
    existing = manifest_table.group_read(spark, root, CODES_SUB)
    if existing is not None:
        from pyspark.sql import functions as F

        # semi-filtered anti-join (operators/dedup.py): the committed
        # id column is scanned column-pruned, never shuffled, and the
        # anti-join's build side is batch-bounded.
        from ..operators.dedup import anti_join_new_keys

        fresh = anti_join_new_keys(new_vectors, existing, id_col)
    codes = pq.pq_assign(fresh, cents, id_col, vec_col)
    n_new = codes.count()
    if n_new == 0:
        current = manifest_table.read_manifest(root)
        return {"version": current["version"], "appended": 0}
    manifest = manifest_table.group_append({CODES_SUB: codes}, root)
    return {"version": manifest["version"], "appended": n_new}


def pq_index_topk(
    spark: SparkSession,
    queries: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC top-k served from the committed index: collected codebook
    (M·K rows) + codes scan — raw corpus vectors never enter the plan."""
    cb = manifest_table.group_read(spark, root, CODEBOOK_SUB)
    codes = manifest_table.group_read(spark, root, CODES_SUB)
    if cb is None or codes is None:
        raise ValueError(f"pq_index_topk: no committed index at {root}")
    cents = _codebook_from_frame(cb)
    return pq.adc_topk_from_codes(codes, queries, cents, id_col, vec_col, k)


# --- IVFADC index lifecycle (coarse cells + residual PQ) ------------------
COARSE_SUB = "coarse"


def _coarse_frame(spark: SparkSession, coarse: list[list[float]]) -> DataFrame:
    rows = [(ci, c) for ci, c in enumerate(coarse)]
    return spark.createDataFrame(rows, "cid int, centroid array<double>")


def _coarse_from_frame(df: DataFrame) -> list[list[float]]:
    rows = df.collect()  # |cells| rows
    by_id = {r["cid"]: [float(x) for x in r["centroid"]] for r in rows}
    return [by_id[i] for i in range(len(by_id))]


def ivfpq_index_build(
    spark: SparkSession,
    vectors: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_k: int = 8,
    coarse_iters: int = 1,
) -> dict:
    """Train the IVFADC index (coarse quantizer + residual PQ) on the
    snapshot and publish (coarse, codebook, codes) as ONE commit group
    — three sub-tables, one pointer flip, so a reader can never see a
    codes table whose quantizers are missing or from another epoch.
    The codes table is ``ivfpq_assign_codes`` output: (id, cell,
    code0..codeM-1) — FAISS's inverted lists, flattened."""
    coarse, pq_cents = pq.ivfpq_train(
        vectors, id_col, vec_col,
        coarse_k=coarse_k, coarse_iters=coarse_iters,
    )
    codes = pq.ivfpq_assign_codes(vectors, coarse, pq_cents, id_col, vec_col)
    manifest = manifest_table.group_overwrite(
        {
            COARSE_SUB: _coarse_frame(spark, coarse),
            CODEBOOK_SUB: _codebook_frame(spark, pq_cents),
            CODES_SUB: codes,
        },
        root,
    )
    return {
        "version": manifest["version"],
        "cells": len(coarse),
        "m": len(pq_cents),
        "k": len(pq_cents[0]),
    }


def ivfpq_index_append(
    spark: SparkSession,
    new_vectors: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Assign new vectors with the COMMITTED quantizers (cell + residual
    codes) and append in one group commit — the frozen-quantizer grow
    path, idempotent under replay via the id anti-join (duplicated code
    rows would double a vector's ADC terms in every probed ranking)."""
    coarse_df = manifest_table.group_read(spark, root, COARSE_SUB)
    cb = manifest_table.group_read(spark, root, CODEBOOK_SUB)
    if coarse_df is None or cb is None:
        raise ValueError(f"ivfpq_index_append: no committed index at {root}")
    coarse = _coarse_from_frame(coarse_df)
    cents = _codebook_from_frame(cb)
    fresh = new_vectors
    existing = manifest_table.group_read(spark, root, CODES_SUB)
    if existing is not None:
        from pyspark.sql import functions as F

        # semi-filtered anti-join (operators/dedup.py): the committed
        # id column is scanned column-pruned, never shuffled, and the
        # anti-join's build side is batch-bounded.
        from ..operators.dedup import anti_join_new_keys

        fresh = anti_join_new_keys(new_vectors, existing, id_col)
    codes = pq.ivfpq_assign_codes(fresh, coarse, cents, id_col, vec_col)
    n_new = codes.count()
    if n_new == 0:
        current = manifest_table.read_manifest(root)
        return {"version": current["version"], "appended": 0}
    manifest = manifest_table.group_append({CODES_SUB: codes}, root)
    return {"version": manifest["version"], "appended": n_new}


def ivfpq_index_topk(
    spark: SparkSession,
    queries: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    refine_with: DataFrame | None = None,
    shortlist: int = 25,
) -> DataFrame:
    """IVFADC top-k served from the committed index: collected
    quantizers (|cells| + M·K rows) + a codes-only probed scan. Pass
    ``refine_with`` (the raw-vector table) to run the IVFADC+R exact
    re-rank over the shortlist — raw vectors are then read for
    |q|·shortlist rows only, the rest of the search never touches
    them."""
    coarse_df = manifest_table.group_read(spark, root, COARSE_SUB)
    cb = manifest_table.group_read(spark, root, CODEBOOK_SUB)
    codes = manifest_table.group_read(spark, root, CODES_SUB)
    if coarse_df is None or cb is None or codes is None:
        raise ValueError(f"ivfpq_index_topk: no committed index at {root}")
    coarse = _coarse_from_frame(coarse_df)
    cents = _codebook_from_frame(cb)
    if refine_with is not None:
        return pq.ivfpq_refine_topk(
            refine_with, queries, coarse, cents, id_col, vec_col,
            k=k, nprobe=nprobe, shortlist=shortlist, codes=codes,
        )
    return pq.ivfpq_topk_from_codes(
        codes, queries, coarse, cents, id_col, vec_col, k=k, nprobe=nprobe
    )
