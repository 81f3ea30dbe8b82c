"""Vectorized within-group pair scoring (guide §4.2, §8).

The quadratic within-bucket stages (SemDeDup cells, LSH buckets) used to
run an interpreted ``zip_with``/``aggregate`` fold PER CANDIDATE PAIR:
Catalyst higher-order functions do not participate in whole-stage
codegen, so every pair paid ~dim lambda dispatches inside the join
projection, and every vector crossed the join once per partner
(group-size × its own bytes). This module replaces that with the
guide-§8 shape: each row crosses into the Python worker ONCE per group
(``groupBy(key).applyInArrow``), and the pairwise math runs as
vectorized numpy over the whole group.

Oracle contract — bit-identical to the JVM fold
-----------------------------------------------
The catalog's value-hash oracle is sensitive to float summation ORDER.
``F.aggregate(zip_with(a, b, x*y), 0.0, acc+x)`` is a strictly
left-associated IEEE-754 double fold; numpy's ``sum``/``dot`` are
pairwise/SIMD-blocked and round differently in the last ulp. So the
kernels here NEVER use ``np.sum``/``np.dot`` across the vector
dimension: ``_seq_fold_sum`` accumulates one dimension at a time into a
float64 accumulator vector (``acc += P[:, j]``), which performs, per
pair, the exact op sequence ``((0.0 + p0) + p1) + ...`` of the Spark
fold — the SAME doubles in the SAME order through the SAME IEEE adds,
hence bit-identical results (pinned by tests/test_pairwise_kernel.py
against the expression path on every cell of the test corpus).
``_rnd_np`` replicates functions/rounding.rnd (DuckDB half-away-from-
zero on the binary value) with the same IEEE op sequence.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..shipping import ensure_worker_imports


def _seq_fold_sum(prod: np.ndarray) -> np.ndarray:
    """Row-wise sum of ``prod`` (n_pairs × dim, float64) as a strictly
    left-associated fold with init 0.0 — bit-identical to
    ``F.aggregate(arr, lit(0.0), acc + x)`` per row. 64 vectorized adds
    instead of per-pair interpreted lambdas; NOT np.sum (pairwise
    summation reorders the adds)."""
    acc = np.zeros(prod.shape[0], dtype=np.float64)
    for j in range(prod.shape[1]):
        acc += prod[:, j]
    return acc


def _rnd_np(c: np.ndarray, k: int) -> np.ndarray:
    """functions/rounding.rnd replicated in numpy: DuckDB
    round-half-away-from-zero on the binary double, same IEEE op
    sequence (multiply, add 0.5, floor, divide), same 2^63 saturation
    guard. np.floor(float64) equals Spark's FLOOR→BIGINT→double here:
    every |x·10^k| < 2^63 integral double round-trips the long cast
    exactly."""
    p = float(10**k)
    pos = np.floor(c * p + 0.5) / p
    neg = -(np.floor((-c) * p + 0.5) / p)
    rounded = np.where(c >= 0.0, pos, neg)
    return np.where(np.abs(c) * p >= float(2**63), c, rounded)


def _matrix(col, n_rows: int) -> np.ndarray:
    """(n_rows × dim) float64 matrix from an Arrow list<float|double>
    column — zero row-wise Python looping: one flatten over the value
    buffer, one reshape (requires fixed-dim vectors, asserted), one
    exact float32→float64 upcast (matches the fold's per-element
    ``cast("double")``)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        raise ValueError("pairwise kernel: null vector in group")
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if n_rows == 0:
        return flat.reshape(0, 0).astype(np.float64)
    if flat.size % n_rows:
        raise ValueError("pairwise kernel: ragged vector column")
    return flat.reshape(n_rows, flat.size // n_rows).astype(np.float64)


# pair-block size: bounds peak kernel memory at ~PAIR_BLOCK × dim × 8B
# (×3 operands) regardless of group size — 2M pairs × 64 dims ≈ 1 GB
# transient per task at the default; scale-independent because blocks
# stream.
PAIR_BLOCK = 2_000_000


def _pair_cosines(V: np.ndarray, norms: np.ndarray, ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """cosine(V[i], V[j]) for each pair, computed as the bit-exact
    sequential dot fold divided by the PRECOMPUTED norms — the numpy
    twin of functions/vectors.cosine_from_norms."""
    dots = _seq_fold_sum(V[ii] * V[jj])
    return dots / (norms[ii] * norms[jj])


def semdedup_loser_ids(assigned: DataFrame, eps: float) -> DataFrame:
    """SemDeDup loser set: for every within-cell pair (id1 < id2) with
    ``rnd(cosine, 6) >= eps``, the higher id. Replaces the cell
    self-join + per-pair interpreted cosine fold with one
    ``groupBy(cell).applyInArrow`` pass: each pinned row crosses the
    boundary once, pairs are enumerated and scored in numpy
    (bit-identical fold — module docstring), and only loser ids come
    back. ``assigned`` must carry (vec_id, _v, _n, cell) with _n the
    precomputed L2 norm."""
    import pyarrow as pa

    def losers(table: pa.Table) -> pa.Table:
        n = table.num_rows
        out_type = pa.int64()
        if n < 2:
            return pa.table({"vec_id": pa.array([], type=out_type)})
        ids = table.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = _matrix(table.column("_v"), n)[order]
        norms = table.column("_n").to_numpy(zero_copy_only=False)[order]
        ii, jj = np.triu_indices(n, 1)
        loser_parts = []
        for s in range(0, ii.size, PAIR_BLOCK):
            ib, jb = ii[s : s + PAIR_BLOCK], jj[s : s + PAIR_BLOCK]
            cos = _pair_cosines(V, norms, ib, jb)
            hit = _rnd_np(cos, 6) >= eps
            if hit.any():
                loser_parts.append(jb[hit])
        if not loser_parts:
            return pa.table({"vec_id": pa.array([], type=out_type)})
        out = np.unique(ids[np.concatenate(loser_parts)])
        return pa.table({"vec_id": pa.array(out, type=out_type)})

    ensure_worker_imports(assigned.sparkSession)
    return (
        assigned.select("vec_id", "_v", "_n", "cell")
        .groupBy("cell")
        .applyInArrow(losers, schema="vec_id bigint")
    )


def bucket_cosine_pairs(
    bucketed: DataFrame,
    bucket_col: str,
    threshold: float,
) -> DataFrame:
    """(id1, id2, cosine_sim) for every within-bucket pair with
    ``rnd(cosine, 6) >= threshold`` — the vectorized twin of the LSH
    bucket self-join in similarity.cosine_near_dup_pairs. ``bucketed``
    must carry (_id, _v, _n, <bucket_col>). cosine_sim is returned
    ALREADY rounded to 6 (the bit-exact ``_rnd_np``), matching
    ``rnd(cosine_from_norms(...), 6)``."""
    import pyarrow as pa

    def pairs(table: pa.Table) -> pa.Table:
        n = table.num_rows
        empty = {
            "id1": pa.array([], type=pa.int64()),
            "id2": pa.array([], type=pa.int64()),
            "cosine_sim": pa.array([], type=pa.float64()),
        }
        if n < 2:
            return pa.table(empty)
        ids = table.column("_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = _matrix(table.column("_v"), n)[order]
        norms = table.column("_n").to_numpy(zero_copy_only=False)[order]
        ii, jj = np.triu_indices(n, 1)
        id1s, id2s, sims = [], [], []
        for s in range(0, ii.size, PAIR_BLOCK):
            ib, jb = ii[s : s + PAIR_BLOCK], jj[s : s + PAIR_BLOCK]
            sim = _rnd_np(_pair_cosines(V, norms, ib, jb), 6)
            hit = sim >= threshold
            if hit.any():
                id1s.append(ids[ib[hit]])
                id2s.append(ids[jb[hit]])
                sims.append(sim[hit])
        if not id1s:
            return pa.table(empty)
        return pa.table(
            {
                "id1": pa.array(np.concatenate(id1s), type=pa.int64()),
                "id2": pa.array(np.concatenate(id2s), type=pa.int64()),
                "cosine_sim": pa.array(np.concatenate(sims), type=pa.float64()),
            }
        )

    ensure_worker_imports(bucketed.sparkSession)
    return (
        bucketed.select("_id", "_v", "_n", bucket_col)
        .groupBy(bucket_col)
        .applyInArrow(pairs, schema="id1 bigint, id2 bigint, cosine_sim double")
    )
