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


def semdedup_blocks(
    n_rows: int, n_cells: int, parallelism: int, min_pairs: int = 2_000_000
) -> int:
    """Block count for ``semdedup_loser_ids``: 1 (plain one-task-per-
    cell — no explode, no dedup shuffle) while the per-cell pair
    triangle is small enough that splitting it buys only task overhead
    (measured: blocks=4 on the 2k-vector bench corpus cost +0.45 s of
    pure overhead, while at 20k vectors it took the 32-core time from
    14.3 s to 6.8 s); otherwise enough blocks to spread cells across
    the session's cores. Data-derived (the caller passes the memoized
    corpus count) and session-derived — no local[32] constant."""
    rpc = max(1, n_rows // max(1, n_cells))
    if rpc * (rpc - 1) // 2 < min_pairs:
        return 1
    return max(1, min(8, -(-parallelism // max(1, n_cells))))


def semdedup_loser_ids(
    assigned: DataFrame,
    eps: float,
    blocks: int | None = None,
    n_cells: int = 8,
) -> DataFrame:
    """SemDeDup loser set: for every within-cell pair (id1 < id2) with
    ``rnd(cosine, 6) >= eps``, the higher id. Replaces the cell
    self-join + per-pair interpreted cosine fold with an
    ``applyInArrow`` pass: each pinned row crosses the boundary a
    bounded number of times, pairs are enumerated and scored in numpy
    (bit-identical fold — module docstring), and only loser ids come
    back. ``assigned`` must carry (vec_id, _v, _n, cell) with _n the
    precomputed L2 norm.

    Parallelism is NOT capped at the cell count: with k cells the
    quadratic pair work would otherwise run as k tasks (the round-13
    10x-data probe measured an 8-vs-32-core ratio of ~1.1 with
    N_CELLS=8 — cores 9..32 idle). Each cell's pair triangle is
    decomposed over hash buckets: row -> bucket b = xxhash64(id) mod B,
    task (cell, bi<=bj) holds buckets bi ∪ bj and enumerates exactly
    the pairs whose bucket pair is (bi, bj) — every i<j pair lands in
    exactly ONE task, per-pair math is orientation-independent
    (elementwise products commute bit-exactly), so the loser SET is
    identical for every B. B should come from ``semdedup_blocks``
    (size- and session-adaptive: 1 below the pair-count threshold
    where splitting only buys task overhead) at the cost of shipping
    each row B times — B(B+1)/2 tasks per cell."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    spark = assigned.sparkSession
    if blocks is None:
        blocks = 1

    def losers(table: pa.Table) -> pa.Table:
        n = table.num_rows
        out_type = pa.int64()
        empty = pa.table({"vec_id": pa.array([], type=out_type)})
        if n < 2:
            return empty
        ids = table.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = _matrix(table.column("_v"), n)[order]
        norms = table.column("_n").to_numpy(zero_copy_only=False)[order]
        bi = table.column("_bi")[0].as_py()
        bj = table.column("_bj")[0].as_py()
        if bi == bj:
            b = table.column("_b").to_numpy(zero_copy_only=False)[order]
            keep = b == bi
            ids, V, norms = ids[keep], V[keep], norms[keep]
            if ids.size < 2:
                return empty
            ii, jj = np.triu_indices(ids.size, 1)
            id_lo, id_hi = ids, ids
        else:
            b = table.column("_b").to_numpy(zero_copy_only=False)[order]
            mi, mj = b == bi, b == bj
            ni, nj = int(mi.sum()), int(mj.sum())
            if ni == 0 or nj == 0:
                return empty
            idx_i, idx_j = np.nonzero(mi)[0], np.nonzero(mj)[0]
            ii = np.repeat(idx_i, nj)
            jj = np.tile(idx_j, ni)
            id_lo = id_hi = ids
        loser_parts = []
        for s in range(0, ii.size, PAIR_BLOCK):
            ib, jb = ii[s : s + PAIR_BLOCK], jj[s : s + PAIR_BLOCK]
            cos = _pair_cosines(V, norms, ib, jb)
            hit = _rnd_np(cos, 6) >= eps
            if hit.any():
                loser_parts.append(
                    np.maximum(id_lo[ib[hit]], id_hi[jb[hit]])
                )
        if not loser_parts:
            return empty
        out = np.unique(np.concatenate(loser_parts))
        return pa.table({"vec_id": pa.array(out, type=out_type)})

    ensure_worker_imports(spark)
    b_col = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(blocks)).cast("int")
    tasks = F.array(
        *[
            F.struct(
                F.least(F.col("_b"), F.lit(k)).alias("_bi"),
                F.greatest(F.col("_b"), F.lit(k)).alias("_bj"),
            )
            for k in range(blocks)
        ]
    )
    expanded = (
        assigned.select("vec_id", "_v", "_n", "cell")
        .withColumn("_b", b_col)
        .withColumn("_t", F.explode(tasks))
        .select(
            "vec_id", "_v", "_n", "cell", "_b",
            F.col("_t._bi").alias("_bi"), F.col("_t._bj").alias("_bj"),
        )
    )
    # a loser can surface from several bucket-pair tasks (one witness
    # pair per task); the consumer anti-join is duplicate-insensitive,
    # but dedup here keeps the output a set like the single-task shape
    losers_df = (
        expanded.groupBy("cell", "_bi", "_bj")
        .applyInArrow(losers, schema="vec_id bigint")
    )
    return losers_df.distinct() if blocks > 1 else losers_df


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
