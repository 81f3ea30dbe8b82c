"""Approximate-nearest-neighbor search over embedding columns.

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Query side is broadcast (queries << corpus), so the corpus never
  shuffles; per-partition TopK via window row_number.
- ``lsh_topk``: random-hyperplane LSH path for scale — sign-bucket the
  corpus once (deterministic md5-derived hyperplanes, so results are
  reproducible and oracle-checkable), join queries to their bucket, rank
  within bucket. At 100 TB the bucket join replaces the full cross
  product; recall is tunable by n_planes / multi-probe.

All vector math is JVM-side (functions/vectors.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd

from ..functions.vectors import cosine

N_PLANES = 6


def hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix derived from md5 — identical
    constants are embedded in the SQL oracle."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane{p}:dim{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) >= 8 else -1)
        planes.append(row)
    return planes


def _bucket_expr(vec: Column, planes: list[list[int]]) -> Column:
    """LSH bucket id: concatenated sign bits of plane dot products.

    The per-plane dot is built as a left-associated sum of ±v[i] terms so
    floating-point evaluation order matches the SQL oracle exactly.
    """
    bits = []
    for row in planes:
        acc = None
        for d, s in enumerate(row):
            term = F.element_at(vec, d + 1).cast("double")
            term = term if s > 0 else -term
            acc = term if acc is None else acc + term
        bits.append(F.when(acc >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors per query (excluding self)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", rnd(cosine("_qv", "_cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = N_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    planes = hyperplane_signs(n_planes, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _bucket_expr(F.col(vec_col), planes).alias("_bkt"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _bucket_expr(F.col(vec_col), planes).alias("_bkt"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "_bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", rnd(cosine("_qv", "_cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )
