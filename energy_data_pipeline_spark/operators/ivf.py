"""IVF (inverted-file) approximate nearest neighbor — the second scale
path next to random-hyperplane LSH (operators/similarity.py).

Two pieces, deliberately separable:

- ``kmeans_lloyd``: coarse-quantizer training as iterative DataFrame
  jobs — assignment is a broadcast-centroid argmin (narrow, codegen),
  the update is one groupBy averaging vectors per cell. Each Lloyd
  round is one shuffle of (cell, vector) partial sums; centroids
  (k × dim doubles) always fit in a broadcast. This is how the engine
  expresses iterative algorithms: driver-side loop over declarative
  rounds, nothing collected but the k centroids.
- ``ivf_assign`` / ``ivf_topk``: index-time cell assignment and
  query-time search probing the ``nprobe`` nearest cells only. At 100 TB
  the cell assignment is the partition key — cells are co-located, and a
  query touches nprobe/k of the corpus.

Determinism: centroids are either passed in, or seeded by taking the
first-k vectors in id order — so search results are reproducible and the
assignment/search stages have an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd
from ..functions.vectors import cosine_from_norms, norm

N_CELLS = 8
N_PROBE = 2


def seed_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, k: int = N_CELLS
) -> list[list[float]]:
    """Deterministic seeding: the k lowest-id vectors (cast to double).
    Good enough as a fixed coarse quantizer for oracle-checked search;
    refine with ``kmeans_lloyd`` when recall matters more than parity."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r[1]] for r in rows]


def _centroid_lit(centroids: list[list[float]]) -> Column:
    return F.lit([[float(x) for x in c] for c in centroids])


def _nearest_cells(
    vec: Column, centroids: list[list[float]] | Column, n: int
) -> Column:
    """Indices (0-based) of the n nearest centroids by L2, ties by index.

    ``centroids`` is either a Python list (bound as an
    array<array<double>> literal — the collect-based training loop) or a
    Column of the same shape (e.g. a crossJoin'd broadcast centroid
    column), which costs the same per row — measured equal A/B.

    One array expression: distances via zip_with folds against the
    centroid array, then an argsort by (distance, index).

    Deliberately the interpreted-HOF form. A flat codegen expansion
    (per-centroid arithmetic columns + least()/when() argmin chains) was
    tried and reverted: duplicating the k distance trees inside the
    selection chain blew the plan to tens of thousands of nodes, and
    optimizer passes + janino compilation cost ~60 s per distinct plan —
    two orders of magnitude more than the interpreted evaluation it
    saved. At k=8 cells the HOF evaluation is a per-row cost of ~1k
    lambda dispatches, which profiling puts well below the per-round
    action overhead of the Lloyd loop.
    """
    cents = centroids if isinstance(centroids, Column) else _centroid_lit(centroids)
    scored = F.transform(
        cents,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(c, vec, lambda a, b: (a - b.cast("double")) * (a - b.cast("double"))),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
            i.alias("idx"),
        ),
    )
    return F.slice(F.transform(F.array_sort(scored), lambda s: s["idx"]), 1, n)


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index build: each vector gets its nearest cell id (partition key
    at scale)."""
    return corpus.withColumn(
        "cell", F.element_at(_nearest_cells(F.col(vec_col), centroids, 1), 1)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = N_PROBE,
    indexed: DataFrame | None = None,
) -> DataFrame:
    """Search: probe the query's ``nprobe`` nearest cells, exact cosine
    within the probed subset, top-k per query. Pass ``indexed`` (an
    ``ivf_assign`` output selected to (neighbor_id, _cv, cell)) to
    serve from a persisted cell index instead of re-assigning the
    corpus per invocation."""
    if indexed is None:
        indexed = ivf_assign(corpus, centroids, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            "cell",
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(vec_col).alias("_qn"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, nprobe)).alias("cell"),
    )
    # candidate-side norms materialize once per candidate ROW here, so
    # the probe join pays one dot fold per (query, candidate) pair
    # instead of dot + two norm folds (cosine_from_norms docstring —
    # value-identical; a candidate row was previously re-normed once
    # per probing query)
    scored = (
        F.broadcast(q)
        .join(indexed.withColumn("_cn", norm("_cv")), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            rnd(
                cosine_from_norms(
                    "_qv", "_cv", F.col("_qn"), F.col("_cn")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


def kmeans_lloyd(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = N_CELLS,
    iterations: int = 5,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Train the coarse quantizer: Lloyd iterations as DataFrame rounds.

    Per round: broadcast-centroid argmin assignment (narrow) → groupBy
    cell with element-wise vector sums (one shuffle of k×dim partials) →
    collect k centroids. Empty cells keep their previous centroid.

    ``sample_fraction``: deterministic MINI-BATCH rounds — each Lloyd
    round assigns only a hash-selected fraction of the corpus
    (xxhash64(id, round) bucketing: no RNG, no run-order dependence,
    and a DIFFERENT deterministic batch per round, the classic
    mini-batch k-means schedule). The round-10 probe measured the
    full assign pass at 17 s/round on 1M×16d vectors with a 10%%
    mini-batch at 0.18× that — past ~1M vectors mini-batching is how
    the index build stays affordable while the final ASSIGN over the
    full corpus (one pass) stays exact.

    The double-cast vector table is persisted for the duration of the
    loop: every Lloyd round is a separate action, and without the cache
    each round would re-scan the source and re-cast every vector — the
    cache turns iterations into pure argmin+aggregate passes."""
    from pyspark.storagelevel import StorageLevel

    vecs = corpus.select(
        F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        seed_rows = vecs.orderBy(id_col).limit(k).collect()
        if not seed_rows:
            raise ValueError("kmeans_lloyd: empty corpus")
        centroids = [[float(x) for x in r["v"]] for r in seed_rows]
        return _lloyd_rounds(
            vecs, centroids, iterations, id_col=id_col,
            sample_fraction=sample_fraction,
        )
    finally:
        vecs.unpersist()


def _minibatch(
    vecs: DataFrame, id_col: str, fraction: float | None, round_idx: int
) -> DataFrame:
    """Deterministic per-round mini-batch: hash-bucket the id with the
    round index folded in, so every round sees a different but fully
    reproducible subset. fraction None/>=1 = full batch."""
    if fraction is None or fraction >= 1.0:
        return vecs
    denom = 1_000_000
    return vecs.filter(
        F.pmod(F.xxhash64(F.col(id_col), F.lit(round_idx)), F.lit(denom))
        < int(fraction * denom)
    )


def _rnd9(x: float) -> float:
    """Half-away-from-zero at 9 decimals on the binary double — the
    Python twin of functions/rounding.rnd (= DuckDB ``round(x, 9)``),
    so driver-side centroid rounding matches the SQL oracle exactly.
    Python's built-in round() is banker's and would differ at exact
    boundary values."""
    import math

    p = 1e9
    if x >= 0:
        return math.floor(x * p + 0.5) / p
    return -(math.floor((-x) * p + 0.5) / p)


def _lloyd_rounds(
    vecs: DataFrame,
    centroids: list[list[float]],
    iterations: int,
    id_col: str = "vec_id",
    sample_fraction: float | None = None,
) -> list[list[float]]:
    k = len(centroids)  # corpus may hold fewer than k vectors
    dim = len(centroids[0])
    for round_idx in range(iterations):
        batch = _minibatch(vecs, id_col, sample_fraction, round_idx)
        assigned = batch.withColumn(
            "cell", F.element_at(_nearest_cells(F.col("v"), centroids, 1), 1)
        )
        sums = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("v", d + 1)).alias(f"s{d}") for d in range(dim)],
        )
        # Round the updated coordinates: double summation order varies
        # with partitioning, so raw means carry ~1e-13 relative jitter
        # across core counts — enough to flip a near-tied argmin
        # assignment and break run-to-run / oracle determinism. 9
        # decimals is far below any real centroid separation and far
        # above the jitter; half-away-from-zero on the binary value =
        # DuckDB round() = functions/rounding.rnd semantics.
        new = {
            r["cell"]: [_rnd9(r[f"s{d}"] / r["n"]) for d in range(dim)]
            for r in sums.collect()
        }
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return centroids
