"""Product quantization (PQ) — the compressed-index ANN path next to
IVF (operators/ivf.py) and hyperplane LSH (operators/similarity.py).

PQ (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) splits each vector into M contiguous subvectors
and vector-quantizes each subspace independently with a small k-means
codebook: a 64-dim float vector becomes M small integer codes, and
query-time search uses ASYMMETRIC DISTANCE COMPUTATION (ADC) — the
query stays full-precision, per-(subspace, centroid) squared distances
are table-looked-up and summed over codes. The corpus side of the
search never touches raw vectors: at 100 TB the codes table is ~M bytes
per vector instead of 4·dim, and the ADC join is keyed on (subspace,
code) against a lookup table of |queries|·M·k rows — broadcast-sized by
construction.

Spark shape, deliberately mirroring ``ivf.kmeans_lloyd``'s discipline:

- Training runs ALL M subspaces in ONE distributed pass per Lloyd
  round: the per-vector subvector explode feeds a (m, cell) argmin
  assignment (broadcast codebook literal), then one groupBy computes
  every subspace's centroid sums — M·k rows collected per round,
  nothing else leaves the executors.
- Seeding is deterministic (subvectors of the k lowest-id vectors) and
  centroid means are rounded half-away-from-zero at 9 decimals
  (``ivf._rnd9``), so codes, reconstruction errors and ADC rankings are
  reproducible and have an exact SQL oracle — same contract as the
  trained-IVF entry.
- Assignment/search are pure array expressions (zip_with fold argmin)
  — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd
from .ivf import _rnd9

# Config chosen by measured recall@5 against exact L2 on the synthetic
# near-uniform corpus (PQ's adversarial case — no cluster structure for
# the codebooks to exploit, same reason single-bucket sign-LSH collapses
# there): 4x4 scored 0.03, 8x16 scores 0.25 (~the multiprobe-LSH
# figure), 16x32x2 reaches 0.45 at 4x the codebook. 8x16 is the
# size/recall knee; real text embeddings cluster and recall is far
# higher (Jégou et al. report >0.9 recall@100 on SIFT with M=8).
PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace
PQ_ITERS = 1  # deterministic Lloyd refinement rounds


def _d2(c: Column, v: Column) -> Column:
    """Squared L2 between two equal-length double arrays (left fold in
    index order — both engines sum the same sequence).

    Round-12 note: an unrolled ``0.0 + (c1-v1)² + ...`` literal chain
    (bit-identical op sequence) was measured 4-5x SLOWER than this
    zip_with/aggregate fold at dim=64 (1M dots: fold 1.6 s, unrolled
    element_at 8.0 s, unrolled getItem 6.0 s on local[8]) — Spark
    evaluates HOFs over primitive arrays efficiently, while the
    64-term tree pays per-element null/ANSI bounds machinery. Keep the
    fold."""
    return F.aggregate(
        F.zip_with(c, v, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_cell(sub: Column, cents_m: Column) -> Column:
    """struct(d2, idx) of the nearest centroid in ``cents_m``
    (array<array<double>>), ties by index — array_sort on the struct
    orders by d2 then idx."""
    scored = F.array_sort(
        F.transform(
            cents_m,
            lambda c, i: F.struct(_d2(c, sub).alias("d2"), i.alias("idx")),
        )
    )
    return F.element_at(scored, 1)


def _doubled(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return corpus.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )


def _sub_explode(vecs: DataFrame, id_col: str, m: int, subdim: int) -> DataFrame:
    """(id, m, sv): each vector exploded into its M subvectors."""
    parts = F.array(
        *[
            F.struct(
                F.lit(mi).alias("m"),
                F.slice("v", mi * subdim + 1, subdim).alias("sv"),
            )
            for mi in range(m)
        ]
    )
    return vecs.select(id_col, F.explode(parts).alias("_x")).select(
        id_col, F.col("_x.m").alias("m"), F.col("_x.sv").alias("sv")
    )


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    k: int = PQ_K,
    iterations: int = PQ_ITERS,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Train the M codebooks; returns cents[m][cid] = subdim doubles.

    One collect of k seed vectors, then per Lloyd round one distributed
    assignment+aggregate pass covering every subspace (M·k centroid
    rows collected per round). ``sample_fraction`` runs each round
    over a deterministic hash-selected mini-batch (see
    ``ivf._minibatch``) — the round-10 probe puts the full assign pass
    at ~17 s/round per 1M×16d vectors, so beyond ~1M vectors training
    should mini-batch while the final full-corpus ``pq_assign`` stays
    exact."""
    from pyspark.storagelevel import StorageLevel

    from .ivf import _minibatch

    vecs = _doubled(corpus, id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        seed_rows = vecs.orderBy(id_col).limit(k).collect()
        if not seed_rows:
            raise ValueError("pq_train: empty corpus")
        k = min(k, len(seed_rows))  # corpus may hold fewer than k vectors
        dim = len(seed_rows[0]["v"])
        if dim % m:
            raise ValueError(f"pq_train: dim {dim} not divisible by M={m}")
        subdim = dim // m
        cents = [
            [
                [float(x) for x in r["v"][mi * subdim : (mi + 1) * subdim]]
                for r in seed_rows
            ]
            for mi in range(m)
        ]
        subs = _sub_explode(vecs, id_col, m, subdim)
        for round_idx in range(iterations):
            batch = _minibatch(subs, id_col, sample_fraction, round_idx)
            cents_lit = F.lit(cents)
            assigned = batch.withColumn(
                "cell",
                _argmin_cell(
                    F.col("sv"), F.element_at(cents_lit, F.col("m") + 1)
                )["idx"],
            )
            sums = assigned.groupBy("m", "cell").agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("sv", d + 1)).alias(f"s{d}")
                    for d in range(subdim)
                ],
            )
            new = {
                (r["m"], r["cell"]): [
                    _rnd9(r[f"s{d}"] / r["n"]) for d in range(subdim)
                ]
                for r in sums.collect()
            }
            cents = [
                [new.get((mi, ci), cents[mi][ci]) for ci in range(k)]
                for mi in range(m)
            ]
        return cents
    finally:
        vecs.unpersist()


def pq_assign(
    corpus: DataFrame,
    cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Codes table: (id, code0..code{M-1}, recon_err).

    One narrow pass — per row, M argmins against the broadcast codebook
    literal; recon_err = sqrt of the summed per-subspace squared
    quantization errors (the L2 distance to the PQ reconstruction),
    rounded to 6. The codes table is the PERSISTED INDEX at scale: M
    small ints per vector."""
    m = len(cents)
    subdim = len(cents[0][0])
    vecs = _doubled(corpus, id_col, vec_col)
    picks = [
        _argmin_cell(
            F.slice("v", mi * subdim + 1, subdim), F.lit(cents[mi])
        )
        for mi in range(m)
    ]
    return vecs.select(
        id_col,
        *[p["idx"].cast("int").alias(f"code{mi}") for mi, p in enumerate(picks)],
        rnd(
            F.sqrt(sum((p["d2"] for p in picks), F.lit(0.0))), 6
        ).alias("recon_err"),
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC search: full-precision queries against the codes table.

    The lookup table (query × M × K squared distances) is computed on
    the tiny query side and broadcast; the corpus side contributes ONLY
    its exploded codes — (id, m, code) — so the join is
    broadcast-hash on (m, code) and the per-query distance is one
    map-side-combinable sum of M looked-up terms. Raw vectors of the
    corpus are never touched at search time: this is the path that
    holds when the corpus is 100 TB and the codes are gigabytes.
    Ranking uses the ROUNDED distance (ascending, ties by neighbor id)
    so both engines cut identical top-k sets."""
    codes = pq_assign(corpus, cents, id_col, vec_col)
    return adc_topk_from_codes(codes, queries, cents, id_col, vec_col, k)


def adc_topk_from_codes(
    codes: DataFrame,
    queries: DataFrame,
    cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC search against an ALREADY-MATERIALIZED codes table (columns
    ``id_col, code0..code{M-1}``) — the persisted-index path a vector
    store actually serves from: the corpus's raw vectors are not in the
    plan at all (see ``jobs/pq_index``)."""
    m = len(cents)
    code_stream = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"),
                        F.col(f"code{mi}").alias("code"),
                    )
                    for mi in range(m)
                ]
            )
        ).alias("_x"),
    ).select("neighbor_id", F.col("_x.m").alias("m"), F.col("_x.code").alias("code"))
    subdim = len(cents[0][0])
    qsubs = _sub_explode(
        _doubled(queries, id_col, vec_col), id_col, m, subdim
    ).withColumnRenamed(id_col, "query_id")
    lut = qsubs.select(
        "query_id",
        "m",
        F.posexplode(
            F.transform(
                F.element_at(F.lit(cents), F.col("m") + 1),
                lambda c: _d2(c, F.col("sv")),
            )
        ).alias("code", "d2"),
    )
    scored = (
        code_stream.join(F.broadcast(lut), ["m", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(rnd(F.sum("d2"), 6).alias("adc_dist"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "adc_dist")
    )


# --- IVF-PQ (IVFADC): coarse cells + PQ on residuals ----------------------
def _residuals(
    corpus: DataFrame,
    coarse: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, cell, rv): nearest coarse cell and the residual vector
    v - centroid[cell] — what IVFADC quantizes instead of raw vectors
    (residual energy << vector energy once the coarse quantizer has
    soaked up the cluster structure, so the same codebook bits buy a
    finer quantization)."""
    vecs = _doubled(corpus, id_col, vec_col)
    cents = F.lit(coarse)
    pick = _argmin_cell(F.col("v"), cents)
    return vecs.select(
        id_col,
        pick["idx"].cast("int").alias("cell"),
        F.zip_with(
            "v",
            F.element_at(cents, pick["idx"] + 1),
            lambda a, b: a - b,
        ).alias("rv"),
    )


def ivfpq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_k: int = 8,
    coarse_iters: int = 1,
    m: int = PQ_M,
    k: int = PQ_K,
    iterations: int = PQ_ITERS,
    coarse: list[list[float]] | None = None,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train the IVFADC index (Jégou et al. 2011 §IV): a Lloyd coarse
    quantizer over raw vectors, then ONE shared PQ codebook set over
    the residuals of every cell — the canonical billion-scale layout
    (FAISS ``IVFx,PQy``). Both stages reuse the engine's deterministic
    trainers, so the composed index has an exact SQL oracle. Pass a
    pre-trained ``coarse`` to skip the first stage (model reuse across
    consumers)."""
    from .ivf import kmeans_lloyd

    if coarse is None:
        coarse = kmeans_lloyd(
            corpus, id_col, vec_col, k=coarse_k, iterations=coarse_iters
        )
    resid = _residuals(corpus, coarse, id_col, vec_col)
    pq_cents = pq_train(resid, id_col, "rv", m=m, k=k, iterations=iterations)
    return coarse, pq_cents


def ivfpq_assign_codes(
    corpus: DataFrame,
    coarse: list[list[float]],
    pq_cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The persisted IVFADC index: (id, cell, code0..code{M-1}) —
    nearest coarse cell plus the PQ codes of the residual. This is the
    table a vector store WRITES once per snapshot and serves every
    search from (FAISS's inverted lists, flattened): at 100 TB it is
    M+4 bytes per vector, and search never touches raw vectors or
    re-runs the argmin assignment."""
    m = len(pq_cents)
    subdim = len(pq_cents[0][0])
    resid = _residuals(corpus, coarse, id_col, vec_col)
    picks = [
        _argmin_cell(F.slice("rv", mi * subdim + 1, subdim), F.lit(pq_cents[mi]))
        for mi in range(m)
    ]
    return resid.select(
        id_col,
        "cell",
        *[p["idx"].cast("int").alias(f"code{mi}") for mi, p in enumerate(picks)],
    )


def ivfpq_topk_from_codes(
    codes: DataFrame,
    queries: DataFrame,
    coarse: list[list[float]],
    pq_cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVFADC search against an already-materialized codes table
    (``ivfpq_assign_codes`` output): probe the query's ``nprobe``
    nearest coarse cells; within each probed cell, ADC over residual
    codes with a per-(query, cell) residual lookup table (the residual
    depends on the cell, hence the cell-keyed LUT — |q|·nprobe·M·K
    rows, broadcast). Search touches codes only, and only nprobe/k of
    them per query — the IVF pruning and the PQ compression compose."""
    from .ivf import _nearest_cells

    m = len(pq_cents)
    subdim = len(pq_cents[0][0])
    code_stream = codes.select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"),
                        F.col(f"code{mi}").alias("code"),
                    )
                    for mi in range(m)
                ]
            )
        ).alias("_x"),
    ).select(
        "neighbor_id", "cell", F.col("_x.m").alias("m"), F.col("_x.code").alias("code")
    )
    cents_lit = F.lit(coarse)
    qr = (
        _doubled(queries, id_col, vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            "v",
            F.explode(
                _nearest_cells(F.col("v"), cents_lit, nprobe)
            ).alias("cell"),
        )
        .withColumn(
            "qrv",
            F.zip_with(
                "v",
                F.element_at(cents_lit, F.col("cell") + 1),
                lambda a, b: a - b,
            ),
        )
    )
    qsubs = qr.select(
        "query_id",
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"),
                        F.slice("qrv", mi * subdim + 1, subdim).alias("sv"),
                    )
                    for mi in range(m)
                ]
            )
        ).alias("_x"),
    ).select("query_id", "cell", F.col("_x.m").alias("m"), F.col("_x.sv").alias("sv"))
    lut = qsubs.select(
        "query_id",
        "cell",
        "m",
        F.posexplode(
            F.transform(
                F.element_at(F.lit(pq_cents), F.col("m") + 1),
                lambda c: _d2(c, F.col("sv")),
            )
        ).alias("code", "d2"),
    )
    scored = (
        code_stream.join(F.broadcast(lut), ["cell", "m", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(rnd(F.sum("d2"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "adc_dist")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse: list[list[float]],
    pq_cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVFADC search from raw vectors: one assignment pass builds the
    codes table (``ivfpq_assign_codes``), then the codes-only search.
    Pass a pre-materialized ``codes`` frame to skip the assignment —
    the serve-from-persisted-index path."""
    if codes is None:
        codes = ivfpq_assign_codes(corpus, coarse, pq_cents, id_col, vec_col)
    return ivfpq_topk_from_codes(
        codes, queries, coarse, pq_cents, id_col, vec_col, k, nprobe
    )


def ivfpq_refine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse: list[list[float]],
    pq_cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 25,
    codes: DataFrame | None = None,
    shortl: DataFrame | None = None,
) -> DataFrame:
    """IVFADC+R (Jégou et al. 2011 §V — FAISS ``IndexRefineFlat`` over
    ``IVFx,PQy``): ADC search produces a ``shortlist``-sized candidate
    list per query, then the TRUE squared L2 over raw vectors re-ranks
    only those candidates. The ADC ranking noise — not coarse cell
    misses — is what caps plain IVFADC recall (measured 0.275 at 8×16
    codes whether nprobe is 2 or 4 on the synthetic corpus); the exact
    re-rank recovers it: 0.775 recall@5 at R=25, 0.875 at R=50.

    Scale shape: the corpus side is untouched (codes only, nprobe/k of
    them per query); the re-rank joins the |q|·R shortlist — broadcast,
    it is tiny by construction — against the raw-vector scan keyed on
    the neighbor id, so raw vectors are read for shortlist members
    only. The final window ranks |q|·R rows per query.

    ``shortl`` lets a caller that already holds the ADC shortlist frame
    (e.g. an audit that also derives the plain-IVFADC ranking from the
    same shortlist) pass it in, so the scored aggregate's subplan
    appears once in the composed physical plan instead of per consumer
    — same rows either way (the default path builds the identical
    frame). It MUST be an ``ivfpq_topk`` output built with
    k=``shortlist`` and the same nprobe/codes as the other arguments; a
    shortlist from different parameters silently re-ranks a different
    candidate set, so at least the column contract is asserted here."""
    if shortl is None:
        shortl = ivfpq_topk(
            corpus, queries, coarse, pq_cents, id_col, vec_col,
            k=shortlist, nprobe=nprobe, codes=codes,
        )
    else:
        missing = {"query_id", "neighbor_id", "adc_dist"} - set(shortl.columns)
        if missing:
            raise ValueError(
                f"ivfpq_refine_topk: shortl missing columns {sorted(missing)};"
                " pass an ivfpq_topk output built with k=shortlist and the"
                " same nprobe/codes"
            )
    qv = _doubled(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("_qv")
    )
    shortl_q = shortl.select("query_id", "neighbor_id").join(
        F.broadcast(qv), "query_id"
    )
    nv = _doubled(corpus, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("_nv")
    )
    exact = nv.join(F.broadcast(shortl_q), "neighbor_id").select(
        "query_id",
        "neighbor_id",
        rnd(_d2(F.col("_qv"), F.col("_nv")), 6).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "dist")
    )
