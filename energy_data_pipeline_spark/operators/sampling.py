"""Deterministic sampling for training-data mixes: stratified keep-rates
and train/val/test splits via HASH-MOD bucketing, not ``rand()``.

Why not ``df.sample`` / ``sampleBy``: seeded RNG sampling is only
reproducible for a fixed partitioning — a repartition, an AQE re-plan,
or a different executor count reassigns rows to RNG streams and the
sample silently changes. Training pipelines need the membership decision
to be a PURE FUNCTION of the row key, so the same document lands in the
same split on every engine, every rerun, every scale (and the oracle can
replay it in SQL). The standard trick: bucket = md5(seed || key) mod N;
keep iff bucket < rate·N.

All JVM expressions over one scan — embarrassingly parallel, no shuffle.

Reference parity note: the reference has no sampling surface (its loads
are full-table); this is part of the training-data surface this engine
adds (SURVEY.md §2 training-data extensions).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MOD = 10_000  # basis points: rates resolve to 0.01% granularity


def rate_to_bp(rate: float) -> int:
    """A keep-rate as an integer bucket threshold in [0, HASH_MOD].

    Thresholds are compared as INTEGERS everywhere (engine and oracle):
    `rate * HASH_MOD` evaluated as a double can overshoot the integer
    boundary (0.07 * 10000 == 700.0000000000001) while an exact-decimal
    engine gets 700.0 — one extra bucket kept on one side only.
    """
    return max(0, min(HASH_MOD, int(round(rate * HASH_MOD))))


def hash_bucket(col: Column | str, seed: str = "") -> Column:
    """Deterministic bucket in [0, HASH_MOD) — a pure function of
    (seed, value), identical in any engine that has md5 (the first 8 hex
    chars parsed as an integer, mod HASH_MOD)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(seed), c.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(HASH_MOD))


def duck_hash_bucket_sql(col_sql: str, seed: str = "") -> str:
    """The DuckDB twin of :func:`hash_bucket` (oracle generation)."""
    return (
        f"(('0x' || substr(md5('{seed}' || CAST({col_sql} AS VARCHAR)), 1, 8))"
        f"::UBIGINT % {HASH_MOD})"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: Mapping[str, float],
    seed: str = "",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    row kept iff hash_bucket(id) < rate·HASH_MOD. Strata missing from
    ``rates`` are dropped (rate 0) — the usual "mix spec" semantics."""
    mapping = F.create_map(
        *[F.lit(x) for k, v in rates.items() for x in (k, rate_to_bp(v))]
    )
    threshold = mapping[F.col(strata_col)]
    return df.filter(hash_bucket(id_col, seed) < F.coalesce(threshold, F.lit(0)))


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_pct: float = 10.0,
    test_pct: float = 10.0,
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic 'train' / 'val' / 'test' label.

    Buckets [0, train_bp) → train, [train_bp, train_bp+val_bp) → val,
    rest → test; a document's split never changes across reruns or
    repartitions, and adding data never moves existing rows between
    splits (the hash ignores everything but the key)."""
    val_bp = int(round(val_pct / 100.0 * HASH_MOD))
    test_bp = int(round(test_pct / 100.0 * HASH_MOD))
    train_bp = HASH_MOD - val_bp - test_bp
    b = hash_bucket(id_col, seed)
    return df.withColumn(
        split_col,
        F.when(b < train_bp, F.lit("train"))
        .when(b < train_bp + val_bp, F.lit("val"))
        .otherwise(F.lit("test")),
    )
