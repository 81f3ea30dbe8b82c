"""Deduplication operators.

Order-defined dedup (SURVEY.md §2.7 O3/O4): pandas ``keep='first'/'last'``
depends on row order, which Spark does not have — every keep-X dedup here
takes an explicit ordering column (SURVEY.md §7.1). Implemented as a
window ``row_number``; at scale this is one shuffle on the key columns,
skew-handled by AQE.

Exact corpus dedup for training data: hash-groupBy on a content hash —
the map-side-combinable pattern that survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rn(keys: Sequence[str], order: Sequence[Column]) -> Column:
    return F.row_number().over(Window.partitionBy(*keys).orderBy(*order))


def dedup_keep_first(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """O3 — keep the first row per key by ``order_col`` ascending.
    Parity: initial_db_ingestion.py:99 (keep='first' after ordered read).
    """
    rn = _rn(keys, [F.col(order_col).asc_nulls_last()])
    return df.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")


def dedup_keep_last(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """O4 — keep the last row per key by ``order_col`` (new data wins).
    Parity: prefect_flows/merge_to_all.py:57-79 — the accumulate+dedup
    pattern; the ingest-sequence column makes 'last' well-defined.
    """
    rn = _rn(keys, [F.col(order_col).desc_nulls_last()])
    return df.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")


def exact_dedup(
    df: DataFrame, content_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact content dedup: md5(content) groups; keeps min/max id per group.

    Returns the surviving rows. The hash-groupBy gets a map-side partial
    aggregate, so the shuffle carries one row per (hash) not per input row.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    survivors = (
        df.groupBy(F.md5(F.col(content_col)).alias("_h"))
        .agg(agg.alias(id_col))
        .select(id_col)
    )
    return df.join(survivors, id_col, "left_semi")


def duplicate_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Report exact-duplicate clusters: content hash, group size, keeper id."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def anti_join_new_keys(
    batch: DataFrame, committed_keys: DataFrame, key: str
) -> DataFrame:
    """Batch rows whose ``key`` is NOT in the committed key set — the
    idempotent-ingest filter every incremental sink runs per batch,
    shaped so the per-batch cost never scales with the committed table:

    the committed key column is first SEMI-FILTERED by the (broadcast,
    batch-bounded) batch keys — a column-pruned scan, no shuffle — and
    the anti-join then builds on that ≤ batch-sized overlap. A plain
    ``left_anti`` against the full committed set cannot broadcast its
    build side (it grows without bound), so the planner shuffles and
    sorts the ENTIRE committed key set on every micro-batch.
    Identity: anti(batch, T) == anti(batch, T ∩ batch-keys)."""
    overlap = committed_keys.select(key).join(
        F.broadcast(batch.select(key)), key, "left_semi"
    )
    return batch.join(F.broadcast(overlap), key, "left_anti")
