"""Idempotent write protocols — SURVEY.md §2.2 (K1–K7).

The reference's load semantics, re-expressed over parquet tables:

- K3 append                    → ``append``
- K4 idempotent range overwrite (DELETE keyed date-range + insert,
  daily_pv_automation.py:201-224) → ``overwrite_date_range`` via dynamic
  partition overwrite on a day-partitioned table: replaying a batch
  replaces exactly the partitions it covers, atomically per partition.
- K5 upsert (ON CONFLICT DO UPDATE, namdong_wind_collect.py:191-225)
  → ``upsert``: anti-join the old table on the unique key, union the new
  batch, atomic directory swap (staging + rename). On Delta/Iceberg this
  would be MERGE INTO; plain parquet needs the swap for atomicity
  (SURVEY.md §7.5).
- K6 truncate+reload (hangyoung_wind_load.py:65-67) → ``truncate_reload``
  (mode=overwrite).

Scale: K4 touches only affected day partitions; K5's anti-join shuffles
on the unique key — at 100 TB prefer day-partition scoping (pass
``scope_filter``) so the anti-join reads only overlapping partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def append(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """K1/K3 — plain append."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def truncate_reload(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """K6 — full refresh."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_date_range(
    df: DataFrame,
    path: str,
    ts_col: str,
    day_col: str = "p_day",
    extra_partition_cols: Sequence[str] = (),
) -> None:
    """K4 — replace-by-day-partition. The batch is written with
    ``partitionOverwriteMode=dynamic``: only the day partitions present in
    the batch are replaced; everything else is untouched. Replaying the
    same (or a corrected) batch for a date range is therefore idempotent —
    the Spark-native equivalent of the reference's single ranged DELETE +
    append in one transaction."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = df.withColumn(day_col, F.to_date(F.col(ts_col)))
        out.write.mode("overwrite").partitionBy(day_col, *extra_partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    num_buckets: int = 64,
    sort_cols: Sequence[str] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write — the pay-once co-location contract for
    tables that are repeatedly joined or aggregated on the same keys
    (fact-to-fact joins a broadcast can't cover at 100 TB).

    ``bucketBy`` hash-partitions rows into ``num_buckets`` files per
    partition at WRITE time; any later equi-join between two tables
    bucketed the same way (same keys, same count), or groupBy on the
    bucket keys, runs exchange-free — the shuffle happened once, at
    ingest, instead of per query. ``sort_cols`` additionally pre-sorts
    within buckets so sort-merge joins skip their sort.

    ``path`` makes the table external (data at ``path``, metadata in the
    session catalog); bucketed writes require ``saveAsTable`` — plain
    ``.parquet(path)`` writes no bucket spec.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(int(num_buckets), *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def _recover_upsert_state(path: str) -> None:
    """Crash recovery for the staging-swap protocol (single writer per
    table assumed). The swap is two renames with an unavoidable no-table
    window on plain filesystems; every crash point leaves a recoverable
    marker that this sweep repairs on the next run:

    - table missing + ``__old_*`` backup present (crash between the two
      renames): restore the newest backup as the live table;
    - table present + dangling ``__old_*`` (crash after swap, before
      cleanup): delete the backup;
    - dangling ``__staging_*`` (crash mid-write): delete — the staged
      data was never the table of record.
    """
    parent = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(path)
    if not os.path.isdir(parent):
        return
    entries = os.listdir(parent)
    backups = [
        os.path.join(parent, e) for e in entries if e.startswith(base + "__old_")
    ]
    if not os.path.exists(path) and backups:
        newest = max(backups, key=os.path.getmtime)
        os.rename(newest, path)
        backups.remove(newest)
    if os.path.exists(path):
        for b in backups:
            shutil.rmtree(b, ignore_errors=True)
    for e in entries:
        if e.startswith(base + "__staging_"):
            shutil.rmtree(os.path.join(parent, e), ignore_errors=True)


def upsert(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    keys: Sequence[str],
    scope_filter: str | None = None,
) -> int:
    """K5 — upsert into a parquet table: old rows whose key collides with
    the batch are replaced; others kept. Returns rows written.

    ``scope_filter`` (SQL predicate) limits which existing rows are even
    read for the anti-join — pass a day-range predicate at scale so only
    overlapping partitions participate.

    Atomicity, honestly stated: plain parquet directories have no MERGE
    and no atomic two-directory swap, so there is a crash window between
    the two renames where no live table exists. The protocol is instead
    crash-RECOVERABLE: data is always in exactly one of (table, backup,
    both), and :func:`_recover_upsert_state` — run at the start of every
    upsert — restores the table from its backup / clears dangling state.
    On Delta/Iceberg this entire function is one ``MERGE INTO``.

    The batch is deduplicated on the key first (deterministic winner:
    max over the non-key columns) — ON CONFLICT applies rows one at a
    time so the table can never hold two rows per key, and this writer
    must uphold the same invariant even for self-colliding batches.
    """
    _recover_upsert_state(path)
    key_list = list(keys)
    # batch-internal key collisions: keep one deterministic winner
    non_keys = [c for c in new_df.columns if c not in key_list]
    if non_keys:
        wdd = Window.partitionBy(*key_list).orderBy(
            *[F.col(c).desc_nulls_last() for c in non_keys]
        )
        new_df = (
            new_df.withColumn("_rk", F.row_number().over(wdd))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
    else:
        new_df = new_df.dropDuplicates(key_list)

    if os.path.exists(path):
        old = spark.read.parquet(path)
        if scope_filter:
            # NULL-safe split: rows where the predicate is NULL must be
            # KEPT (out of scope), not silently dropped from the table
            in_scope = old.filter(f"coalesce(({scope_filter}), false)")
            out_of_scope = old.filter(f"NOT coalesce(({scope_filter}), false)")
        else:
            in_scope, out_of_scope = old, None
        kept = in_scope.join(
            new_df.select(*key_list).distinct(), key_list, "left_anti"
        )
        merged = kept.unionByName(new_df.select(*old.columns))
        if out_of_scope is not None:
            merged = merged.unionByName(out_of_scope)
    else:
        merged = new_df

    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    return n
