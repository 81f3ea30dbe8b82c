"""Z-order compaction job: rewrite a table clustered on a Morton curve
so file-level min/max statistics prune BOTH query dimensions.

This is the write path behind ``lay_zorder_compaction_plan`` (which only
PLANS the layout): compute the Morton key, range-partition the data on
it (Spark samples the key distribution and draws equal-count boundaries
— the distributed sort a real compaction service runs), sort within
partitions, and write one file per range. After the rewrite, a filter
on EITHER clustered dimension touches a fraction of the files, which
``skipping_effectiveness`` quantifies from the actual parquet footer
stats (no query engine trust required — the numbers come from the
files).

At 100 TB: repartitionByRange is a full shuffle of the rewritten
partition — the price of compaction, paid once per maintenance window,
amortized over every subsequent pruned scan. The job never collects
data; the footer audit reads metadata only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog_ext import _Z_BITS, _morton

__all__ = ["zorder_rewrite", "skipping_effectiveness"]


def zorder_key(user_col: Column, day_col: Column) -> Column:
    """The (user bucket, day bucket) Morton key used by both the layout
    plan and this rewrite — one definition, shared. pmod, not %: a
    timestamp before the day epoch makes datediff negative, and a
    sign-following % would hand _morton a negative bucket whose
    shiftright sign-extends into a garbage code — pmod keeps both
    buckets in [0, 2^_Z_BITS)."""
    ub = F.pmod(user_col, F.lit(1 << _Z_BITS)).cast("int")
    db = F.pmod(day_col, F.lit(1 << _Z_BITS)).cast("int")
    return _morton(ub, db)


def zorder_rewrite(
    events: DataFrame,
    out_path: str,
    n_files: int = 16,
) -> None:
    """Rewrite ``events`` into ``n_files`` parquet files clustered on
    the Morton curve over (user_id, day-of-epoch). Equal-COUNT file
    boundaries via repartitionByRange (range sampling draws the
    splits), rows sorted within each file so column min/max stats are
    tight."""
    day = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    keyed = events.withColumn("_zkey", zorder_key(F.col("user_id"), day))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def _footer_ranges(spark: SparkSession, path: str, column: str):
    """Per-file (min, max) of ``column`` from the parquet footers —
    metadata-only, via pyarrow; this is exactly the information a
    data-skipping reader uses."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    local = pafs.LocalFileSystem()
    files = [
        f.path
        for f in local.get_file_info(pafs.FileSelector(path))
        if f.path.endswith(".parquet")
    ]
    out = []
    for fp in sorted(files):
        md = pq.ParquetFile(fp).metadata
        col_idx = None
        for i in range(len(md.schema)):
            if md.schema.column(i).name == column:
                col_idx = i
                break
        if col_idx is None:
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            if st is None or not st.has_min_max:
                mins, maxs = [], []
                break
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((fp, min(mins), max(maxs)))
    return out


def skipping_effectiveness(
    spark: SparkSession, path: str, column: str, lo, hi
) -> dict:
    """How many files a range predicate ``lo <= column <= hi`` must
    read, judged from footer min/max alone: the data-skipping audit a
    compaction job logs as its before/after evidence."""
    ranges = _footer_ranges(spark, path, column)
    touched = [fp for fp, mn, mx in ranges if not (mx < lo or mn > hi)]
    return {
        "n_files": len(ranges),
        "n_touched": len(touched),
        "fraction_touched": round(len(touched) / max(len(ranges), 1), 4),
    }
