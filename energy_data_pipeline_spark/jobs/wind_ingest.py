"""Wind collection job — the reference's Namdong/Seobu wind flows
(namdong_wind_collect.py, seobu_wind_load.py) as one Spark batch job.

Distinctives vs the PV job:
- hour columns are 1-based with hour 24 meaning next-day 00:00 (P9
  rollover, namdong_wind_collect.py:127-138);
- multi-unit plants get a unit suffix on the entity name (P15/A8,
  namdong_wind_collect.py:141-148);
- the sink is a keyed UPSERT on (timestamp, plant_name) — K5, matching
  the table's unique index (wind/database.py:48-50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.reshape import long_with_timestamp, unpivot_hours
from ..sinks.writers import upsert


def add_unit_suffix(
    df: DataFrame, plant_col: str, unit_col: str, out_col: str | None = None
) -> DataFrame:
    """P15/A8 — append ' <unit>' to the plant name only when the plant has
    more than one distinct unit (namdong_wind_collect.py:141-148 /
    namdong_collect_pv.py:284-288), vectorized as a window count instead
    of a row-wise apply."""
    out = out_col or plant_col
    n_units = F.size(
        F.collect_set(unit_col).over(Window.partitionBy(plant_col))
    )
    return df.withColumn(
        out,
        F.when(
            n_units > 1, F.concat_ws(" ", F.col(plant_col), F.col(unit_col))
        ).otherwise(F.col(plant_col)),
    )


def wind_ingest_job(wide_df: DataFrame, table_path: str) -> dict:
    """Transform+load for a wind payload batch.

    ``wide_df`` columns: ymd (yyyyMMdd string), plant_name, hogi,
    qhorGen01..qhorGen24 (any case). Returns load stats.
    """
    id_cols = [c for c in wide_df.columns if not c.lower().startswith("qhorgen")]
    long = unpivot_hours(
        wide_df,
        id_cols,
        value_col_pattern=r"(?i)^qhorgen(\d+)$",
        var_name="hour_label",
        value_name="generation",
    )
    long = long.withColumn("ymd_date", F.to_date("ymd", "yyyyMMdd"))
    # 1-based labels where 24 rolls to next-day 00:00
    long = long_with_timestamp(
        long, "ymd_date", hour24_rollover=True, ts_name="timestamp"
    )
    long = add_unit_suffix(long, "plant_name", "hogi")
    final = (
        long.na.drop(subset=["timestamp", "plant_name"])
        .select("timestamp", "plant_name", "generation")
    )
    n = upsert(
        final.sparkSession, final, table_path, keys=["timestamp", "plant_name"]
    )
    return {"rows_in_table": n, "rows_in_batch": final.count()}
