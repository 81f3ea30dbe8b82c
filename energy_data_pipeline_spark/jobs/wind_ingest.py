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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.reshape import long_with_timestamp, unpivot_hours
from ..sinks.writers import upsert


def add_unit_suffix(
    df: DataFrame,
    plant_col: str,
    unit_col: str,
    out_col: str | None = None,
    known_pairs: DataFrame | None = None,
) -> DataFrame:
    """P15/A8 — append ' <unit>' to the plant name only when the plant has
    more than one distinct unit (namdong_wind_collect.py:141-148 /
    namdong_collect_pv.py:284-288), vectorized as a broadcast-joined
    count instead of a row-wise apply.

    Multi-unit status from ONE batch is unstable — a re-delivery that
    happens to carry a single unit would flip the entity name and split
    the upsert key. Pass ``known_pairs`` (the (plant, unit) pairs already
    in the sink) so the decision is monotonic across batches."""
    out = out_col or plant_col
    pairs = df.select(plant_col, unit_col).distinct()
    if known_pairs is not None:
        pairs = pairs.unionByName(
            known_pairs.select(plant_col, unit_col)
        ).distinct()
    multi = pairs.groupBy(plant_col).agg(
        (F.countDistinct(unit_col) > 1).alias("_multi")
    )
    return (
        df.join(F.broadcast(multi), plant_col, "left")
        .withColumn(
            out,
            F.when(
                F.coalesce(F.col("_multi"), F.lit(False)),
                F.concat_ws(" ", F.col(plant_col), F.col(unit_col)),
            ).otherwise(F.col(plant_col)),
        )
        .drop("_multi")
    )


def wind_ingest_job(wide_df: DataFrame, table_path: str) -> dict:
    """Transform+load for a wind payload batch.

    ``wide_df`` columns: ymd (yyyyMMdd string), plant_name, hogi,
    qhorGen01..qhorGen24 (any case). Returns load stats. The sink keeps
    (raw_plant, hogi) so the unit-suffix decision stays stable across
    batches (see add_unit_suffix)."""
    import os

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
    spark = long.sparkSession
    known = None
    if os.path.exists(table_path):
        known = (
            spark.read.parquet(table_path)
            .select(F.col("raw_plant").alias("plant_name"), F.col("hogi"))
            .distinct()
        )
    long = add_unit_suffix(
        long, "plant_name", "hogi", out_col="entity_name", known_pairs=known
    )
    final = (
        long.na.drop(subset=["timestamp", "plant_name"])
        .select(
            "timestamp",
            F.col("entity_name").alias("plant_display"),
            F.col("plant_name").alias("raw_plant"),
            "hogi",
            "generation",
        )
        .withColumnRenamed("plant_display", "plant_name")
    )
    n = upsert(
        final.sparkSession, final, table_path, keys=["timestamp", "plant_name"]
    )
    return {"rows_in_table": n, "rows_in_batch": final.count()}
