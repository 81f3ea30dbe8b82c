"""Parquet table loaders for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.

At 100 TB these would be partitioned/bucketed managed tables; the loaders
keep the access path declarative (``spark.read.parquet``) so Catalyst gets
predicate pushdown, column pruning and partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanos
# timestamp, so they are read as long (nanosAsLong) and rebuilt as
# TIMESTAMP_NTZ by pure arithmetic (timezone-independent).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _nanos_to_ntz(col: str):
    micros = (F.col(col) / F.lit(1000)).cast("long")
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_add("MICROSECOND", micros, epoch)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, _nanos_to_ntz(col))
    return df


def load_events_window(
    spark: SparkSession,
    sf_dir: str,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """events scan with the time predicate applied in the RAW nanos
    domain, BEFORE the long→TIMESTAMP_NTZ rebuild.

    Filtering the rebuilt column cannot push past the arithmetic
    (Catalyst won't invert it), so the scan would read every row group.
    Translating the bounds to int64 nanos pushes a plain range predicate
    into the parquet scan — at 100 TB this is the difference between
    pruning to the touched row groups and a full-table read.
    ``start``/``end`` are 'YYYY-MM-DD[ HH:MM:SS]' wall-clock strings,
    half-open [start, end).
    """
    import datetime as _dt

    def _nanos(s: str) -> int:
        fmt = "%Y-%m-%d %H:%M:%S" if " " in s else "%Y-%m-%d"
        d = _dt.datetime.strptime(s, fmt)
        return int((d - _dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000_000

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        if start is not None:
            df = df.filter(F.col("ts") >= F.lit(_nanos(start)))
        if end is not None:
            df = df.filter(F.col("ts") < F.lit(_nanos(end)))
        return df.withColumn("ts", _nanos_to_ntz("ts"))
    # driver stored a real timestamp column: filter on it directly
    if start is not None:
        df = df.filter(F.col("ts") >= F.lit(start).cast("timestamp_ntz"))
    if end is not None:
        df = df.filter(F.col("ts") < F.lit(end).cast("timestamp_ntz"))
    return df


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition IF the scan is under-parallel.

    Small single-file inputs (like the local test parquet) arrive as one
    split, which serializes CPU-heavy per-row stages (hashing, shingling,
    vector math) onto one core. At production scale the scan already
    yields >= cores splits and this is a no-op — the partition-count
    check makes the shuffle conditional, so wide tables never pay it.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works directly
    (mirrors the reference's Grafana→Postgres surface, SURVEY.md §3.3)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
