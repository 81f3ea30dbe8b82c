"""Mergeable sketch primitives: HyperLogLog registers and their merge.

The property that matters at 100 TB is MERGEABILITY: HLL registers
combine by MAX, so per-partition (or per-micro-batch) partial register
tables merge into one global sketch without revisiting data — the same
algebra Spark's own approx_count_distinct uses internally, materialized
here as an explicit (bucket, rho) table so it can be persisted,
streamed into, and audited.

Hashing is md5-derived (never a seeded JVM hash), so the register table
— and therefore the estimate — is bit-identical across engines and
across batch/streaming executions of the same data. 60 hash bits split
8/52 with BIT operations only: float division past 2^53 silently loses
low bits and would corrupt buckets.

References: Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (2007); the linear
counting small-range correction follows the original paper's E ≤ 2.5m
rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 256  # registers (p = 8 bucket bits); std error ≈ 1.04/√m ≈ 6.5%
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_hash(key: Column) -> Column:
    """60-bit md5-derived hash of the key's string form (15 hex chars —
    fits a signed long with headroom)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("long")


def hll_bucket(hv: Column) -> Column:
    """Low 8 bits → register index (bit op, never modulo-on-float)."""
    return hv.bitwiseAND(F.lit(HLL_M - 1))


def hll_rho(hv: Column) -> Column:
    """Position of the leftmost 1-bit in the remaining 52 hash bits,
    1-based from the MSB side: rho = 52 − bit_length(w) + 1. The all-
    zeros word maps to 53 (every bit counted plus the sentinel)."""
    w = F.shiftright(hv, 8)
    return F.when(w == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(w)))


def hll_registers(
    df: DataFrame, key_col: str, with_key_counts: bool = False
) -> DataFrame:
    """(bucket, rho) partial registers for the keys in ``df`` — ≤ m rows
    regardless of input volume. ``with_key_counts`` adds the per-bucket
    distinct-key count (the exact-count audit column; batch only —
    counts are NOT mergeable across overlapping key sets, registers
    are)."""
    hv = hll_hash(F.col(key_col))
    keyed = df.select(F.col(key_col)).distinct().select(hv.alias("hv"))
    aggs = [F.max(hll_rho(F.col("hv"))).alias("rho")]
    if with_key_counts:
        aggs.append(F.count(F.lit(1)).alias("n_keys"))
    return keyed.groupBy(hll_bucket(F.col("hv")).alias("bucket")).agg(*aggs)


def merge_registers(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """MAX-merge two register tables — the HLL combine operation. Both
    inputs are ≤ m rows; the merge is a toy-sized groupBy."""
    return (
        existing.select("bucket", "rho")
        .unionByName(delta.select("bucket", "rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(reg: DataFrame) -> DataFrame:
    """One-row estimate from a register table: the harmonic-mean raw
    estimator with the linear-counting small-range correction. The
    harmonic sum adds exact powers of two (all within double's 53-bit
    window at realistic rho), so summation order cannot change it."""
    m = float(HLL_M)
    agg = reg.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
        F.count(F.lit(1)).cast("double").alias("used"),
    )
    raw = (
        F.lit(HLL_ALPHA) * m * m / (F.col("s_present") + (m - F.col("used")))
    )
    est = F.when(
        (raw <= 2.5 * m) & (F.col("used") < m),
        F.lit(m) * F.log(F.lit(m) / (m - F.col("used"))),
    ).otherwise(raw)
    return agg.select(
        F.col("used").cast("bigint").alias("n_registers_used"),
        est.alias("hll_estimate"),
    )


def cms_bucket(row_i: Column, key: Column, w: int) -> Column:
    """Count-Min bucket for hash row ``row_i`` and ``key`` — md5 of
    "row:key" truncated to 32 bits, mod the table width. THE single
    definition shared by the batch sketch (sk_cms_heavy_hitters), the
    streaming counter sink and the point-query server: those three are
    only correct if they hash bit-identically, so none may inline its
    own copy. Keys hash by their engine CAST-to-string form."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        row_i.cast("string"), F.lit(":"), key.cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(w)
    )


def binned_quantile_estimates(
    hist: DataFrame, qs, lo: float, hi: float, bins: int
) -> DataFrame:
    """(quantile, estimate) from a fixed-width (bin, cnt) histogram via
    covering-bin linear interpolation: the first bin whose cumulative
    mass reaches q·n supplies ``lo + width·(bin + (q·n − cum_prev)/cnt)``
    with n the histogram's own total mass. THE single definition shared
    by the batch sk_binned_quantiles and the streaming
    histogram_quantiles server — the batch/streaming convergence
    guarantee only holds while both interpolate identically. The
    windows run over ≤ ``bins`` rows by construction."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    width = (hi - lo) / float(bins)
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = hist.select(
        "bin",
        F.col("cnt").cast("double").alias("cnt"),
        F.sum(F.col("cnt").cast("double")).over(w_cum).alias("cum"),
        F.sum(F.col("cnt").cast("double")).over(w_all).alias("n"),
    )
    q_df = spark.createDataFrame([(float(q),) for q in qs], "q double")
    est = F.lit(lo) + F.lit(width) * (
        F.col("bin")
        + (F.col("q") * F.col("n") - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
    )
    return (
        F.broadcast(q_df)
        .join(cum, F.col("cum") >= F.col("q") * F.col("n"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("q").orderBy("bin")),
        )
        .filter(F.col("rn") == 1)
        .select(F.col("q").alias("quantile"), est.alias("estimate"))
        .orderBy("quantile")
    )
