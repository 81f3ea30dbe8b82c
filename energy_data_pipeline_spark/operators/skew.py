"""Skew-mitigation operators for hot-key joins and aggregations.

AQE's skew-join splitting (on in ``session.get_spark``) handles most
runtime skew; these explicit forms cover the cases AQE cannot:
- a broadcast-ineligible dimension joined on a power-law key (salting
  spreads one hot key over ``salt_factor`` shuffle partitions);
- high-cardinality-input aggregations where a two-stage salted partial
  keeps any single reducer from owning a hot key's entire input.

Both are pure plan rewrites — results are identical to the unsalted
equivalents (tested), only the exchange layout changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_factor: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``other`` is too big to
    broadcast: salt the skewed side with a uniform random bucket and
    replicate ``other`` across all buckets, so one hot key's rows land on
    ``salt_factor`` reducers instead of one.

    Cost model: shuffles |skewed| + salt_factor·|other| rows — worth it
    iff the hot key's share would otherwise serialize the stage.

    Supports inner/left joins only: replicating ``other`` across salt
    buckets would emit salt_factor copies of unmatched right rows under
    right/full-outer semantics.
    """
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    for df_, name in ((skewed, "skewed"), (other, "other")):
        if "_salt" in df_.columns:
            raise ValueError(f"{name} input already has a _salt column")
    keys = list(on)
    salted_l = skewed.withColumn(
        "_salt", (F.rand(seed=42) * salt_factor).cast("int")
    )
    salted_r = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return salted_l.join(salted_r, keys + ["_salt"], how).drop("_salt")


def salted_agg_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_factor: int = 16,
    out_name: str = "total",
) -> DataFrame:
    """Two-stage SUM: partial per (key, salt) then final per key.

    Spark's hash aggregate already does map-side partials; the explicit
    salt stage additionally bounds the FINAL-stage input per reducer when
    a single key dominates (partial rows per key <= salt_factor)."""
    if "_salt" in df.columns:
        raise ValueError("input already has a _salt column")
    key_list = list(keys)
    partial = (
        df.withColumn("_salt", (F.rand(seed=42) * salt_factor).cast("int"))
        .groupBy(*key_list, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(*key_list).agg(F.sum("_partial").alias(out_name))
