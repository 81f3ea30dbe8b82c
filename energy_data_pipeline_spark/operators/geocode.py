"""P17 — geocoding cascade as a deterministic broadcast-dim pipeline.

The reference resolves plant coordinates through a fallback cascade
(pv_test/init_db.py:145-177): (1) fuzzy name containment against a
hardcoded coordinate table, (2) city extracted from the address by
regex (init_db.py:84-96) and looked up in the same table, (3) live
geocoding APIs (Kakao → Nominatim), (4) a country-center default.

Stages 1, 2 and 4 are pure functions of the row + a tiny dimension and
run engine-side as broadcast joins — at any corpus size the coordinate
dim is human-curated and broadcastable by construction. Stage 3 is an
external service; it enters as an optional pre-resolved DataFrame
(address → lat/lon) produced by whatever transport the deployment uses
(rest.py's fetcher pattern), keeping the API boundary out of the plan
exactly like the reference keeps it out of its SQL.

The output carries ``geocode_source`` ('name' | 'city' | 'external' |
'default') so downstream QA can audit which stage resolved each row —
the reference prints the same provenance per lookup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# the reference's final fallback: South Korea's centroid (init_db.py:177)
DEFAULT_LAT = 35.9078
DEFAULT_LON = 127.7669


def geocode_cascade(
    df: DataFrame,
    id_col: str,
    name_col: str,
    address_col: str,
    name_dim: DataFrame,
    city_dim: DataFrame,
    city_pattern: str,
    resolved: DataFrame | None = None,
    normalize: "F.Column | None" = None,
    default_lat: float = DEFAULT_LAT,
    default_lon: float = DEFAULT_LON,
) -> DataFrame:
    """Resolve (lat, lon, geocode_source) for every row of ``df``.

    - ``name_dim``: (prio, key, lat, lon) — bidirectional-containment
      match on the (optionally normalized) name; first hit by ``prio``
      mirrors the reference's dict-iteration precedence.
    - ``city_dim``: (city, lat, lon) — equi-join on the first
      ``city_pattern`` regex group extracted from the address.
    - ``resolved``: optional (address, lat, lon) from an external
      geocoder run; joined on the raw address string.
    - anything still unresolved gets the default coordinates.
    """
    name_expr: Column = (
        normalize if normalize is not None else F.col(name_col)
    )
    src = df.withColumn("_gname", name_expr)

    hits = (
        src.select(id_col, "_gname")
        .crossJoin(F.broadcast(name_dim))
        .filter(
            F.col("_gname").contains(F.col("key"))
            | F.col("key").contains(F.col("_gname"))
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("prio"))
            ),
        )
        .filter(F.col("_rk") == 1)
        .select(
            F.col(id_col),
            F.col("lat").alias("_nlat"),
            F.col("lon").alias("_nlon"),
        )
    )

    out = (
        src.join(hits, id_col, "left")
        .withColumn(
            "_city", F.nullif(F.regexp_extract(F.col(address_col), city_pattern, 1), F.lit(""))
        )
        .join(
            F.broadcast(
                city_dim.select(
                    F.col("city").alias("_city"),
                    F.col("lat").alias("_clat"),
                    F.col("lon").alias("_clon"),
                )
            ),
            "_city",
            "left",
        )
    )
    if resolved is not None:
        out = out.join(
            resolved.select(
                F.col("address").alias("_raddr"),
                F.col("lat").alias("_rlat"),
                F.col("lon").alias("_rlon"),
            ),
            out[address_col] == F.col("_raddr"),
            "left",
        )
    else:
        out = out.withColumn("_rlat", F.lit(None).cast("double")).withColumn(
            "_rlon", F.lit(None).cast("double")
        )

    source = (
        F.when(F.col("_nlat").isNotNull(), F.lit("name"))
        .when(F.col("_clat").isNotNull(), F.lit("city"))
        .when(F.col("_rlat").isNotNull(), F.lit("external"))
        .otherwise(F.lit("default"))
    )
    return out.select(
        *[F.col(c) for c in df.columns],
        F.coalesce("_nlat", "_clat", "_rlat", F.lit(default_lat)).alias("lat"),
        F.coalesce("_nlon", "_clon", "_rlon", F.lit(default_lon)).alias("lon"),
        source.alias("geocode_source"),
    )
