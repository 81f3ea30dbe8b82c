"""Scalar expression library — SURVEY.md §2.3 (P1–P17).

Each helper returns a Column (or a small projection helper) built purely
from ``pyspark.sql.functions`` so the whole thing stays inside
whole-stage codegen — no Python UDFs on the hot path.

Reference parity citations are to /root/reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def safe_double(col: Column | str, default: float | None = None) -> Column:
    """P6 — ``pd.to_numeric(errors='coerce')`` (+ optional ``fillna``).

    Parity: fetch_data/pv/daily_pv_automation.py:175-179. Spark's
    ``try_cast`` maps unparseable strings to NULL exactly like coerce;
    ``trim`` first because the reference's payloads carry stray spaces.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.trim(c.cast("string")).try_cast("double")
    if default is not None:
        out = F.coalesce(out, F.lit(float(default)))
    return out


def ts_from_day_hour(day: Column, hour0: Column) -> Column:
    """P8 — event timestamp = day + hour offset.

    Parity: nambu_merge_pv_data.py:88 (``ymd + pd.to_timedelta(hour,'h')``)
    and the dashboard's ``datetime + hour * INTERVAL '1 hour'``.
    """
    # timestamp_ntz keeps this pure wall-clock arithmetic — a session-tz
    # "timestamp" cast would shift DST-transition days
    return F.timestamp_add("HOUR", hour0.cast("int"), day.cast("timestamp_ntz"))


def ts_hour24_rollover(day: Column, hour1_24: Column) -> Column:
    """P9 — 1-based exclusive hour label; hour 24 → next day 00:00.

    Parity: fetch_data/wind/namdong_wind_collect.py:127-138.
    """
    # adding h hours directly IS the rollover: day + 24h = next-day 00:00
    return F.timestamp_add("HOUR", hour1_24.cast("int"), day.cast("timestamp_ntz"))


def hour_from_column_name(name_col: Column, one_based_src: bool = True, keep_one_based: bool = False) -> Column:
    """P10 — extract the hour index embedded in a wide column label
    (``qhorgen07`` → 6, ``"7시 발전량(KWh)"`` → 7).

    Parity: fetch_data/common/utils.py:18-24 (0-based),
    namdong_merge_pv_data.py:58-62 (1-based kept).
    """
    # try_cast: a digit-less label yields NULL instead of an ANSI error
    h = F.regexp_extract(name_col, r"(\d+)", 1).try_cast("int")
    if one_based_src and not keep_one_based:
        h = h - F.lit(1)
    return h


def normalize_plant_name(col: Column | str) -> Column:
    """P11 — strip boilerplate tokens / unit suffixes / whitespace, lower.

    Parity: nambu_merge_pv_data.py:16-31 and pv_test/init_db.py:75-81
    (strip ``#＃`` + trailing digits, collapse spaces, casefold).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"한국남부발전\(주\)_?|태양광발전실적|발전실적", "")
    c = F.regexp_replace(c, r"[#＃_\-]\s*\d+\s*$", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.lower(F.trim(c))


def numeric_from_spec(col: Column | str) -> Column:
    """P12 — '100.5kW' → 100.5. Parity: initial_db_ingestion.py:57-62."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"([0-9]+(?:\.[0-9]+)?)", 1).try_cast("double")


def concat_key(*cols: Column | str, sep: str = "_") -> Column:
    """P13 — string concat keys (plant + '_' + hogi).
    Parity: namdong_collect_pv.py:288."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def coalesce_from_map(col: Column, mapping: dict[str, str], fallback: Column | None = None) -> Column:
    """P14 — dict-map lookup with NULL fallback, as a literal map (small
    maps) — larger maps should be broadcast-join dims instead.
    Parity: daily_pv_automation.py:181-184."""
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    looked = F.element_at(F.create_map(*pairs), col)
    return F.coalesce(looked, fallback) if fallback is not None else looked


def clean_headers(df: DataFrame) -> DataFrame:
    """P2/S1 — normalize whitespace-mangled headers (embedded newlines,
    tabs, doubled spaces). Parity: namdong_merge_pv_data.py:13-22."""
    cleaned = [" ".join(c.split()).strip() for c in df.columns]
    return df.toDF(*cleaned)
