"""Local replica of the driver's correctness gate: run a catalog query on
Spark AND its DuckDB oracle over the same parquet tables, compare
row-count + column names + order-insensitive values.

Values are compared after sorting columns by name and rows by their
string representation, with exact equality on the already-rounded
outputs — stricter than a tolerance compare, same spirit as the
driver's value hash.
"""

from __future__ import annotations

import math

import duckdb

from energy_data_pipeline_spark.sources.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple, dict, set, bytearray)):
        # The DRIVER canonicalizer (pandas sort_values + hash) dies on
        # non-scalar cells ("unhashable type: 'list'" — the round-8 red
        # rows). Stringifying here would let the local replica pass a
        # query the driver will fail, so refuse instead: the replica
        # must predict the driver exactly.
        raise TypeError(
            f"non-scalar result cell ({type(v).__name__}): the driver "
            "gate cannot hash array/map/struct/binary outputs — emit "
            "long form or array_join in the catalog query"
        )
    return str(v)


def _canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        out.append(tuple(_canon_cell(r[i]) for i in order))
    out.sort()
    return [c for _, c in sorted(zip(range(len(columns)), columns), key=lambda t: columns[t[0]])], out


def compare(spark_df, con, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.sql(sql)
    d_cols = res.columns
    d_types = [str(t) for t in res.types]
    d_rows = res.fetchall()

    report = {"ok": True, "issues": []}
    # The driver canonicalizes the oracle side via fetchdf(); DuckDB renders
    # int128 (HUGEINT from sum() over integer input) as float64 there, while
    # Spark emits int64 — row values match under fetchall() but the driver's
    # dtype-sensitive hash differs. Force oracles to CAST such sums to BIGINT.
    huge = [f"{c}:{t}" for c, t in zip(d_cols, d_types) if "HUGEINT" in t]
    if huge:
        report["ok"] = False
        report["issues"].append(
            f"oracle emits int128 columns (fetchdf-float64 hash hazard): {huge}; "
            "CAST(... AS BIGINT) in the oracle SQL"
        )
    if sorted(s_cols) != sorted(d_cols):
        report["ok"] = False
        report["issues"].append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return report
    if len(s_rows) != len(d_rows):
        report["ok"] = False
        report["issues"].append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    _, s_canon = _canon_rows(s_cols, s_rows)
    _, d_canon = _canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        report["ok"] = False
        diff_s = [r for r in s_canon if r not in set(d_canon)][:5]
        diff_d = [r for r in d_canon if r not in set(s_canon)][:5]
        report["issues"].append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
    return report
