"""Corpus drift report between two committed versions of the corpus
group — the monitoring job a data team runs after every refresh: what
changed in composition (per-source document/token deltas) and how far
the token DISTRIBUTION moved (Jensen-Shannon divergence over hashed
unigram buckets, the symmetric/bounded divergence drift monitors use).

Built on the manifest group's time travel (sinks/manifest_table.py):
both versions resolve to immutable file lists, so the report is
reproducible forever and never blocks or sees a concurrent writer.
The distribution side reuses the DSIR bucket convention (first 8 md5
hex digits mod DSIR_BUCKETS) — bucket tables are 4096 rows regardless
of corpus size, so the divergence join is index-sized at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..plans.catalog_corpus import DSIR_BUCKETS
from ..sinks import manifest_table
from .neardup_ingest import CORPUS_SUB


def _bucket_counts(docs: DataFrame) -> DataFrame:
    bucket = F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast(
        "long"
    ) % F.lit(DSIR_BUCKETS)
    return (
        docs.select(F.explode(T.words(F.col("text"))).alias("w"))
        .select(bucket.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def corpus_drift_report(
    spark: SparkSession,
    group_root: str,
    version_old: int,
    version_new: int | None = None,
) -> dict:
    """Compare two committed corpus versions. Returns
    {per_source: [(source, docs_old, docs_new, delta)...],
     docs_old, docs_new, token_js_divergence}.

    ``version_new=None`` means the live version. JS divergence is
    computed driver-side over the two 4096-row bucket tables (collected
    — index-sized by construction); 0 = identical distributions,
    ln(2) = disjoint."""
    import math

    old = manifest_table.group_read(spark, group_root, CORPUS_SUB, version_old)
    new = manifest_table.group_read(spark, group_root, CORPUS_SUB, version_new)
    if old is None or new is None:
        raise FileNotFoundError(
            f"corpus group {group_root} lacks a committed corpus at the "
            f"requested versions ({version_old} -> {version_new})"
        )

    def per_source(df: DataFrame) -> dict:
        if "source" not in df.columns:
            return {"all": df.count()}
        return {
            r["source"]: r["n"]
            for r in df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    src_old, src_new = per_source(old), per_source(new)
    rows = [
        (s, src_old.get(s, 0), src_new.get(s, 0), src_new.get(s, 0) - src_old.get(s, 0))
        for s in sorted(set(src_old) | set(src_new))
    ]

    c_old = {r["b"]: r["n"] for r in _bucket_counts(old).collect()}
    c_new = {r["b"]: r["n"] for r in _bucket_counts(new).collect()}
    t_old, t_new = sum(c_old.values()) or 1, sum(c_new.values()) or 1
    js = 0.0
    for b in set(c_old) | set(c_new):
        p = c_old.get(b, 0) / t_old
        q = c_new.get(b, 0) / t_new
        m = (p + q) / 2
        if p:
            js += 0.5 * p * math.log(p / m)
        if q:
            js += 0.5 * q * math.log(q / m)
    return {
        "per_source": rows,
        "docs_old": sum(src_old.values()),
        "docs_new": sum(src_new.values()),
        "token_js_divergence": round(js, 6),
    }
