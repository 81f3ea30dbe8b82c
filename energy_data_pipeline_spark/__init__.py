"""energy_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
renewable-energy data platform (zongseung/Energy-Data-pipeline) as an
idiomatic Spark DataFrame/SQL engine, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing)
such a pipeline needs at 100 TB scale.

Layers
------
- ``session``   : SparkSession factory (timezone, AQE, shuffle sizing).
- ``sources``   : readers — parquet test tables, encoding-fallback CSV (S1).
- ``functions`` : scalar expression library (P1–P17), text & vector fns.
- ``operators`` : DataFrame→DataFrame ops — reshape (R1/R2, P9), dedup
  (O3/O4), densify (T1), gap islands (T2), impute (T3/T4), top-k (A4),
  rollups (A11), near-dup (MinHash/SimHash/Jaccard), ANN similarity.
- ``sinks``     : idempotent write protocols (K4 range-overwrite, K5 upsert,
  K6 truncate-reload).
- ``plans``     : the analytical query surface (SURVEY.md §2) as
  (spark, sf_dir) → DataFrame callables with DuckDB oracle SQL.
- ``streaming`` : incremental batch / Structured Streaming equivalents of
  the reference's cron flows (T6 watermark resume).
- ``jobs``      : end-to-end flow equivalents wiring operators together.
"""

__version__ = "0.1.0"
