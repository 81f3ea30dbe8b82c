"""Interactive analytics surface — the reference's flow 3.3 (Grafana
panels firing raw SQL at Postgres, docker/grafana/dashboards/*.json).

Catalyst replaces Postgres: the panel queries run verbatim-ish through
``spark.sql`` over registered views. Each panel is kept as a named SQL
string so the serving layer stays declarative (predicate pushdown,
partition pruning, AQE all apply)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import register_views

# Panel SQL over the synthetic star schema, shaped like the reference's
# dashboards: time-bucketed sums, window totals, top-K, entity counts
# (pv_dashboard.json:211,296,364; pv_test dashboards panels 10-21).
DASHBOARD_PANELS: dict[str, str] = {
    "hourly_generation_timeseries": """
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS time,
               event_type, SUM(value) AS total
        FROM events
        WHERE ts >= TIMESTAMP_NTZ '2024-01-01 00:00:00'
          AND ts <  TIMESTAMP_NTZ '2024-02-01 00:00:00'
        GROUP BY 1, 2 ORDER BY time
    """,
    "window_total_stat": """
        SELECT SUM(value) AS total FROM events
        WHERE ts >= TIMESTAMP_NTZ '2024-01-01 00:00:00'
          AND ts <  TIMESTAMP_NTZ '2024-02-01 00:00:00'
    """,
    "top10_entities": """
        SELECT user_id, SUM(value) AS total FROM events
        GROUP BY user_id ORDER BY total DESC, user_id LIMIT 10
    """,
    "active_entity_count": """
        SELECT COUNT(DISTINCT user_id) AS n_entities FROM events
    """,
    "daily_total_30d": """
        SELECT CAST(ts AS DATE) AS day, SUM(value) AS total FROM events
        WHERE ts >= TIMESTAMP_NTZ '2024-01-01 00:00:00'
        GROUP BY 1 ORDER BY day
    """,
}


def dashboard_queries() -> dict[str, str]:
    return dict(DASHBOARD_PANELS)


def serve_dashboard(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register the table views and return each panel's DataFrame
    (lazily planned; callers collect per panel exactly like Grafana's
    per-panel refresh)."""
    register_views(spark, sf_dir)
    return {name: spark.sql(sql) for name, sql in DASHBOARD_PANELS.items()}
