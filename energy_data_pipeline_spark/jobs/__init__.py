from .analytics import dashboard_queries, serve_dashboard
from .pv_ingest import daily_pv_job
from .wind_ingest import add_unit_suffix, wind_ingest_job
from .weather_etl import weather_etl_job

__all__ = [
    "add_unit_suffix",
    "daily_pv_job",
    "dashboard_queries",
    "serve_dashboard",
    "weather_etl_job",
    "wind_ingest_job",
]
