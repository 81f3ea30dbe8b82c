from .analytics import dashboard_queries, serve_dashboard
from .pv_ingest import daily_pv_job
from .weather_etl import weather_etl_job

__all__ = [
    "daily_pv_job",
    "dashboard_queries",
    "serve_dashboard",
    "weather_etl_job",
]
