from .analytics import dashboard_queries, serve_dashboard
from .corpus_ingest import corpus_ingest_job
from .corpus_refresh import corpus_deployments, corpus_refresh_flow
from .neardup_ingest import near_dup_ingest_job
from .orchestrate import Flow, FlowRegistry, cron_due, reference_deployments
from .pv_ingest import daily_pv_job
from .wind_ingest import add_unit_suffix, wind_ingest_job
from .weather_etl import weather_etl_job

__all__ = [
    "Flow",
    "FlowRegistry",
    "add_unit_suffix",
    "corpus_deployments",
    "corpus_ingest_job",
    "corpus_refresh_flow",
    "cron_due",
    "daily_pv_job",
    "near_dup_ingest_job",
    "dashboard_queries",
    "reference_deployments",
    "serve_dashboard",
    "weather_etl_job",
    "wind_ingest_job",
]
