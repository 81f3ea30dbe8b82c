"""Flow orchestration twin of the reference's Prefect layer.

The reference deploys @task/@flow compositions with per-task retries and
cron-scheduled deployments (prefect_flows/prefect_pipeline.py:27-100,
prefect_flows/deploy.py:135-210). The engine's version keeps exactly the
semantics that affect data correctness and leaves the execution platform
pluggable:

- ``Task``: named callable + upstream dependencies + retry policy
  (retries / retry_delay_s — the reference uses retries=3,
  delay=300 for collection, retries=2 for processing).
- ``Flow.run``: topological execution; each task receives its upstream
  results by name; per-task retry with delay; a failed task (after
  retries) marks its downstream tasks SKIPPED and the flow FAILED —
  partial results stay visible in the report for operational triage.
- ``FlowRegistry`` + ``cron_due``: deployment metadata (cron, tags) and
  a due-check against a last-run watermark, so any external ticker
  (cron, systemd timers, Airflow, Prefect) can drive flows with one
  call — ``registry.run_due(now, last_runs)``.

Idempotency is the consistency model, not the scheduler: flows compose
the engine's K4/K5 writers, so re-running a due flow (double tick, crash
mid-flow, manual backfill) converges to the same table state. That is
the property the reference relies on across cron ticks, made explicit.
"""

from __future__ import annotations

import datetime as dt
import time
from collections.abc import Callable, Iterable, Mapping
from dataclasses import dataclass, field


class FlowError(RuntimeError):
    """A task exhausted its retries; the flow result carries the report."""


@dataclass
class Task:
    name: str
    fn: Callable[..., object]
    depends_on: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_s: float = 0.0


@dataclass
class TaskReport:
    status: str  # OK | FAILED | SKIPPED
    attempts: int
    seconds: float
    error: str | None = None


@dataclass
class Flow:
    name: str
    tasks: list[Task] = field(default_factory=list)

    def task(
        self,
        name: str,
        depends_on: Iterable[str] = (),
        retries: int = 0,
        retry_delay_s: float = 0.0,
    ):
        """Decorator registration, Prefect-style."""

        def wrap(fn: Callable[..., object]) -> Callable[..., object]:
            self.tasks.append(
                Task(name, fn, tuple(depends_on), retries, retry_delay_s)
            )
            return fn

        return wrap

    def _topo_order(self) -> list[Task]:
        by_name = {t.name: t for t in self.tasks}
        for t in self.tasks:
            missing = [d for d in t.depends_on if d not in by_name]
            if missing:
                raise ValueError(f"task {t.name!r} depends on unknown {missing}")
        order: list[Task] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(t: Task) -> None:
            if t.name in seen:
                return
            if t.name in visiting:
                raise ValueError(f"dependency cycle through {t.name!r}")
            visiting.add(t.name)
            for d in t.depends_on:
                visit(by_name[d])
            visiting.discard(t.name)
            seen.add(t.name)
            order.append(t)

        for t in self.tasks:
            visit(t)
        return order

    def run(self, **params) -> dict:
        """Execute the DAG; returns {"status", "tasks": {name: TaskReport},
        "results": {name: value}}. ``params`` are passed to every task
        that declares them (by keyword name), alongside upstream results
        (by task name)."""
        import inspect

        reports: dict[str, TaskReport] = {}
        results: dict[str, object] = {}
        failed: set[str] = set()
        for t in self._topo_order():
            if any(d in failed or reports[d].status == "SKIPPED" for d in t.depends_on):
                reports[t.name] = TaskReport("SKIPPED", 0, 0.0)
                continue
            sig = inspect.signature(t.fn)
            kwargs = {
                k: v
                for k, v in {**params, **results}.items()
                if k in sig.parameters
            }
            t0 = time.perf_counter()
            err: str | None = None
            for attempt in range(t.retries + 1):
                try:
                    results[t.name] = t.fn(**kwargs)
                    err = None
                    break
                except Exception as e:  # noqa: BLE001 — retry boundary
                    err = f"{type(e).__name__}: {e}"
                    if attempt < t.retries and t.retry_delay_s:
                        time.sleep(t.retry_delay_s)
            secs = round(time.perf_counter() - t0, 3)
            if err is None:
                reports[t.name] = TaskReport("OK", attempt + 1, secs)
            else:
                reports[t.name] = TaskReport("FAILED", t.retries + 1, secs, err)
                failed.add(t.name)
        status = "FAILED" if failed else "OK"
        return {"status": status, "tasks": reports, "results": results}


# ---------------------------------------------------------------- schedules


def _field_matches(spec: str, value: int, range_start: int = 0) -> bool:
    if spec == "*":
        return True
    for part in spec.split(","):
        if part.startswith("*/"):
            # step counts from the field's RANGE START, matching
            # standard cron: '*/2' in day-of-month fires on 1,3,5,...
            # (range starts at 1), not on even days
            if (value - range_start) % int(part[2:]) == 0:
                return True
        elif "-" in part:
            lo, hi = part.split("-", 1)
            if int(lo) <= value <= int(hi):
                return True
        elif int(part) == value:
            return True
    return False


def cron_matches(expr: str, ts: dt.datetime) -> bool:
    """5-field cron (minute hour day-of-month month day-of-week; dow
    0=Sunday) — the subset the reference's deployments use, plus lists,
    ranges and steps. Steps on the 1-based fields (day-of-month,
    month) are relative to 1, per standard cron."""
    minute, hour, dom, month, dow = expr.split()
    return (
        _field_matches(minute, ts.minute)
        and _field_matches(hour, ts.hour)
        and _field_matches(dom, ts.day, range_start=1)
        and _field_matches(month, ts.month, range_start=1)
        and _field_matches(dow, (ts.weekday() + 1) % 7)
    )


def cron_due(
    expr: str, now: dt.datetime, last_run: dt.datetime | None
) -> bool:
    """Was there a matching minute in (last_run, now]? Never-run flows
    are due iff any minute in the last 24 h matched — a bounded catch-up
    window instead of unbounded backfill."""
    start = last_run if last_run is not None else now - dt.timedelta(days=1)
    t = (start + dt.timedelta(minutes=1)).replace(second=0, microsecond=0)
    end = now.replace(second=0, microsecond=0)
    while t <= end:
        if cron_matches(expr, t):
            return True
        t += dt.timedelta(minutes=1)
    return False


PV_FETCH_SCHEMA = (
    "ymd string, gencd string, hogi int, plant_name string, "
    + ", ".join(f"qhorgen{h:02d} double" for h in range(1, 25))
)
WEATHER_FETCH_SCHEMA = "station string, tm string, ta double, hm double"


def reference_deployments(
    spark,
    base_dir: str,
    dates: list[str],
    pv_units: list[tuple[str, int]],
    stations: list[str],
    pv_fetcher: Callable[[dict], list[object]] | None = None,
    weather_fetcher: Callable[[dict], list[object]] | None = None,
) -> "FlowRegistry":
    """The reference's three deployments as engine flows
    (deploy.py:135-210): daily weather at 09:00, monthly PV on day 10
    at 10:00, and a manual-only full ETL chaining both. Fetchers are
    pluggable (fakes by default, real transports in production); every
    load step is a K4/K5 idempotent writer, so double ticks and crash
    retries converge."""
    from pyspark.sql import functions as F

    from ..sources.rest import (
        fake_pv_fetcher,
        fake_weather_fetcher,
        fetch_task_table,
        run_fetch,
    )
    from .pv_ingest import daily_pv_job
    from .weather_etl import weather_etl_job

    pv_fetch = pv_fetcher or fake_pv_fetcher
    wx_fetch = weather_fetcher or fake_weather_fetcher

    def collect_pv():
        tasks = fetch_task_table(spark, dates, pv_units)
        return run_fetch(tasks, pv_fetch, PV_FETCH_SCHEMA, retries=3)

    def load_pv(collect_pv):
        return daily_pv_job(collect_pv, f"{base_dir}/pv_generation")

    def collect_weather():
        rows = [(d, s) for d in dates for s in stations]
        tasks = spark.createDataFrame(rows, "ymd string, station string")
        return run_fetch(tasks, wx_fetch, WEATHER_FETCH_SCHEMA, retries=3)

    def etl_weather(collect_weather):
        raw = collect_weather.withColumn(
            "tm", F.col("tm").cast("timestamp_ntz")
        )
        return weather_etl_job(
            raw, f"{base_dir}/weather_all", station_col="station"
        )

    weather = Flow("daily-weather-collection")
    weather.task("collect_weather", retries=1)(collect_weather)
    weather.task("etl_weather", depends_on=["collect_weather"])(etl_weather)

    pv = Flow("monthly-pv-collection")
    pv.task("collect_pv", retries=1)(collect_pv)
    pv.task("load_pv", depends_on=["collect_pv"])(load_pv)

    full = Flow("full-etl")
    full.task("collect_weather", retries=1)(collect_weather)
    full.task("etl_weather", depends_on=["collect_weather"])(etl_weather)
    full.task("collect_pv", retries=1)(collect_pv)
    full.task("load_pv", depends_on=["collect_pv"])(load_pv)

    reg = FlowRegistry()
    reg.register(
        "daily-weather-collection", weather, cron="0 9 * * *", tags=["weather", "daily"]
    )
    reg.register(
        "monthly-pv-collection", pv, cron="0 10 10 * *", tags=["pv", "monthly"]
    )
    reg.register("full-etl", full, cron=None, tags=["etl", "full", "manual"])
    return reg


@dataclass
class Deployment:
    flow: Flow
    cron: str | None = None  # None = manual-only (reference's full-etl)
    tags: tuple[str, ...] = ()
    params: dict = field(default_factory=dict)


class FlowRegistry:
    """Named deployments + one-call driving from any external ticker."""

    def __init__(self) -> None:
        self._deployments: dict[str, Deployment] = {}

    def register(
        self,
        name: str,
        flow: Flow,
        cron: str | None = None,
        tags: Iterable[str] = (),
        **params,
    ) -> None:
        self._deployments[name] = Deployment(flow, cron, tuple(tags), params)

    def names(self) -> list[str]:
        return sorted(self._deployments)

    def run(self, name: str, **overrides) -> dict:
        d = self._deployments[name]
        return d.flow.run(**{**d.params, **overrides})

    def run_due(
        self,
        now: dt.datetime,
        last_runs: Mapping[str, dt.datetime | None],
    ) -> dict[str, dict]:
        """Run every cron deployment due since its last run; returns
        {name: flow report}. Manual-only deployments never auto-run."""
        out: dict[str, dict] = {}
        for name, d in sorted(self._deployments.items()):
            if d.cron is None:
                continue
            if cron_due(d.cron, now, last_runs.get(name)):
                out[name] = self.run(name)
        return out
