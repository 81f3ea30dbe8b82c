"""REST-source plumbing — SURVEY.md §2.1 S5–S8/S11, re-expressed as the
scalable Spark pattern: a small *task table* (one row per fetch unit)
fanned out with ``mapInPandas``, so hundreds of thousands of API calls
parallelize across executors with retry/backoff per task.

The reference fetches driver-side in asyncio loops
(daily_pv_automation.py:129-164, collect_asos.py:47-119,
namdong_wind_collect.py:39-97). That caps throughput at one process; the
task-table form keeps the same per-call semantics (pacing, retries,
pagination) but scales horizontally and restarts cleanly (the task table
is just a DataFrame — join it anti against already-loaded keys to resume,
T6-style).

Network calls are pluggable: pass any ``fetcher(task_row) -> list[dict]``.
``fake_pv_fetcher`` / ``fake_weather_fetcher`` are deterministic stand-ins
(seeded by task key) so the full pipeline is testable hermetically — the
real HTTP fetchers are environment-specific and stay out of the engine.
"""

from __future__ import annotations

import time
import zlib
from collections.abc import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..shipping import ensure_worker_imports


def fetch_task_table(
    spark: SparkSession,
    dates: Sequence[str],
    units: Sequence[tuple[str, int]],
) -> DataFrame:
    """S5's work list: one row per (date, gencd, hogi) fetch unit."""
    rows = [(d, g, h) for d in dates for (g, h) in units]
    return spark.createDataFrame(rows, "ymd string, gencd string, hogi int")


def run_fetch(
    tasks: DataFrame,
    fetcher: Callable[[dict], list[dict]],
    result_schema: str,
    retries: int = 3,
    backoff_s: float = 0.0,
) -> DataFrame:
    """Execute ``fetcher`` for every task row, Arrow-batched.

    Retry-with-backoff per task (collect_asos.py:47-104 semantics: 3
    tries, pause between); a task that still fails yields no rows rather
    than failing the stage — the anti-join resume loop re-plans it next
    run, which is the reference's behavior across cron ticks.
    """
    ensure_worker_imports(tasks.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for task in pdf.to_dict("records"):
                for attempt in range(retries):
                    try:
                        out.extend(fetcher(task))
                        break
                    except Exception:
                        if attempt + 1 < retries and backoff_s:
                            time.sleep(backoff_s)
            if out:
                yield pd.DataFrame(out)

    return tasks.mapInPandas(run, schema=result_schema)


def paginated_fetch(
    spark: SparkSession,
    page_fetcher: Callable[[int], list[dict]],
    schema: str,
    max_pages: int = 1000,
) -> DataFrame:
    """S7 — driver-side page loop until an empty page (the page sequence
    is inherently serial; each page's payload is small). Tolerant of the
    reference's quirks by delegating payload parsing to ``page_fetcher``
    (namdong_wind_collect.py:82 'reponse' typo handling lives there)."""
    rows: list[dict] = []
    for page in range(1, max_pages + 1):
        batch = page_fetcher(page)
        if not batch:
            break
        rows.extend(batch)
    return spark.createDataFrame(pd.DataFrame(rows)) if rows else spark.createDataFrame([], schema)


def probe_start_date(
    exists: Callable[[str], bool],
    lo_year: int = 2015,
    hi_year: int = 2026,
) -> str | None:
    """S11 — find the earliest YYYYMMDD with data by coarse-to-fine
    descent (year → month → day), minimizing probe calls
    (nambu_probe_date.py:43-70). Driver-side control flow by design."""
    year = next(
        (y for y in range(lo_year, hi_year + 1) if exists(f"{y}0101") or exists(f"{y}1231")),
        None,
    )
    if year is None:
        return None
    import calendar as _cal

    for month in range(1, 13):
        last_dom = _cal.monthrange(year, month)[1]
        # probe first/mid/last: detects feeds that begin mid-month (the
        # assumption, matching the reference, is a feed that once
        # started stays continuous through the probe horizon)
        if any(
            exists(f"{year}{month:02d}{d:02d}") for d in (1, 15, last_dom)
        ):
            for day in range(1, last_dom + 1):
                d = f"{year}{month:02d}{day:02d}"
                if exists(d):
                    return d
    return None


# --- deterministic fake fetchers (hermetic tests / local runs) ------------
def fake_pv_fetcher(task: dict) -> list[dict]:
    """S5 stand-in: one wide row per (ymd, gencd, hogi) with 24 hour
    columns, seeded by the task key — same shape as the Nambu XML payload
    after parsing (daily_pv_automation.py:168-172)."""
    seed = zlib.crc32(f"{task['ymd']}|{task['gencd']}|{task['hogi']}".encode())
    rng = np.random.default_rng(seed)
    row = {
        "ymd": task["ymd"],
        "gencd": task["gencd"],
        "hogi": task["hogi"],
        "plant_name": f"plant-{task['gencd']}",
    }
    for h in range(1, 25):
        # daylight-shaped curve with noise; zero at night like real PV
        sun = max(0.0, np.sin((h - 6) / 12 * np.pi)) if 6 <= h <= 18 else 0.0
        row[f"qhorgen{h:02d}"] = round(float(sun * rng.uniform(50, 100)), 2)
    return [row]


def fake_weather_fetcher(task: dict) -> list[dict]:
    """S6 stand-in: 24 hourly rows per (date, station)."""
    seed = zlib.crc32(f"{task['ymd']}|{task['station']}".encode())
    rng = np.random.default_rng(seed)
    base_ta = rng.uniform(-5, 25)
    out = []
    for h in range(24):
        out.append(
            {
                "station": task["station"],
                "tm": f"{task['ymd'][:4]}-{task['ymd'][4:6]}-{task['ymd'][6:]} {h:02d}:00:00",
                "ta": round(float(base_ta + 5 * np.sin(h / 24 * 2 * np.pi)), 2),
                "hm": round(float(rng.uniform(30, 90)), 2),
            }
        )
    return out
