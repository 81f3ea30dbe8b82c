"""Tests for the REST task-table plumbing (S5-S8/S11) and the full
fetch→transform→load pipeline wired through daily_pv_job."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_data_pipeline_spark.jobs import daily_pv_job
from energy_data_pipeline_spark.sources.rest import (
    fake_pv_fetcher,
    fake_weather_fetcher,
    fetch_task_table,
    paginated_fetch,
    probe_start_date,
    run_fetch,
)

PV_SCHEMA = (
    "ymd string, gencd string, hogi int, plant_name string, "
    + ", ".join(f"qhorgen{h:02d} double" for h in range(1, 25))
)


def test_run_fetch_shapes_and_determinism(spark):
    tasks = fetch_task_table(spark, ["20240101", "20240102"], [("G1", 1), ("G2", 1)])
    assert tasks.count() == 4
    wide = run_fetch(tasks, fake_pv_fetcher, PV_SCHEMA)
    rows = wide.collect()
    assert len(rows) == 4
    again = run_fetch(tasks, fake_pv_fetcher, PV_SCHEMA).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
    # PV shape: zero generation at night hours
    assert all(r["qhorgen01"] == 0.0 and r["qhorgen24"] == 0.0 for r in rows)


def test_run_fetch_retries_then_skips(spark):
    attempts: dict = {}

    def flaky(task):
        # fails forever for G2; succeeds for others
        if task["gencd"] == "G2":
            raise RuntimeError("boom")
        return fake_pv_fetcher(task)

    tasks = fetch_task_table(spark, ["20240101"], [("G1", 1), ("G2", 1)])
    out = run_fetch(tasks, flaky, PV_SCHEMA, retries=2)
    got = out.select("gencd").distinct().collect()
    assert [r["gencd"] for r in got] == ["G1"]  # failed task dropped, stage survives


def test_paginated_fetch_stops_on_empty_page(spark):
    pages = {1: [{"a": 1}, {"a": 2}], 2: [{"a": 3}], 3: []}

    def fetch_page(p):
        return pages.get(p, [])

    df = paginated_fetch(spark, fetch_page, "a long")
    assert sorted(r["a"] for r in df.collect()) == [1, 2, 3]


def test_probe_start_date_descends():
    calls = []

    def exists(d: str) -> bool:
        calls.append(d)
        return d >= "20190415"

    assert probe_start_date(exists) == "20190415"
    # coarse-to-fine: far fewer probes than scanning every day since 2015
    assert len(calls) < 80


def test_fetch_to_load_end_to_end(spark, tmp_path):
    """S5 → R1 unpivot → P8 ts → K4 overwrite: the reference's flow 3.1
    hermetically, with the fake fetcher standing in for HTTP."""
    path = str(tmp_path / "pv")
    tasks = fetch_task_table(
        spark, ["20240101", "20240102"], [("G1", 1), ("G1", 2), ("G2", 1)]
    )
    wide = run_fetch(tasks, fake_pv_fetcher, PV_SCHEMA)
    stats = daily_pv_job(wide, path)
    assert stats["rows_in_batch"] == 2 * 3 * 24
    out = spark.read.parquet(path)
    per = out.groupBy("gencd", "hogi", F.to_date("datetime").alias("d")).count()
    assert all(r["count"] == 24 for r in per.collect())
    # idempotent re-run
    stats2 = daily_pv_job(run_fetch(tasks, fake_pv_fetcher, PV_SCHEMA), path)
    assert stats2["rows_in_table"] == stats["rows_in_table"]


def test_fake_weather_fetcher_shape(spark):
    tasks = spark.createDataFrame(
        [("20240301", "seoul"), ("20240301", "busan")], "ymd string, station string"
    )
    out = run_fetch(
        tasks, fake_weather_fetcher, "station string, tm string, ta double, hm double"
    )
    assert out.count() == 48
    assert out.select("station").distinct().count() == 2
