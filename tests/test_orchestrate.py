"""Flow-runner tests (jobs/orchestrate.py) — the engine twin of the
reference's Prefect layer (prefect_pipeline.py task/flow compositions,
deploy.py cron deployments)."""

from __future__ import annotations

import datetime as dt

import pytest

from energy_data_pipeline_spark.jobs.orchestrate import (
    Flow,
    FlowRegistry,
    cron_due,
    cron_matches,
)


def _mk_flow(fail_times=0):
    calls = {"collect": 0}
    flow = Flow("weather")

    @flow.task("collect", retries=3)
    def collect(target_date):
        calls["collect"] += 1
        if calls["collect"] <= fail_times:
            raise ConnectionError("api down")
        return [f"{target_date}:raw"]

    @flow.task("process", depends_on=["collect"])
    def process(collect):
        return [r + ":clean" for r in collect]

    @flow.task("save", depends_on=["process"])
    def save(process):
        return len(process)

    return flow, calls


def test_flow_runs_in_dependency_order_with_params():
    flow, _ = _mk_flow()
    rep = flow.run(target_date="20240105")
    assert rep["status"] == "OK"
    assert rep["results"]["save"] == 1
    assert rep["results"]["process"] == ["20240105:raw:clean"]
    assert [r.status for r in rep["tasks"].values()] == ["OK"] * 3


def test_task_retries_then_succeeds():
    flow, calls = _mk_flow(fail_times=2)
    rep = flow.run(target_date="d")
    assert rep["status"] == "OK"
    assert calls["collect"] == 3
    assert rep["tasks"]["collect"].attempts == 3


def test_failure_skips_downstream_and_marks_flow():
    flow, _ = _mk_flow(fail_times=99)  # exhausts retries
    rep = flow.run(target_date="d")
    assert rep["status"] == "FAILED"
    assert rep["tasks"]["collect"].status == "FAILED"
    assert "ConnectionError" in rep["tasks"]["collect"].error
    assert rep["tasks"]["process"].status == "SKIPPED"
    assert rep["tasks"]["save"].status == "SKIPPED"


def test_cycle_and_unknown_dep_rejected():
    flow = Flow("bad")
    flow.task("a", depends_on=["b"])(lambda: 1)
    flow.task("b", depends_on=["a"])(lambda: 2)
    with pytest.raises(ValueError):
        flow.run()
    flow2 = Flow("bad2")
    flow2.task("a", depends_on=["ghost"])(lambda: 1)
    with pytest.raises(ValueError):
        flow2.run()


def test_cron_matching_and_due_windows():
    # the reference's daily 09:00 KST schedule shape
    assert cron_matches("0 9 * * *", dt.datetime(2024, 1, 5, 9, 0))
    assert not cron_matches("0 9 * * *", dt.datetime(2024, 1, 5, 10, 0))
    # monthly day-1 and step/list/range fields
    assert cron_matches("30 3 1 * *", dt.datetime(2024, 2, 1, 3, 30))
    assert cron_matches("*/15 * * * *", dt.datetime(2024, 1, 5, 9, 45))
    assert cron_matches("0 8-10 * * 1-5", dt.datetime(2024, 1, 5, 9, 0))  # Friday
    # steps on 1-based fields count from the range start (standard
    # cron): '*/2' in day-of-month fires on 1,3,5,... not on even days
    assert cron_matches("0 0 */2 * *", dt.datetime(2024, 1, 1, 0, 0))
    assert cron_matches("0 0 */2 * *", dt.datetime(2024, 1, 3, 0, 0))
    assert not cron_matches("0 0 */2 * *", dt.datetime(2024, 1, 2, 0, 0))
    assert cron_matches("0 0 1 */3 *", dt.datetime(2024, 1, 1, 0, 0))  # Jan
    assert cron_matches("0 0 1 */3 *", dt.datetime(2024, 4, 1, 0, 0))  # Apr
    assert not cron_matches("0 0 1 */3 *", dt.datetime(2024, 3, 1, 0, 0))
    # minute steps stay 0-based
    assert cron_matches("*/15 * * * *", dt.datetime(2024, 1, 5, 9, 0))

    now = dt.datetime(2024, 1, 5, 9, 30)
    assert cron_due("0 9 * * *", now, last_run=dt.datetime(2024, 1, 5, 8, 0))
    assert not cron_due("0 9 * * *", now, last_run=dt.datetime(2024, 1, 5, 9, 5))
    # never-run: due iff a matching minute fell in the last 24h —
    # 23:00 matched yesterday (22:00 now), so it IS due; a schedule
    # whose only match is in the future is not
    assert cron_due("0 9 * * *", now, last_run=None)
    assert cron_due("0 23 * * *", dt.datetime(2024, 1, 5, 22, 0), None)
    assert not cron_due("0 9 * * *", dt.datetime(2024, 1, 5, 8, 59), dt.datetime(2024, 1, 5, 8, 0))


def test_registry_runs_due_flows_only():
    ran = []
    daily = Flow("daily")
    daily.task("t")(lambda: ran.append("daily"))
    manual = Flow("manual")
    manual.task("t")(lambda: ran.append("manual"))

    reg = FlowRegistry()
    reg.register("daily-weather", daily, cron="0 9 * * *", tags=["weather"])
    reg.register("full-etl", manual, cron=None, tags=["manual"])
    assert reg.names() == ["daily-weather", "full-etl"]

    now = dt.datetime(2024, 1, 5, 9, 30)
    out = reg.run_due(now, {"daily-weather": dt.datetime(2024, 1, 5, 8, 0)})
    assert list(out) == ["daily-weather"] and out["daily-weather"]["status"] == "OK"
    assert ran == ["daily"]  # manual-only flow untouched

    # nothing due on the second tick at the same watermark position
    out2 = reg.run_due(now, {"daily-weather": now})
    assert out2 == {}

    # manual run still available by name
    assert reg.run("full-etl")["status"] == "OK"
    assert ran == ["daily", "manual"]


def test_reference_deployments_end_to_end(spark, tmp_path):
    """The three reference deployment shapes, driven the way an external
    ticker would: the daily weather flow fires on its 09:00 cron, the
    monthly PV flow fires on day-10 10:00, full-etl only manually — and
    every load lands in the idempotent table shape the job tests pin."""
    from energy_data_pipeline_spark.jobs.orchestrate import (
        reference_deployments,
    )

    reg = reference_deployments(
        spark,
        str(tmp_path),
        dates=["20240110"],
        pv_units=[("G1", 1)],
        stations=["seoul"],
    )
    assert reg.names() == [
        "daily-weather-collection",
        "full-etl",
        "monthly-pv-collection",
    ]

    # 2024-01-10 10:30 tick, nothing has ever run: both cron flows due
    now = dt.datetime(2024, 1, 10, 10, 30)
    out = reg.run_due(now, {})
    assert sorted(out) == ["daily-weather-collection", "monthly-pv-collection"]
    assert all(r["status"] == "OK" for r in out.values())

    pv_stats = out["monthly-pv-collection"]["results"]["load_pv"]
    assert pv_stats["rows_in_table"] == 24  # 1 day x 1 unit x 24 hours
    wx_stats = out["daily-weather-collection"]["results"]["etl_weather"]
    assert wx_stats["rows_in_table"] == 24  # 1 day x 1 station x 24 hours

    # next tick one minute later: watermarks advanced, nothing due
    assert reg.run_due(
        now + dt.timedelta(minutes=1), {k: now for k in out}
    ) == {}

    # manual full-etl re-runs both chains; K4/K5 keep tables stable
    full = reg.run("full-etl")
    assert full["status"] == "OK"
    assert full["results"]["load_pv"]["rows_in_table"] == 24
    assert full["results"]["etl_weather"]["rows_in_table"] == 24


def test_corpus_refresh_flow_end_to_end(spark, tmp_path):
    """The full corpus pipeline as one flow: a crafted source with a
    quality failure, an exact dup, and a near-dup pair flows through
    gate -> purge -> {mixture, pack_plan}; every stage lands as parquet
    and the final corpus keeps exactly the canonical survivors.
    Re-running the flow converges on identical outputs (idempotent
    truncate-reload refresh)."""
    from pyspark.sql import functions as F

    from energy_data_pipeline_spark.jobs.corpus_refresh import (
        corpus_refresh_flow,
    )

    base = " ".join(f"tok{i} word{i} item{i}" for i in range(12))
    near = base.replace("tok3", "changed3")  # high-jaccard near-dup
    rows = [
        (1, base, "en", "web"),
        (2, base, "en", "web"),          # exact dup of 1 -> gate drops
        (3, near, "en", "web"),          # near-dup of 1 -> purge drops
        (4, "short", "en", "web"),       # fails min-token quality gate
        (5, " ".join(f"u{i} v{i} w{i}" for i in range(20)), "de", "api"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(src)

    out = str(tmp_path / "out")
    flow = corpus_refresh_flow(spark, src, out)
    rep = flow.run()
    assert rep["status"] == "OK", rep

    clean_ids = {r.doc_id for r in spark.read.parquet(f"{out}/clean").collect()}
    assert clean_ids == {1, 3, 5}  # 2 exact-dup dropped, 4 failed gate
    purged_ids = {r.doc_id for r in spark.read.parquet(f"{out}/purged").collect()}
    assert purged_ids == {1, 5}  # 3 purged as near-dup loser of 1
    mix = {
        (r.source, r.lang): (r.n_docs, r.n_tokens)
        for r in spark.read.parquet(f"{out}/mixture").collect()
    }
    assert mix[("web", "en")][0] == 1 and mix[("api", "de")][0] == 1
    plan = spark.read.parquet(f"{out}/pack_plan")
    assert plan.count() == 2
    assert plan.filter(F.col("seq_offset") >= 2048).count() == 0

    # idempotent refresh: re-run converges byte-for-byte on row content
    before = sorted(map(tuple, spark.read.parquet(f"{out}/purged").collect()))
    rep2 = flow.run()
    assert rep2["status"] == "OK"
    after = sorted(map(tuple, spark.read.parquet(f"{out}/purged").collect()))
    assert before == after


def test_corpus_deployment_runs_on_weekly_tick(spark, tmp_path):
    """The weekly-corpus-refresh deployment fires on its cron tick
    (Monday 03:00) and not on other ticks; the due run refreshes all
    four tables."""
    import datetime as dt

    from energy_data_pipeline_spark.jobs.corpus_refresh import (
        corpus_deployments,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, " ".join(f"a{i} b{i} c{i}" for i in range(12)), "en", "web")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(src)
    out = str(tmp_path / "out")
    reg = corpus_deployments(spark, src, out)

    # Tuesday 03:00 — not due
    assert reg.run_due(dt.datetime(2024, 1, 2, 3, 0), {}) == {}
    # Monday 03:00 — due
    reports = reg.run_due(dt.datetime(2024, 1, 1, 3, 0), {})
    assert set(reports) == {"weekly-corpus-refresh"}
    assert reports["weekly-corpus-refresh"]["status"] == "OK"
    assert spark.read.parquet(f"{out}/purged").count() == 1


def test_corpus_refresh_best_quality_keeper(spark, tmp_path):
    """keeper="best_quality" keeps the higher-quality near-dup cluster
    member where the default min_id policy keeps whichever crawled
    first — the two policies disagree on a crafted pair whose LATER doc
    is longer and stopword-richer (higher quality score)."""
    base = " ".join(f"tok{i} word{i} item{i}" for i in range(12))
    better = base + " the and of is in to"  # near-dup, higher quality
    rows = [
        (10, base, "en", "web"),
        (11, better, "en", "web"),
        (12, " ".join(f"u{i} v{i} w{i}" for i in range(20)), "de", "api"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(src)

    from energy_data_pipeline_spark.jobs.corpus_refresh import (
        corpus_refresh_flow,
    )

    out_min = str(tmp_path / "out_min")
    rep = corpus_refresh_flow(spark, src, out_min).run()
    assert rep["status"] == "OK", rep
    assert {
        r.doc_id for r in spark.read.parquet(f"{out_min}/purged").collect()
    } == {10, 12}

    out_q = str(tmp_path / "out_q")
    rep = corpus_refresh_flow(
        spark, src, out_q, keeper="best_quality"
    ).run()
    assert rep["status"] == "OK", rep
    assert {
        r.doc_id for r in spark.read.parquet(f"{out_q}/purged").collect()
    } == {11, 12}

    import pytest as _pytest

    from energy_data_pipeline_spark.jobs.corpus_refresh import (
        _cluster_losers,
    )

    with _pytest.raises(ValueError, match="keeper"):
        _cluster_losers(
            spark.read.parquet(src),
            spark.createDataFrame(
                [(1, 1)], "vertex long, cluster_id long"
            ),
            "nope",
        )
