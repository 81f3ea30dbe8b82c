"""Streaming twin of ts_rolling_zscore_anomalies: converged stream
output must row-match the batch catalog query on the same events."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from energy_data_pipeline_spark.plans.catalog import CATALOG
from energy_data_pipeline_spark.streaming.incremental import (
    EVENT_STREAM_SCHEMA,
    anomaly_stream,
    read_event_stream,
)

N_DAYS = 25
SPIKE_DAY = 20  # click volume explodes on this day


def _event_rows():
    """Deterministic two-type event stream; values are multiples of
    0.25 (exactly representable), so per-day sums are order-insensitive
    and the stream/batch compare is exact, not approximate."""
    rows = []
    i = 0
    for day in range(N_DAYS):
        for k in range(8):
            for etype in ("click", "view"):
                v = (i % 7) * 0.25 + (1.5 if etype == "view" else 0.0)
                if etype == "click" and day == SPIKE_DAY:
                    v += 200.0
                rows.append(
                    (
                        i,
                        dt.datetime(2024, 1, 1 + day, 3 * (k % 8), 15),
                        i % 5,
                        etype,
                        v,
                    )
                )
                i += 1
    return rows


def _expected(spark, tmp_path):
    sf = tmp_path / "sf"
    spark.createDataFrame(_event_rows(), EVENT_STREAM_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(sf / "events.parquet"))
    fn, _ = CATALOG["ts_rolling_zscore_anomalies"]
    return {
        (r.event_type, r.day): (
            r.day_total,
            r.n_baseline,
            r.baseline_mean,
            r.baseline_sd,
            r.zscore,
            r.is_anomaly,
        )
        for r in fn(spark, str(sf)).collect()
    }


def _run_tick(spark, landing, ckpt, name):
    collected: list = []
    q = (
        anomaly_stream(read_event_stream(spark, landing))
        .writeStream.foreachBatch(
            lambda bdf, _bid: collected.extend(bdf.collect())
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r.event_type, r.day): (
            r.day_total,
            r.n_baseline,
            r.baseline_mean,
            r.baseline_sd,
            r.zscore,
            r.is_anomaly,
        )
        for r in collected
    }


def test_anomaly_stream_matches_batch(spark, tmp_path):
    want = _expected(spark, tmp_path)
    assert want, "batch query produced no scored days"

    rows = _event_rows()
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    early = [r for r in rows if r[1].day <= 15]
    late = [r for r in rows if r[1].day > 15]
    spark.createDataFrame(early, EVENT_STREAM_SCHEMA).write.mode(
        "append"
    ).parquet(landing)
    tick1 = _run_tick(spark, landing, ckpt, "anomaly_tick1")
    # first tick scores only days whose 7-day-minimum baseline exists
    assert tick1, "tick 1 emitted nothing"
    assert max(k[1].day for k in tick1) <= 15

    spark.createDataFrame(late, EVENT_STREAM_SCHEMA).write.mode(
        "append"
    ).parquet(landing)
    tick2 = _run_tick(spark, landing, ckpt, "anomaly_tick2")

    # tick 2 emits EXACTLY the days it touched (the late batch covers
    # Jan 16-25; every scored day >= Jan 16 has a changed day in its
    # own day or trailing window, and no earlier day does) — an
    # under-emitting regression in the touched-day window would shrink
    # this set, an over-emitting one would re-send tick 1's days
    touch_start = dt.date(2024, 1, 16)
    assert set(tick2) == {k for k in want if k[1] >= touch_start}
    for k, v in tick2.items():
        assert want[k] == v, k
    assert {**tick1, **tick2} == want

    spike = dt.date(2024, 1, 1 + SPIKE_DAY)
    assert want[("click", spike)][5] is True, "spike day must flag"
    n_anom = sum(1 for v in want.values() if v[5])
    assert n_anom <= 4, f"background days must not flag ({n_anom} did)"


def test_anomaly_stream_replay_is_noop(spark, tmp_path):
    rows = _event_rows()
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(rows, EVENT_STREAM_SCHEMA).write.mode(
        "append"
    ).parquet(landing)
    first = _run_tick(spark, landing, ckpt, "anomaly_replay1")
    assert first
    # same landing dir, same checkpoint: no new files -> no emissions,
    # state unchanged (the cron-tick idempotence contract)
    again = _run_tick(spark, landing, ckpt, "anomaly_replay2")
    assert again == {}


def test_anomaly_stream_retention_never_scores_truncated_baselines(
    spark, tmp_path
):
    """With a series longer than the retention window, trimmed-away
    days must never produce a score computed over a TRUNCATED baseline
    (which would diverge from the batch query and overwrite a correct
    earlier emission in update mode)."""
    rows = []
    i = 0
    for day in range(100):  # spans well past ANOMALY_RETAIN_DAYS=64
        for k in range(4):
            rows.append(
                (
                    i,
                    dt.datetime(2024, 1, 1, 6)
                    + dt.timedelta(days=day, hours=k),
                    i % 3,
                    "click",
                    (i % 5) * 0.25,
                )
            )
            i += 1
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    early = [r for r in rows if (r[1] - dt.datetime(2024, 1, 1)).days < 70]
    late = [r for r in rows if (r[1] - dt.datetime(2024, 1, 1)).days >= 70]
    spark.createDataFrame(early, EVENT_STREAM_SCHEMA).write.mode(
        "append"
    ).parquet(landing)
    tick1 = _run_tick(spark, landing, ckpt, "anomaly_trim1")
    spark.createDataFrame(late, EVENT_STREAM_SCHEMA).write.mode(
        "append"
    ).parquet(landing)
    tick2 = _run_tick(spark, landing, ckpt, "anomaly_trim2")

    # batch truth over the full series
    sf = tmp_path / "sf"
    spark.createDataFrame(rows, EVENT_STREAM_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(sf / "events.parquet"))
    fn, _ = CATALOG["ts_rolling_zscore_anomalies"]
    want = {
        (r.event_type, r.day): (
            r.day_total,
            r.n_baseline,
            r.baseline_mean,
            r.baseline_sd,
            r.zscore,
            r.is_anomaly,
        )
        for r in fn(spark, str(sf)).collect()
    }
    # every emission from either tick matches the batch value exactly —
    # no truncated-baseline scores ever left the operator
    for name, tick in (("tick1", tick1), ("tick2", tick2)):
        assert tick, f"{name} emitted nothing"
        for k, v in tick.items():
            assert want[k] == v, (name, k)


def test_anomaly_stream_future_clock_skew_does_not_poison_state(
    spark, tmp_path
):
    """One broken-clock row (decades in the future) must not anchor the
    retention horizon: real days keep scoring as if it never arrived."""
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1 + i // 8, 3 * (i % 8)),
            i % 3,
            "click",
            (i % 7) * 0.25,
        )
        for i in range(200)  # 25 days x 8 events
    ]
    poison = [
        (999, dt.datetime(2090, 1, 1), 0, "click", 1.0),
        # months-fast clock: inside the old 366-day guard, caught by
        # the q95+30 one
        (998, dt.datetime(2024, 5, 1), 0, "click", 1.0),
    ]
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(rows + poison, EVENT_STREAM_SCHEMA).write.mode(
        "append"
    ).parquet(landing)
    got = _run_tick(spark, landing, ckpt, "anomaly_skew")
    days = sorted(k[1] for k in got)
    assert days, "real days were trimmed away by the poisoned horizon"
    assert days[0] >= dt.date(2024, 1, 8)
    assert days[-1] <= dt.date(2024, 1, 25)
    assert dt.date(2090, 1, 1) not in set(days)
