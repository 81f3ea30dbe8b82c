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

    # tick 2 re-scores every retained day for both keys — its output IS
    # the batch result (checkpointed state carried days 1..15 over)
    assert tick2 == want

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
