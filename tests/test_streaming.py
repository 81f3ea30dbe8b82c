"""Structured Streaming semantics tests: AvailableNow incremental ingest,
watermarked hourly aggregation, foreachBatch upsert idempotency, and the
stateful per-key watermark operator."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from energy_data_pipeline_spark.streaming import (
    available_now_ingest,
    dedup_stream,
    hourly_aggregate_stream,
    read_event_stream,
    running_watermark_stream,
    session_stream,
    upsert_stream,
)
from energy_data_pipeline_spark.streaming.incremental import EVENT_STREAM_SCHEMA


def _mk_batch(spark, rows):
    data = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, v)
        for (i, m, u, t, v) in rows
    ]
    return spark.createDataFrame(data, EVENT_STREAM_SCHEMA)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "landing": str(tmp_path / "landing"),
        "sink": str(tmp_path / "sink"),
        "ckpt": str(tmp_path / "ckpt"),
        "table": str(tmp_path / "table"),
    }
    return d


def test_available_now_ingest_is_incremental(spark, dirs):
    b1 = _mk_batch(spark, [(1, 0, 10, "click", 1.0), (2, 61, 10, "view", 2.0)])
    b1.write.mode("append").parquet(dirs["landing"])

    stream = read_event_stream(spark, dirs["landing"])
    available_now_ingest(stream, dirs["sink"], dirs["ckpt"])
    assert spark.read.parquet(dirs["sink"]).count() == 2

    # second cron tick: only the NEW file is processed (checkpointed)
    b2 = _mk_batch(spark, [(3, 120, 11, "click", 3.0)])
    b2.write.mode("append").parquet(dirs["landing"])
    stream = read_event_stream(spark, dirs["landing"])
    available_now_ingest(stream, dirs["sink"], dirs["ckpt"])
    out = spark.read.parquet(dirs["sink"])
    assert out.count() == 3
    assert out.select("event_id").distinct().count() == 3


def test_hourly_aggregate_stream_matches_batch(spark, dirs):
    rows = [(i, i * 7, i % 3, "click" if i % 2 else "view", float(i)) for i in range(40)]
    _mk_batch(spark, rows).write.mode("append").parquet(dirs["landing"])

    stream = read_event_stream(spark, dirs["landing"])
    agg = hourly_aggregate_stream(stream, watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_agg")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["hour_start"], r["event_type"]): (r["total_value"], r["n_events"])
        for r in spark.sql("select * from hourly_agg").collect()
    }
    batch = (
        _mk_batch(spark, rows)
        .groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp"))
            .cast("timestamp_ntz")
            .alias("hour_start"),
            "event_type",
        )
        .agg(F.sum("value").alias("tv"), F.count(F.lit(1)).alias("n"))
    )
    want_all = {
        (r["hour_start"], r["event_type"]): (r["tv"], r["n"]) for r in batch.collect()
    }
    # append mode emits only windows closed by the final watermark; every
    # emitted window must match the batch result exactly
    assert got, "no windows emitted"
    for k, v in got.items():
        assert want_all[k] == v


def test_session_stream_matches_batch_sessionize(spark, dirs):
    # user 10: one session at minutes 0-20, another at 120-130;
    # user 11: a single event at 5; a far tail event at 300 keeps the
    # watermark ahead so all earlier sessions close and emit
    rows = [
        (1, 0, 10, "click", 1.0),
        (2, 10, 10, "view", 1.0),
        (3, 20, 10, "click", 1.0),
        (4, 120, 10, "click", 1.0),
        (5, 130, 10, "view", 1.0),
        (6, 5, 11, "click", 1.0),
        (7, 300, 11, "view", 1.0),
    ]
    _mk_batch(spark, rows).write.mode("append").parquet(dirs["landing"])

    stream = read_event_stream(spark, dirs["landing"])
    sess = session_stream(stream, gap_seconds=1800, watermark="1 second")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.sql("select * from sessions_stream").collect()
    }

    from energy_data_pipeline_spark.operators.gaps import sessionize

    batch = sessionize(_mk_batch(spark, rows), "ts", ["user_id"], gap_seconds=1800)
    want = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in batch.collect()
    }
    # append mode emits only watermark-closed sessions; each emitted
    # session must match the batch operator exactly, and the three
    # closed sessions must all have been emitted
    assert len(got) == 3
    for k, v in got.items():
        assert want[k] == v


def test_upsert_stream_idempotent_redelivery(spark, dirs):
    b1 = _mk_batch(spark, [(1, 0, 10, "click", 1.0), (2, 30, 11, "view", 2.0)])
    b1.write.mode("append").parquet(dirs["landing"])
    stream = read_event_stream(spark, dirs["landing"])
    upsert_stream(stream, dirs["table"], keys=["event_id"], checkpoint_dir=dirs["ckpt"])
    assert spark.read.parquet(dirs["table"]).count() == 2

    # redelivery of event 2 with a corrected value + one new event
    b2 = _mk_batch(spark, [(2, 30, 11, "view", 9.0), (3, 45, 12, "click", 3.0)])
    b2.write.mode("append").parquet(dirs["landing"])
    stream = read_event_stream(spark, dirs["landing"])
    upsert_stream(stream, dirs["table"], keys=["event_id"], checkpoint_dir=dirs["ckpt"])

    out = spark.read.parquet(dirs["table"])
    assert out.count() == 3
    assert out.filter("event_id = 2").collect()[0]["value"] == 9.0


def test_dedup_stream_drops_redelivered_rows(spark, dirs):
    # the same three events land twice (at-least-once source redelivery)
    # within one run — the second copy re-stamped 1 s later, as a broker
    # retry would; dedup keys on id alone, so each id must emit once
    rows = [(1, 0, 10, "click", 1.0), (2, 30, 11, "view", 2.0), (3, 60, 12, "click", 3.0)]
    restamped = [(i, sec + 1, u, t, v) for i, sec, u, t, v in rows]
    _mk_batch(spark, rows).write.mode("append").parquet(dirs["landing"])
    _mk_batch(spark, restamped).write.mode("append").parquet(dirs["landing"])

    stream = dedup_stream(read_event_stream(spark, dirs["landing"]))
    q = (
        stream.writeStream.format("parquet")
        .option("path", dirs["sink"])
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(dirs["sink"])
    assert out.count() == 3
    assert out.select("event_id").distinct().count() == 3


def test_running_watermark_stream_accumulates_state(spark, dirs):
    collected: list = []

    def _tick():
        stream = read_event_stream(spark, dirs["landing"])
        wm = running_watermark_stream(stream)
        q = (
            wm.writeStream.foreachBatch(
                lambda bdf, _bid: collected.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    b1 = _mk_batch(spark, [(1, 0, 10, "click", 1.0), (2, 90, 10, "view", 2.0)])
    b1.write.mode("append").parquet(dirs["landing"])
    _tick()
    rows = {r["user_id"]: r for r in collected}
    assert rows[10]["n_rows"] == 2
    assert rows[10]["last_ts"] == dt.datetime(2024, 1, 1, 1, 30)

    # next tick: state persists across restarts via checkpoint
    collected.clear()
    b2 = _mk_batch(spark, [(3, 300, 10, "click", 3.0)])
    b2.write.mode("append").parquet(dirs["landing"])
    _tick()
    rows2 = {r["user_id"]: r for r in collected}
    assert rows2[10]["n_rows"] == 3
    assert rows2[10]["last_ts"] == dt.datetime(2024, 1, 1, 5, 0)


def test_manifest_upsert_stream_atomic_versions(spark, dirs):
    """Streaming K5 through the manifest-committed table: redelivered
    keys merge idempotently AND every micro-batch run leaves a complete
    committed version — plus staged-but-uncommitted files from a crashed
    writer stay invisible to readers."""
    from energy_data_pipeline_spark.sinks import manifest_table as mt
    from energy_data_pipeline_spark.streaming.incremental import (
        manifest_upsert_stream,
    )

    table = dirs["table"]
    b1 = _mk_batch(spark, [(1, 0, 10, "click", 1.0), (2, 30, 11, "view", 2.0)])
    b1.write.mode("append").parquet(dirs["landing"])
    manifest_upsert_stream(
        read_event_stream(spark, dirs["landing"]),
        table,
        keys=["event_id"],
        checkpoint_dir=dirs["ckpt"],
    )
    assert mt.manifest_read(spark, table).count() == 2
    v_first = mt.read_manifest(table)["version"]

    # redelivery of event 2 corrected + one new event
    b2 = _mk_batch(spark, [(2, 30, 11, "view", 9.0), (3, 45, 12, "click", 3.0)])
    b2.write.mode("append").parquet(dirs["landing"])
    manifest_upsert_stream(
        read_event_stream(spark, dirs["landing"]),
        table,
        keys=["event_id"],
        checkpoint_dir=dirs["ckpt"],
    )
    out = mt.manifest_read(spark, table)
    assert out.count() == 3
    assert out.filter("event_id = 2").collect()[0]["value"] == 9.0
    assert mt.read_manifest(table)["version"] > v_first

    # the pre-merge version is still readable exactly as committed
    assert mt.manifest_read(spark, table, version=v_first).count() == 2

    # a crashed writer's staged files never surface
    ghost = _mk_batch(spark, [(99, 0, 99, "ghost", 0.0)])
    mt._stage_data_files(ghost, table)
    assert mt.manifest_read(spark, table).count() == 3


def test_corpus_admission_stream_end_to_end(spark, tmp_path):
    """Documents land in a stream; the gate drops junk, the in-stream
    fingerprint dedup drops an identical re-crawl under a NEW doc_id,
    and a second drain (new landing file, same checkpoint) admits only
    genuinely new content — the corpus never holds a duplicate text."""
    from energy_data_pipeline_spark.streaming.incremental import (
        corpus_admission_stream,
    )

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "doc_id long, text string, lang string, source string,"
        " ingest_ts timestamp"
    )
    good = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(10))
    other = " ".join(f"k{i} l{i} m{i}" for i in range(12))
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows1 = [
        (1, good, "en", "web", t0),
        (2, good, "en", "web", t0),   # identical re-crawl, new id
        (3, "short", "en", "web", t0),  # fails the quality gate
    ]
    spark.createDataFrame(rows1, schema).write.mode("append").parquet(landing)
    stats: list = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(landing)
        corpus_admission_stream(stream, corpus, ckpt, stats_out=stats)

    drain()
    texts = [r.text for r in spark.read.parquet(corpus).collect()]
    assert texts == [good]
    assert stats[-1]["admitted"] == 1

    rows2 = [
        (10, good, "en", "web", t0),   # same content again, next drain
        (11, other, "de", "api", t0),
    ]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(landing)
    drain()
    out = spark.read.parquet(corpus)
    assert sorted(r.text for r in out.collect()) == sorted([good, other])
    # doc 10 never reached the batch job: the fp-dedup STATE persists
    # in the checkpoint across drains, so the re-crawled content was
    # dropped in-stream (the corpus-side anti-join remains the backstop
    # for content older than the watermark horizon)
    assert stats[-1]["arrived"] == 1 and stats[-1]["admitted"] == 1
    assert stats[-1]["dup_in_corpus"] == 0


def test_neardup_admission_stream_end_to_end(spark, tmp_path):
    """Streaming twin of the ATOMIC near-dup ingest: batch 1 seeds the
    corpus through a manifest-group commit (in-batch near-dup resolved);
    a second drain's NEAR-dup of corpus content (not byte-identical, so
    the in-stream fp dedup cannot catch it) is rejected via the band
    index probe, and the corpus + index versions stay consistent —
    one pointer flip per micro-batch."""
    from energy_data_pipeline_spark.jobs.neardup_ingest import (
        CORPUS_SUB,
        INDEX_SUB,
    )
    from energy_data_pipeline_spark.sinks import manifest_table
    from energy_data_pipeline_spark.streaming.incremental import (
        neardup_admission_stream,
    )

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "group")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, ingest_ts timestamp"
    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    near = base.replace("alpha3", "zzz3")
    other = " ".join(f"k{i} l{i} m{i}" for i in range(15))
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows1 = [
        (1, base, t0),
        (2, near, t0),  # in-batch near-dup cluster loser of 1
        (3, other, t0),
    ]
    spark.createDataFrame(rows1, schema).write.mode("append").parquet(landing)
    stats: list = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(landing)
        neardup_admission_stream(stream, root, ckpt, stats_out=stats)

    drain()
    assert stats[-1]["admitted"] == 2 and stats[-1]["dup_in_batch"] == 1
    corpus = manifest_table.group_read(spark, root, CORPUS_SUB)
    assert {r.doc_id for r in corpus.collect()} == {1, 3}

    rows2 = [
        (10, base.replace("alpha5", "qqq5"), t0),  # NEAR-dup of corpus 1
        (11, base, t0),  # exact re-crawl: in-stream fp dedup drops it
        (12, " ".join(f"x{i} y{i} z{i}" for i in range(14)), t0),
    ]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(landing)
    drain()
    assert stats[-1]["arrived"] == 2  # doc 11 never reached the job
    assert stats[-1]["near_dup_of_corpus"] == 1 and stats[-1]["admitted"] == 1
    corpus = manifest_table.group_read(spark, root, CORPUS_SUB)
    assert {r.doc_id for r in corpus.collect()} == {1, 3, 12}
    # the group stays consistent: every corpus doc has band rows
    idx_ids = {
        r.doc_id
        for r in manifest_table.group_read(spark, root, INDEX_SUB).collect()
    }
    assert {1, 3, 12} <= idx_ids


def test_interval_join_stream_matches_batch_join(spark, dirs):
    """Stream-stream interval join (click→purchase attribution): every
    emitted pair must also appear in the batch interval join over the
    same rows, and all pairs whose state horizon fully closed before
    the final watermark must be emitted — pairs beyond the lag bound or
    across users never appear."""
    from energy_data_pipeline_spark.streaming import interval_join_stream

    rows = []
    eid = 0
    # users 0..4: a click at minute u*10, purchases at +5min (inside the
    # 30-min lag), +45min (outside), plus another user's purchase
    for u in range(5):
        rows.append((eid, u * 10, u, "click", 1.0)); eid += 1
        rows.append((eid, u * 10 + 5, u, "purchase", 2.0)); eid += 1
        rows.append((eid, u * 10 + 45, u, "purchase", 3.0)); eid += 1
    # late-window closer: advances both watermarks far past every pair
    rows.append((eid, 24 * 60, 99, "click", 0.0)); eid += 1
    rows.append((eid, 24 * 60, 99, "purchase", 0.0)); eid += 1
    batch = _mk_batch(spark, rows)
    batch.write.mode("append").parquet(dirs["landing"])

    clicks = read_event_stream(spark, dirs["landing"]).filter(
        F.col("event_type") == "click"
    )
    purchases = read_event_stream(spark, dirs["landing"]).filter(
        F.col("event_type") == "purchase"
    )
    joined = interval_join_stream(
        clicks, purchases, max_lag_seconds=1800, watermark="10 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_stream")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["left_id"], r["right_id"], r["lag_seconds"])
        for r in spark.sql("select * from ij_stream").collect()
    }

    c = batch.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("left_id"), F.col("ts").alias("lts")
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("rts"),
    )
    want = {
        (r["user_id"], r["left_id"], r["right_id"], r["lag"])
        for r in c.join(
            p,
            (c.user_id == p.p_user)
            & (p.rts >= c.lts)
            & (p.rts <= c.lts + F.expr("INTERVAL 1800 SECONDS")),
        )
        .select(
            "user_id", "left_id", "right_id",
            (F.unix_timestamp(F.col("rts").cast("timestamp"))
             - F.unix_timestamp(F.col("lts").cast("timestamp"))).alias("lag"),
        )
        .collect()
    }
    assert want, "batch join produced no pairs — test data broken"
    # streaming output must be a subset of batch (no phantom pairs) and
    # must contain every in-lag pair for users 0..4 (horizons closed by
    # the day-later sentinel rows)
    assert got <= want, got - want
    closed = {w for w in want if w[0] != 99}
    assert closed <= got, closed - got


def test_interval_join_stream_left_outer_emits_abandonment(spark, dirs):
    """left_outer mode: a click with NO in-lag purchase must surface
    exactly once with null right columns after its horizon closes;
    matched clicks must appear with their pair, not also as a null row."""
    from energy_data_pipeline_spark.streaming import interval_join_stream

    rows = [
        (0, 0, 1, "click", 1.0),      # converts at +5min
        (1, 5, 1, "purchase", 2.0),
        (2, 0, 2, "click", 1.0),      # never converts → abandonment row
        (3, 90, 2, "purchase", 2.0),  # outside the 30-min lag
        # sentinel a day later: closes every horizon on both sides
        (4, 24 * 60, 99, "click", 0.0),
        (5, 24 * 60, 99, "purchase", 0.0),
    ]
    _mk_batch(spark, rows).write.mode("append").parquet(dirs["landing"])

    clicks = read_event_stream(spark, dirs["landing"]).filter(
        F.col("event_type") == "click"
    )
    purchases = read_event_stream(spark, dirs["landing"]).filter(
        F.col("event_type") == "purchase"
    )
    joined = interval_join_stream(
        clicks, purchases, max_lag_seconds=1800, watermark="10 minutes",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_outer")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from ij_outer").collect()
    by_left = {}
    for r in out:
        by_left.setdefault(r["left_id"], []).append(r)
    # user 1's click matched exactly once, with the purchase
    assert [r["right_id"] for r in by_left[0]] == [1]
    assert by_left[0][0]["lag_seconds"] == 300
    # user 2's click emitted exactly once, as a null-right abandonment row
    assert len(by_left[2]) == 1, by_left[2]
    assert by_left[2][0]["right_id"] is None
    assert by_left[2][0]["lag_seconds"] is None


def test_hll_register_stream_converges_to_batch_registers(spark, dirs):
    """Streaming HLL register maintenance: two micro-batched halves plus
    a full redelivery of the first half must converge to EXACTLY the
    batch registers over the union (MAX-merge absorbs both the split
    and the duplicates), and the converged estimate must equal the
    batch estimate to the last bit."""
    from energy_data_pipeline_spark.operators import sketches as SK
    from energy_data_pipeline_spark.streaming.incremental import (
        hll_register_stream,
        read_event_stream,
        read_sketch_table,
    )

    half1 = [(i, i, 100 + i, "click", 1.0) for i in range(40)]
    half2 = [(100 + i, 50 + i, 200 + i, "view", 2.0) for i in range(40)]

    _mk_batch(spark, half1).write.mode("append").parquet(dirs["landing"])
    hll_register_stream(
        read_event_stream(spark, dirs["landing"]),
        dirs["table"],
        dirs["ckpt"],
    )
    # second half + a FULL redelivery of half1 (at-least-once source)
    _mk_batch(spark, half2).write.mode("append").parquet(dirs["landing"])
    _mk_batch(
        spark, [(1000 + i, m, u, t, v) for (i, m, u, t, v) in half1]
    ).write.mode("append").parquet(dirs["landing"])
    hll_register_stream(
        read_event_stream(spark, dirs["landing"]),
        dirs["table"],
        dirs["ckpt"],
    )

    streamed = {
        (r["bucket"], r["rho"])
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    batch_reg = SK.hll_registers(
        _mk_batch(spark, half1 + half2), "user_id"
    )
    expected = {(r["bucket"], r["rho"]) for r in batch_reg.collect()}
    assert streamed == expected

    est_stream = SK.hll_estimate(
        read_sketch_table(spark, dirs["table"])
    ).collect()[0]
    est_batch = SK.hll_estimate(batch_reg).collect()[0]
    assert est_stream["hll_estimate"] == est_batch["hll_estimate"]
    assert est_stream["n_registers_used"] == est_batch["n_registers_used"]


def test_cms_sketch_stream_equals_batch_sketch(spark, dirs):
    """CMS linearity under micro-batching: streaming the rows in two
    halves must produce EXACTLY the batch sketch over their union —
    same (row, bucket, count) triples — and the min-over-rows estimate
    for every key must upper-bound its true count."""
    from pyspark.sql import functions as F

    from energy_data_pipeline_spark.plans.catalog_ext import _CMS_D, _CMS_W
    from energy_data_pipeline_spark.streaming.incremental import (
        cms_sketch_stream,
        read_event_stream,
        read_sketch_table,
    )

    half1 = [(i, i, 100 + i % 7, "click", 1.0) for i in range(30)]
    half2 = [(100 + i, 40 + i, 100 + i % 5, "view", 2.0) for i in range(30)]

    _mk_batch(spark, half1).write.mode("append").parquet(dirs["landing"])
    cms_sketch_stream(
        read_event_stream(spark, dirs["landing"]), dirs["table"], dirs["ckpt"]
    )
    _mk_batch(spark, half2).write.mode("append").parquet(dirs["landing"])
    cms_sketch_stream(
        read_event_stream(spark, dirs["landing"]), dirs["table"], dirs["ckpt"]
    )

    streamed = {
        (r["row_i"], r["bucket"]): r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }

    batch = _mk_batch(spark, half1 + half2)
    rows_arr = F.array(*[F.lit(i) for i in range(_CMS_D)])
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("row_i").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % F.lit(_CMS_W)
    expected = {
        (r["row_i"], r["bucket"]): r["c"]
        for r in batch.select("user_id", F.explode(rows_arr).alias("row_i"))
        .groupBy(F.col("row_i"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert streamed == expected

    # estimate(key) = min over rows of its bucket counters >= true count
    true_counts = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    import hashlib

    for uid, n in true_counts.items():
        est = min(
            streamed[(i, int(hashlib.md5(f"{i}:{uid}".encode()).hexdigest()[:8], 16) % _CMS_W)]
            for i in range(_CMS_D)
        )
        assert est >= n, (uid, est, n)


def test_cms_sketch_replay_batch_is_skipped(spark, dirs):
    """foreachBatch is at-least-once: a crash after the state publish
    but before the checkpoint commit replays the batch with the SAME
    batch_id. The CMS SUM-merge is not row-idempotent, so the sink
    must skip an already-applied batch_id — counters identical after
    the replay, and the apply function reports the skip."""
    from energy_data_pipeline_spark.streaming.incremental import (
        _cms_apply_batch,
        read_sketch_table,
    )

    batch = _mk_batch(spark, [(i, i, 100 + i % 3, "click", 1.0) for i in range(20)])
    assert _cms_apply_batch(batch, 0, dirs["table"], "user_id", "t") is True
    before = {
        (r["row_i"], r["bucket"]): r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    # crash-replay: same batch_id redelivered
    assert _cms_apply_batch(batch, 0, dirs["table"], "user_id", "t") is False
    after = {
        (r["row_i"], r["bucket"]): r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    assert after == before
    # the NEXT batch id still applies
    batch2 = _mk_batch(spark, [(100, 50, 999, "view", 2.0)])
    assert _cms_apply_batch(batch2, 1, dirs["table"], "user_id", "t") is True
    total_after = sum(
        r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
        if r["row_i"] == 0
    )
    assert total_after == sum(c for (ri, _), c in before.items() if ri == 0) + 1


def test_hll_register_replay_batch_is_skipped(spark, dirs):
    from energy_data_pipeline_spark.streaming.incremental import (
        _hll_apply_batch,
        read_sketch_table,
    )

    batch = _mk_batch(spark, [(i, i, 100 + i, "click", 1.0) for i in range(20)])
    assert _hll_apply_batch(batch, 0, dirs["table"], "user_id", "t") is True
    before = {
        (r["bucket"], r["rho"])
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    assert _hll_apply_batch(batch, 0, dirs["table"], "user_id", "t") is False
    after = {
        (r["bucket"], r["rho"])
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    assert after == before


def test_sketch_publish_crash_leaves_previous_version_readable(spark, dirs):
    """A crash mid-publish (partial new version dir written, pointer
    NOT yet flipped) must leave the previously published state fully
    readable — the versioned pointer layout's whole point. And a
    pointer whose version dir is corrupt must RAISE, never silently
    reset to 'first batch'."""
    import os
    import shutil

    from energy_data_pipeline_spark.streaming.incremental import (
        _cms_apply_batch,
        _sketch_state_read,
        read_sketch_table,
    )

    batch = _mk_batch(spark, [(i, i, 100 + i % 3, "click", 1.0) for i in range(10)])
    assert _cms_apply_batch(batch, 0, dirs["table"], "user_id", "t")
    good = {
        (r["row_i"], r["bucket"]): r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }

    # simulate a crash mid-publish of version 2: partial dir, no flip
    partial = os.path.join(dirs["table"], "v00000002")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as fh:
        fh.write(b"\x00garbage not parquet")
    got = {
        (r["row_i"], r["bucket"]): r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    assert got == good
    # recovery: the next batch applies on top of the intact version 1
    shutil.rmtree(partial)
    batch2 = _mk_batch(spark, [(100, 50, 999, "view", 2.0)])
    assert _cms_apply_batch(batch2, 1, dirs["table"], "user_id", "t")
    assert read_sketch_table(spark, dirs["table"]).count() > 0

    # corrupt the CURRENT version dir: read must raise, not reset
    _, version, _, _ = _sketch_state_read(spark, dirs["table"])
    vdir = os.path.join(dirs["table"], f"v{version:08d}")
    shutil.rmtree(vdir)
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_sketch_table(spark, dirs["table"])


def test_hll_daily_register_stream_converges_to_batch(spark, dirs):
    """The grouped daily HLL sink: two micro-batched halves plus a full
    redelivery must converge to EXACTLY the per-(day, bucket) registers
    of the batch computation over the union — the sk_hll_daily_users
    reporting shape maintained incrementally."""
    from pyspark.sql import functions as F

    from energy_data_pipeline_spark.operators import sketches as SK
    from energy_data_pipeline_spark.streaming.incremental import (
        hll_daily_register_stream,
        read_event_stream,
        read_sketch_table,
    )

    # minutes spread rows over two days (1440 min/day)
    half1 = [(i, i * 60, 100 + i, "click", 1.0) for i in range(30)]
    half2 = [(100 + i, 1440 + i * 30, 50 + i, "view", 2.0) for i in range(30)]

    _mk_batch(spark, half1).write.mode("append").parquet(dirs["landing"])
    hll_daily_register_stream(
        read_event_stream(spark, dirs["landing"]), dirs["table"], dirs["ckpt"]
    )
    _mk_batch(spark, half2).write.mode("append").parquet(dirs["landing"])
    _mk_batch(
        spark, [(1000 + i, m, u, t, v) for (i, m, u, t, v) in half1]
    ).write.mode("append").parquet(dirs["landing"])
    hll_daily_register_stream(
        read_event_stream(spark, dirs["landing"]), dirs["table"], dirs["ckpt"]
    )

    streamed = {
        (str(r["day"]), r["bucket"], r["rho"])
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    batch = _mk_batch(spark, half1 + half2)
    keyed = (
        batch.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .select("day", SK.hll_hash(F.col("user_id")).alias("hv"))
    )
    expected = {
        (str(r["day"]), r["bucket"], r["rho"])
        for r in keyed.groupBy(
            "day", SK.hll_bucket(F.col("hv")).alias("bucket")
        )
        .agg(F.max(SK.hll_rho(F.col("hv"))).alias("rho"))
        .collect()
    }
    assert streamed == expected


def test_cms_estimate_keys_serves_streamed_state(spark, dirs):
    """The serving half of the streaming CMS: point estimates read
    from the maintained counter table must upper-bound every key's
    true count, be exact for keys with no collisions at toy scale,
    and return 0 for never-seen keys."""
    from pyspark.sql import functions as F

    from energy_data_pipeline_spark.streaming.incremental import (
        cms_estimate_keys,
        cms_sketch_stream,
        read_event_stream,
    )

    rows = [(i, i, 100 + i % 4, "click", 1.0) for i in range(40)]
    _mk_batch(spark, rows).write.mode("append").parquet(dirs["landing"])
    cms_sketch_stream(
        read_event_stream(spark, dirs["landing"]), dirs["table"], dirs["ckpt"]
    )

    true = {
        r["user_id"]: r["n"]
        for r in _mk_batch(spark, rows)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r["key"]: r["cms_estimate"]
        for r in cms_estimate_keys(
            spark, dirs["table"], [100, 101, 102, 103, 999_999]
        ).collect()
    }
    for uid in (100, 101, 102, 103):
        assert got[str(uid)] >= true[uid], (uid, got, true)
    assert got["999999"] == 0


def test_histogram_sketch_stream_equals_batch_bins(spark, dirs):
    """Histogram linearity under micro-batching: streaming the rows in
    two halves must produce EXACTLY the batch bin counts over their
    union, and the served quantile estimates must sit within one bin
    width of the exact quantiles."""
    from energy_data_pipeline_spark.streaming.incremental import (
        histogram_quantiles,
        histogram_sketch_stream,
        read_event_stream,
        read_sketch_table,
    )

    lo, hi, bins = 0.0, 100.0, 64
    half1 = [(i, i, 100, "click", float((i * 7) % 100)) for i in range(50)]
    half2 = [(100 + i, i, 200, "view", float((i * 13) % 100)) for i in range(50)]

    _mk_batch(spark, half1).write.mode("append").parquet(dirs["landing"])
    histogram_sketch_stream(
        read_event_stream(spark, dirs["landing"]),
        dirs["table"],
        dirs["ckpt"],
        lo=lo,
        hi=hi,
        bins=bins,
    )
    _mk_batch(spark, half2).write.mode("append").parquet(dirs["landing"])
    histogram_sketch_stream(
        read_event_stream(spark, dirs["landing"]),
        dirs["table"],
        dirs["ckpt"],
        lo=lo,
        hi=hi,
        bins=bins,
    )

    streamed = {
        r["bin"]: r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    width = (hi - lo) / bins
    batch = _mk_batch(spark, half1 + half2)
    expected = {
        r["bin"]: r["c"]
        for r in batch.select(
            F.least(
                F.greatest(
                    F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast(
                        "int"
                    ),
                    F.lit(0),
                ),
                F.lit(bins - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert streamed == expected

    served = {
        r["quantile"]: r["estimate"]
        for r in histogram_quantiles(
            spark, dirs["table"], [0.5, 0.9], lo, hi, bins
        ).collect()
    }
    exact = batch.agg(
        F.percentile("value", F.array(F.lit(0.5), F.lit(0.9))).alias("ex")
    ).collect()[0]["ex"]
    assert abs(served[0.5] - exact[0]) <= width
    assert abs(served[0.9] - exact[1]) <= width


def test_histogram_sketch_replay_and_clamping(spark, dirs):
    """A replayed batch_id is skipped before any bin is touched, and
    out-of-range values clamp into the edge bins (counts never lost)."""
    import pytest as _pytest

    from energy_data_pipeline_spark.streaming.incremental import (
        _hist_apply_batch,
        histogram_sketch_stream,
        read_sketch_table,
    )

    # values straddle the [10, 20) contract bounds: -5 clamps to bin 0,
    # 25 and 10_000 clamp to the top bin
    batch = _mk_batch(
        spark,
        [(1, 0, 1, "click", -5.0), (2, 1, 1, "view", 25.0),
         (3, 2, 1, "view", 10_000.0), (4, 3, 1, "view", 15.0)],
    )
    assert _hist_apply_batch(batch, 0, dirs["table"], "value", 10.0, 20.0, 4, "t") is True
    before = {
        r["bin"]: r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    assert before == {0: 1, 3: 2, 2: 1}
    assert _hist_apply_batch(batch, 0, dirs["table"], "value", 10.0, 20.0, 4, "t") is False
    after = {
        r["bin"]: r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    assert after == before
    with _pytest.raises(ValueError, match="hi > lo"):
        histogram_sketch_stream(None, dirs["table"], dirs["ckpt"], lo=5.0, hi=5.0)


def test_sketch_sink_fresh_stream_identity_applies(spark, dirs):
    """batch_ids restart at 0 under a fresh checkpoint: a bare
    batch_id guard would silently drop every batch of the new stream.
    The pointer records the stream identity, so batch 0 from a
    DIFFERENT stream applies (and adopts the new identity), while a
    replay within one stream still skips."""
    from energy_data_pipeline_spark.streaming.incremental import (
        _cms_apply_batch,
        read_sketch_table,
    )

    batch = _mk_batch(spark, [(1, 0, 7, "click", 1.0)])
    assert _cms_apply_batch(batch, 5, dirs["table"], "user_id", "ckptA") is True
    # same stream, replayed id: skipped
    assert _cms_apply_batch(batch, 5, dirs["table"], "user_id", "ckptA") is False
    # NEW stream (fresh checkpoint): batch 0 < 5 must still apply
    assert _cms_apply_batch(batch, 0, dirs["table"], "user_id", "ckptB") is True
    total = sum(
        r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
        if r["row_i"] == 0
    )
    assert total == 2  # applied once per stream, replay dropped
    # and the new identity's own replay is now skipped
    assert _cms_apply_batch(batch, 0, dirs["table"], "user_id", "ckptB") is False


def test_histogram_sink_rejects_contract_mismatch(spark, dirs):
    """Bin counts are meaningless without their bounds: merging under
    different (lo, hi, bins) must raise, and the serving side must
    reject a caller whose expected bounds disagree with the state."""
    from energy_data_pipeline_spark.streaming.incremental import (
        _hist_apply_batch,
        histogram_quantiles,
    )

    batch = _mk_batch(spark, [(1, 0, 1, "click", 5.0)])
    assert _hist_apply_batch(batch, 0, dirs["table"], "value", 0.0, 10.0, 4, "t") is True
    with pytest.raises(ValueError, match="contract mismatch"):
        _hist_apply_batch(batch, 1, dirs["table"], "value", 0.0, 20.0, 4, "t")
    with pytest.raises(ValueError, match="contract mismatch"):
        histogram_quantiles(spark, dirs["table"], [0.5], lo=0.0, hi=99.0)
    # matching (or omitted) bounds serve from the STORED contract
    got = histogram_quantiles(spark, dirs["table"], [0.5]).collect()
    assert len(got) == 1


def test_histogram_sink_drops_null_values(spark, dirs):
    """A NULL value is not an observation: it must not be binned (the
    batch twin and the sink would otherwise disagree on WHICH edge bin
    swallows it)."""
    from energy_data_pipeline_spark.streaming.incremental import (
        _hist_apply_batch,
        read_sketch_table,
    )

    batch = _mk_batch(
        spark, [(1, 0, 1, "click", 2.0), (2, 1, 1, "click", None)]
    )
    assert _hist_apply_batch(batch, 0, dirs["table"], "value", 0.0, 8.0, 4, "t") is True
    bins = {
        r["bin"]: r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    assert bins == {1: 1}  # only the real observation counted


def test_histogram_sink_drops_nan_values(spark, dirs):
    """NaN passes isNotNull, and floor(NaN).cast('int') clamps it into
    bin 0 — silently counting a non-observation in the lowest bin. The
    sink must drop NaN like NULL (the batch twin now filters both)."""
    from energy_data_pipeline_spark.streaming.incremental import (
        _hist_apply_batch,
        read_sketch_table,
    )

    batch = _mk_batch(
        spark, [(1, 0, 1, "click", 2.0), (2, 1, 1, "click", float("nan"))]
    )
    assert _hist_apply_batch(batch, 0, dirs["table"], "value", 0.0, 8.0, 4, "t") is True
    bins = {
        r["bin"]: r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
    }
    assert bins == {1: 1}  # NaN not binned anywhere


def test_cms_estimate_keys_empty_probe_list(spark, dirs):
    """An empty probe list is a valid request: it must yield an empty
    (key, cms_estimate) frame, not a CANNOT_INFER_EMPTY_SCHEMA error
    from type inference on zero rows."""
    from energy_data_pipeline_spark.streaming.incremental import (
        _cms_apply_batch,
        cms_estimate_keys,
    )

    batch = _mk_batch(spark, [(1, 0, 7, "click", 1.0)])
    assert _cms_apply_batch(batch, 0, dirs["table"], "user_id", "t") is True
    out = cms_estimate_keys(spark, dirs["table"], [])
    assert out.columns == ["key", "cms_estimate"]
    assert out.count() == 0


def test_stream_instance_identity_survives_checkpoint_wipe(spark, dirs):
    """Wiping and recreating a checkpoint at the SAME path restarts
    batch_ids at 0; a path-derived identity would make the replay
    guard silently drop every batch of the reborn stream until it
    outran the old last_applied counter. The identity is a UUID marker
    created inside the checkpoint dir on first use, so the wipe
    rebirths the identity and batch 0 applies."""
    import shutil

    from energy_data_pipeline_spark.streaming.incremental import (
        _cms_apply_batch,
        _stream_instance_id,
        read_sketch_table,
    )

    sid1 = _stream_instance_id(dirs["ckpt"])
    assert _stream_instance_id(dirs["ckpt"]) == sid1  # stable while alive
    batch = _mk_batch(spark, [(1, 0, 7, "click", 1.0)])
    assert _cms_apply_batch(batch, 5, dirs["table"], "user_id", sid1) is True
    # replay within the live instance still skips
    assert _cms_apply_batch(batch, 5, dirs["table"], "user_id", sid1) is False
    shutil.rmtree(dirs["ckpt"])
    sid2 = _stream_instance_id(dirs["ckpt"])
    assert sid2 != sid1
    # the reborn stream's batch 0 (< stored 5) must apply
    assert _cms_apply_batch(batch, 0, dirs["table"], "user_id", sid2) is True
    total = sum(
        r["c"]
        for r in read_sketch_table(spark, dirs["table"]).collect()
        if r["row_i"] == 0
    )
    assert total == 2


def test_replay_guard_pre_upgrade_blank_identity_skips_replay(spark, dirs):
    """A pointer written before stream identities existed stores "" —
    treating that as a FOREIGN stream would double-apply one
    crash-replayed batch into SUM-merged counters right across the
    upgrade. A stored "" matches the current stream."""
    from energy_data_pipeline_spark.streaming.incremental import (
        _cms_apply_batch,
        _replay_guard,
    )

    assert _replay_guard(3, 3, "any-stream", "") is True  # replay: skip
    assert _replay_guard(4, 3, "any-stream", "") is False  # next: apply
    batch = _mk_batch(spark, [(1, 0, 7, "click", 1.0)])
    # pre-upgrade writer recorded no identity
    assert _cms_apply_batch(batch, 3, dirs["table"], "user_id", "") is True
    # post-upgrade resume crash-replays batch 3 with a real identity
    assert (
        _cms_apply_batch(batch, 3, dirs["table"], "user_id", "p:uuid")
        is False
    )


def test_replay_guard_bare_abspath_identity_migrates(spark, dirs):
    """The format before instance tokens stored the bare checkpoint
    abspath; the current format is abspath:token. A stored bare
    abspath that is the abspath PREFIX of the current id is the SAME
    stream mid-upgrade — treating it as foreign would re-apply a
    crash-replayed batch straddling the upgrade into SUM-merged
    counters. A genuinely different path must still read as foreign."""
    from energy_data_pipeline_spark.streaming.incremental import (
        _cms_apply_batch,
        _replay_guard,
        _sketch_state_read,
    )

    # pre-token pointer: stored bare abspath, current abspath:token
    assert _replay_guard(3, 3, "/ck/pt:abc123", "/ck/pt") is True  # skip
    assert _replay_guard(4, 3, "/ck/pt:abc123", "/ck/pt") is False  # apply
    # different checkpoint path remains foreign: batch 3 applies
    assert _replay_guard(3, 3, "/other:abc123", "/ck/pt") is False
    # and a bare abspath that merely shares a string prefix (not a
    # path-with-token extension) is NOT matched
    assert _replay_guard(3, 3, "/ck/pt2:abc123", "/ck/pt") is False
    # end-to-end: old-format pointer, upgraded code crash-replays
    batch = _mk_batch(spark, [(1, 0, 7, "click", 1.0)])
    old_id = dirs["ckpt"]  # pre-upgrade id WAS the bare path
    assert _cms_apply_batch(batch, 3, dirs["table"], "user_id", old_id)
    new_id = f"{old_id}:deadbeef"
    assert (
        _cms_apply_batch(batch, 3, dirs["table"], "user_id", new_id)
        is False
    )
    # the next applied batch rewrites the pointer to the new format,
    # ending the one-shot legacy wildcard
    assert _cms_apply_batch(batch, 4, dirs["table"], "user_id", new_id)
    _, _, _, stored = _sketch_state_read(spark, dirs["table"])
    assert stored == new_id


def test_stream_instance_marker_single_winner_under_race(tmp_path):
    """Concurrent first users of one checkpoint dir must all read the
    SAME instance token: the marker is published with an atomic
    exclusive link, so exactly one creator can win (the old
    check-then-replace let two winners install different tokens,
    splitting one checkpoint instance into two replay identities)."""
    import threading

    from energy_data_pipeline_spark.streaming.incremental import (
        _stream_instance_id,
    )

    ck = str(tmp_path / "ckpt")
    ids: list[str] = []
    barrier = threading.Barrier(8)

    def grab():
        barrier.wait()
        ids.append(_stream_instance_id(ck))

    threads = [threading.Thread(target=grab) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(set(ids)) == 1 and ids[0].endswith(tuple("0123456789abcdef"))


def test_upsert_stream_crash_replay_is_noop(spark, dirs):
    """foreachBatch is at-least-once: a crash after the upsert applied
    but before the checkpoint commit replays the batch on restart (here
    simulated by losing the checkpoint entirely — a superset of the
    replay window). The key-merge makes the replay a no-op: table
    contents identical."""
    import shutil

    b1 = _mk_batch(
        spark, [(1, 0, 10, "click", 1.0), (2, 30, 11, "view", 2.0)]
    )
    b1.write.mode("append").parquet(dirs["landing"])
    upsert_stream(
        read_event_stream(spark, dirs["landing"]),
        dirs["table"],
        keys=["event_id"],
        checkpoint_dir=dirs["ckpt"],
    )
    before = sorted(
        map(tuple, spark.read.parquet(dirs["table"]).collect())
    )
    shutil.rmtree(dirs["ckpt"])  # crash: checkpoint lost post-apply
    upsert_stream(
        read_event_stream(spark, dirs["landing"]),
        dirs["table"],
        keys=["event_id"],
        checkpoint_dir=dirs["ckpt"],
    )
    after = sorted(map(tuple, spark.read.parquet(dirs["table"]).collect()))
    assert after == before


def test_manifest_upsert_stream_crash_replay_is_noop(spark, dirs):
    """Crash-replay through the manifest-committed K5 sink: the replay
    re-merges the same keys, publishing a new version whose LIVE
    content is identical — and the pre-replay version stays readable."""
    import shutil

    from energy_data_pipeline_spark.sinks import manifest_table as mt
    from energy_data_pipeline_spark.streaming.incremental import (
        manifest_upsert_stream,
    )

    b1 = _mk_batch(
        spark, [(1, 0, 10, "click", 1.0), (2, 30, 11, "view", 2.0)]
    )
    b1.write.mode("append").parquet(dirs["landing"])
    manifest_upsert_stream(
        read_event_stream(spark, dirs["landing"]),
        dirs["table"],
        keys=["event_id"],
        checkpoint_dir=dirs["ckpt"],
    )
    before = sorted(
        map(tuple, mt.manifest_read(spark, dirs["table"]).collect())
    )
    v_before = mt.read_manifest(dirs["table"])["version"]
    shutil.rmtree(dirs["ckpt"])
    manifest_upsert_stream(
        read_event_stream(spark, dirs["landing"]),
        dirs["table"],
        keys=["event_id"],
        checkpoint_dir=dirs["ckpt"],
    )
    after = sorted(
        map(tuple, mt.manifest_read(spark, dirs["table"]).collect())
    )
    assert after == before
    # the pre-replay version remains readable exactly as committed
    assert (
        mt.manifest_read(spark, dirs["table"], version=v_before).count()
        == 2
    )


def test_corpus_admission_stream_crash_replay_is_noop(spark, tmp_path):
    """Crash-replay of an ALREADY-ADMITTED corpus micro-batch: the
    in-stream fp-dedup state died with the checkpoint, so the replayed
    documents reach the batch admission job — whose corpus-side
    anti-join settles them as dups. Corpus unchanged, zero admissions."""
    import datetime as dt
    import shutil

    from energy_data_pipeline_spark.streaming.incremental import (
        corpus_admission_stream,
    )

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "doc_id long, text string, lang string, source string,"
        " ingest_ts timestamp"
    )
    good = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(10))
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(1, good, "en", "web", t0)], schema
    ).write.mode("append").parquet(landing)
    stats: list = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(landing)
        corpus_admission_stream(stream, corpus, ckpt, stats_out=stats)

    drain()
    assert stats[-1]["admitted"] == 1
    before = sorted(r.text for r in spark.read.parquet(corpus).collect())
    shutil.rmtree(ckpt)  # crash after the admission committed
    drain()
    assert stats[-1]["admitted"] == 0 and stats[-1]["dup_in_corpus"] == 1
    after = sorted(r.text for r in spark.read.parquet(corpus).collect())
    assert after == before


def test_neardup_admission_stream_crash_replay_is_noop(spark, tmp_path):
    """Crash-replay of an already-committed near-dup micro-batch: the
    replayed docs probe the band index their own commit published and
    reject at jaccard 1.0 — corpus and index unchanged, zero
    admissions, group versions stay consistent."""
    import datetime as dt
    import shutil

    from energy_data_pipeline_spark.jobs.neardup_ingest import (
        CORPUS_SUB,
        INDEX_SUB,
    )
    from energy_data_pipeline_spark.sinks import manifest_table
    from energy_data_pipeline_spark.streaming.incremental import (
        neardup_admission_stream,
    )

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "group")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, ingest_ts timestamp"
    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    other = " ".join(f"k{i} l{i} m{i}" for i in range(15))
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(1, base, t0), (2, other, t0)], schema
    ).write.mode("append").parquet(landing)
    stats: list = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(landing)
        neardup_admission_stream(stream, root, ckpt, stats_out=stats)

    drain()
    assert stats[-1]["admitted"] == 2
    corpus_before = {
        r.doc_id
        for r in manifest_table.group_read(spark, root, CORPUS_SUB).collect()
    }
    idx_before = {
        r.doc_id
        for r in manifest_table.group_read(spark, root, INDEX_SUB).collect()
    }
    shutil.rmtree(ckpt)  # crash after the group commit
    drain()
    assert stats[-1]["admitted"] == 0
    corpus_after = {
        r.doc_id
        for r in manifest_table.group_read(spark, root, CORPUS_SUB).collect()
    }
    idx_after = {
        r.doc_id
        for r in manifest_table.group_read(spark, root, INDEX_SUB).collect()
    }
    assert corpus_after == corpus_before
    assert idx_after == idx_before


def test_ivfpq_index_stream_grows_and_replays_safely(spark, tmp_path):
    """Streaming IVFADC index maintenance: drain 1 appends the landed
    vectors' codes under the frozen committed quantizers, drain 2
    appends only the new ids, and a crash replay (checkpoint wiped,
    everything redelivered) appends nothing — the committed search
    stays byte-identical to the operator path over the full corpus."""
    import shutil

    from pyspark.sql import functions as F

    from energy_data_pipeline_spark.jobs import pq_index
    from energy_data_pipeline_spark.operators import pq
    from energy_data_pipeline_spark.sources import load_table
    from energy_data_pipeline_spark.streaming.incremental import (
        ivfpq_index_stream,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    base = emb.filter(F.col("vec_id") < 300)
    root = str(tmp_path / "idx")
    pq_index.ivfpq_index_build(spark, base, root)

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    schema = "vec_id long, embedding array<float>"
    wave1 = emb.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 350)
    ).select("vec_id", "embedding")
    wave1.write.mode("append").parquet(landing)
    stats: list = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(landing)
        ivfpq_index_stream(stream, root, ckpt, stats_out=stats)

    drain()
    assert stats[-1]["appended"] == wave1.count()

    # wave 2: one redelivered id range + genuinely new ids
    emb.filter((F.col("vec_id") >= 340) & (F.col("vec_id") < 380)).select(
        "vec_id", "embedding"
    ).write.mode("append").parquet(landing)
    drain()
    assert stats[-1]["appended"] == emb.filter(
        (F.col("vec_id") >= 350) & (F.col("vec_id") < 380)
    ).count()

    # crash replay: checkpoint lost, the WHOLE landing dir redelivers
    shutil.rmtree(ckpt)
    drain()
    assert stats[-1]["appended"] == 0

    # committed search == operator path over exactly the indexed ids
    from energy_data_pipeline_spark.sinks import manifest_table

    indexed_ids = {
        r["vec_id"]
        for r in manifest_table.group_read(
            spark, root, pq_index.CODES_SUB
        ).select("vec_id").collect()
    }
    assert indexed_ids == {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") < 380).select("vec_id").collect()
    }
    corpus = emb.filter(F.col("vec_id") < 380)
    q = emb.filter(F.col("vec_id") < 8)
    coarse, cents = pq.ivfpq_train(corpus.filter(F.col("vec_id") < 300))
    got = {
        tuple(r)
        for r in pq_index.ivfpq_index_topk(spark, q, root, nprobe=2).collect()
    }
    expect = {
        tuple(r)
        for r in pq.ivfpq_topk(corpus, q, coarse, cents, nprobe=2).collect()
    }
    assert got == expect and got


def test_silver_tokenize_stream_incremental_and_replay_safe(spark, tmp_path):
    """Streaming silver maintenance: drain 1 tokenizes the landed docs,
    drain 2 tokenizes only the NEW file's new doc_ids, and a crash
    replay (checkpoint wiped, everything redelivered) tokenizes
    nothing — the silver table is unchanged."""
    import shutil

    from energy_data_pipeline_spark.jobs.silver_tokenize import read_silver
    from energy_data_pipeline_spark.streaming.incremental import (
        silver_tokenize_stream,
    )

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, source string, lang string, text string"
    spark.createDataFrame(
        [(1, "web", "en", "alpha beta"), (2, "web", "en", "gamma delta")],
        schema,
    ).write.mode("append").parquet(landing)
    stats: list = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(landing)
        silver_tokenize_stream(stream, table, ckpt, stats_out=stats)

    drain()
    assert stats[-1]["tokenized"] == 2
    assert read_silver(spark, table).count() == 2

    # second landing file: one known id redelivered + one new doc
    spark.createDataFrame(
        [(2, "web", "en", "gamma delta"), (3, "api", "de", "neu hier")],
        schema,
    ).write.mode("append").parquet(landing)
    drain()
    assert stats[-1]["tokenized"] == 1 and stats[-1]["skipped"] == 1
    got = {r["doc_id"]: r["wl"] for r in read_silver(spark, table).collect()}
    assert got == {
        1: ["alpha", "beta"],
        2: ["gamma", "delta"],
        3: ["neu", "hier"],
    }

    # crash replay: checkpoint lost, the WHOLE landing dir redelivers
    shutil.rmtree(ckpt)
    drain()
    assert stats[-1]["tokenized"] == 0
    assert read_silver(spark, table).count() == 3


def test_bpe_silver_stream_incremental_and_replay_safe(spark, tmp_path):
    """Streaming BPE-silver maintenance with a frozen committed
    tokenizer: drain 1 folds the landed docs, drain 2 folds only the
    new doc_id, and a crash replay (checkpoint wiped, everything
    redelivered) folds nothing."""
    import shutil

    from energy_data_pipeline_spark.jobs import bpe_model
    from energy_data_pipeline_spark.jobs.silver_tokenize import (
        read_bpe_silver,
    )
    from energy_data_pipeline_spark.streaming.incremental import (
        bpe_silver_stream,
    )

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "bpe_silver")
    merges_table = str(tmp_path / "merges")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, source string, lang string, text string"

    vocab = spark.createDataFrame(
        [("abab", 10), ("abxy", 4), ("yzyz", 3)], "w string, freq long"
    )
    bpe_model.train_and_commit_merges(spark, vocab, merges_table, 2)

    spark.createDataFrame(
        [(1, "web", "en", "abab abxy"), (2, "web", "en", "yzyz abab")],
        schema,
    ).write.mode("append").parquet(landing)
    stats: list = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(landing)
        bpe_silver_stream(stream, table, merges_table, ckpt, stats_out=stats)

    drain()
    assert stats[-1]["tokenized"] == 2
    got = {
        r["doc_id"]: r["btoks"] for r in read_bpe_silver(spark, table).collect()
    }
    assert len(got) == 2
    # the committed model's merges actually applied (words are
    # segmented into trained symbols, not left as characters)
    assert all(1 <= len(v) < sum(len(w) for w in ("abab",)) * 2 for v in got.values())

    # second landing: one redelivered + one new
    spark.createDataFrame(
        [(2, "web", "en", "yzyz abab"), (3, "api", "de", "abab")],
        schema,
    ).write.mode("append").parquet(landing)
    drain()
    assert stats[-1]["tokenized"] == 1 and stats[-1]["skipped"] == 1
    assert read_bpe_silver(spark, table).count() == 3

    # crash replay: checkpoint lost, whole landing dir redelivers
    shutil.rmtree(ckpt)
    drain()
    assert stats[-1]["tokenized"] == 0
    assert read_bpe_silver(spark, table).count() == 3


def test_top_paths_stream_converges_and_guards_replay(spark, dirs):
    """Streaming path mining: closed sessions emit once (append-mode
    session_window), their trigrams SUM-merge into the versioned state,
    a second drain with no new data changes nothing, and a
    crash-replayed micro-batch (same batch_id, same stream) is skipped
    before any count is touched."""
    from energy_data_pipeline_spark.streaming.incremental import (
        _paths_apply_batch,
        _sketch_state_read,
        read_sketch_table,
        top_paths_stream,
    )

    # user 10 session A (0-25 min): click,view,click,purchase ->
    # two trigrams; session B (120-130): two events, no trigram;
    # user 11: single event; user 12's tail event at 600 keeps the
    # watermark ahead so everything earlier closes (12 stays open)
    rows = [
        (1, 0, 10, "click", 1.0),
        (2, 10, 10, "view", 1.0),
        (3, 20, 10, "click", 1.0),
        (4, 25, 10, "purchase", 1.0),
        (5, 120, 10, "click", 1.0),
        (6, 130, 10, "view", 1.0),
        (7, 5, 11, "click", 1.0),
        (8, 600, 12, "view", 1.0),
    ]
    _mk_batch(spark, rows).write.mode("append").parquet(dirs["landing"])
    table = dirs["landing"] + "_paths_state"

    def drain():
        stream = read_event_stream(spark, dirs["landing"])
        top_paths_stream(
            stream, table, dirs["ckpt"], gap_seconds=1800, watermark="1 second"
        )

    drain()
    got = {
        r["path"]: (r["n_occurrences"], r["n_sessions"])
        for r in read_sketch_table(spark, table).collect()
    }
    assert got == {
        "click>view>click": (1, 1),
        "view>click>purchase": (1, 1),
    }

    # idle re-drain: no new files, no state movement
    v_before = _sketch_state_read(spark, table)[1]
    drain()
    assert _sketch_state_read(spark, table)[1] == v_before

    # new landing: user 13 contributes view>view>view once its session
    # closes under the advanced watermark (tail at 1200)
    more = [
        (9, 700, 13, "view", 1.0),
        (10, 701, 13, "view", 1.0),
        (11, 702, 13, "view", 1.0),
        (12, 1200, 14, "click", 1.0),
    ]
    _mk_batch(spark, more).write.mode("append").parquet(dirs["landing"])
    drain()
    got = {
        r["path"]: (r["n_occurrences"], r["n_sessions"])
        for r in read_sketch_table(spark, table).collect()
    }
    assert got["view>view>view"] == (1, 1)
    assert got["click>view>click"] == (1, 1)  # untouched

    # crash replay of an applied batch: same stream identity and a
    # batch_id at-or-below last_applied must be skipped
    _df, _v, last_applied, stream = _sketch_state_read(spark, table)
    closed = spark.createDataFrame(
        [(99, [["x"], ["y"], ["z"]])], "user_id long, raw array<array<string>>"
    ).select(
        "user_id",
        __import__("pyspark.sql.functions", fromlist=["x"]).expr(
            "transform(raw, r -> r[0])"
        ).alias("seq"),
    )
    assert not _paths_apply_batch(closed, last_applied, table, stream)
    assert (
        read_sketch_table(spark, table)
        .filter("path = 'x>y>z'")
        .count()
        == 0
    )


def test_daily_rollup_stream_serves_batch_identical_forecast(spark, tmp_path):
    """The streamed daily state, split across micro-batches, must fold
    into the SAME forecast table as the batch ts_holt_forecast query
    (serve-time rounding absorbs the SUM-merge reassociation); a
    crash-replayed batch is skipped before any total moves."""
    import shutil

    from energy_data_pipeline_spark.plans.catalog_timeseries import (
        holt_forecast,
    )
    from energy_data_pipeline_spark.streaming.incremental import (
        _daily_apply_batch,
        _sketch_state_read,
        daily_rollup_stream,
        holt_forecast_served,
    )

    sf = "/root/testdata/sf0.001"
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "daily_state")
    ckpt = str(tmp_path / "ckpt")

    ev = spark.read.parquet(f"{sf}/events.parquet")
    first = ev.filter("event_id % 2 = 0")
    second = ev.filter("event_id % 2 = 1")
    first.write.mode("append").parquet(landing)

    def drain():
        stream = (
            spark.readStream.schema(ev.schema).parquet(landing)
        )
        daily_rollup_stream(stream, table, ckpt)

    drain()
    # second half lands as its own file -> separate micro-batch
    second.write.mode("append").parquet(landing)
    drain()

    got = sorted(map(tuple, holt_forecast_served(spark, table).collect()))
    want = sorted(map(tuple, holt_forecast(spark, sf).collect()))
    assert got == want

    # idle re-drain: nothing new, version unchanged
    v = _sketch_state_read(spark, table)[1]
    drain()
    assert _sketch_state_read(spark, table)[1] == v

    # crash replay of an applied batch id: skipped before totals move
    _df, _v, last_applied, stream = _sketch_state_read(spark, table)
    assert not _daily_apply_batch(first, last_applied, table, stream)
    assert (
        sorted(map(tuple, holt_forecast_served(spark, table).collect()))
        == want
    )
    shutil.rmtree(ckpt, ignore_errors=True)
