"""Structured Streaming surface — the idiomatic upgrade path for the
reference's cron-batch semantics (SURVEY.md §2.9).

The reference runs Prefect cron flows that (a) resume from a per-key
watermark (daily_pv_automation.py:74-126), (b) tolerate late/duplicate
deliveries via idempotent writes (K4/K5), and (c) accumulate a merged
dataset with keep-last dedup (merge_to_all.py:16-101). Those semantics
map onto:

- ``Trigger.AvailableNow`` over a landing directory → "process whatever
  arrived since last run, then stop" — exactly a cron tick, but with
  checkpointed exactly-once file tracking instead of hand-rolled state.
- ``withWatermark`` + windowed aggregation → bounded-state late-data
  handling for the hourly rollups the dashboards serve.
- ``foreachBatch`` + the K5 upsert writer → idempotent keyed delivery.
- ``applyInPandasWithState`` → the per-key MAX(ts) watermark table as a
  custom stateful operator (T6), maintained incrementally instead of
  re-aggregated per run.

At scale: state size is bounded by (keys × window retention); the
landing dir should be day-partitioned so maxFilesPerTrigger yields even
micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..shipping import ensure_worker_imports

# events-shaped landing schema (streams cannot infer schemas)
EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampNTZType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType = EVENT_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet landing directory."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def hourly_aggregate_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """A1's hourly rollup as a streaming windowed aggregate.

    The watermark bounds state: rows later than ``watermark`` behind the
    max seen event time are dropped; completed windows are emitted and
    their state freed (mirrors the reference's "re-fetch the incomplete
    last day" policy with engine-managed bookkeeping).

    Event-time watermarks require an instant (TIMESTAMP) column, so the
    wall-clock NTZ column is cast through the session timezone and the
    window start cast back. Lossless for fixed-offset session timezones
    (the engine's KST convention); under a DST zone the windows follow
    instants, so repeated/skipped wall-clock hours merge or shift."""
    return (
        stream_df.withColumn("_wts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_wts", watermark)
        .groupBy(F.window("_wts", "1 hour").alias("w"), F.col(key_col))
        .agg(F.sum(value_col).alias("total_value"), F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("hour_start"),
            key_col,
            "total_value",
            "n_events",
        )
    )


def session_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """st_user_sessions' streaming twin: gap-based sessionization via the
    native ``session_window`` — state per open session, closed and
    emitted once the watermark passes the session's gap horizon. Same
    NTZ→instant casting contract as :func:`hourly_aggregate_stream`.

    The batch operator (operators/gaps.sessionize) and this stream apply
    the same >gap split rule, so a backfill computed in batch and a live
    tail computed here agree on session boundaries away from the seam.
    """
    return (
        stream_df.withColumn("_wts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_wts", watermark)
        .groupBy(
            F.col(key_col),
            F.session_window("_wts", f"{gap_seconds} seconds").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("_wts").cast("timestamp_ntz").alias("session_end"),
        )
        .select(
            key_col,
            F.col("sw.start").cast("timestamp_ntz").alias("session_start"),
            "session_end",
            "n_events",
        )
    )


def dedup_stream(
    stream_df: DataFrame,
    id_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """O3/O4's streaming twin for at-least-once sources: drop redelivered
    rows by id within the watermark horizon. State holds one entry per id
    seen in the last ``watermark`` of event time and is evicted as the
    watermark advances — bounded state, unlike an unwatermarked
    dropDuplicates which grows forever.

    ``dropDuplicatesWithinWatermark`` keys state on the id columns ALONE,
    so a redelivery whose event time was re-stamped in transit (broker
    retry, ingest clock adjustment) still dedups — `dropDuplicates([id,
    ts])` would pass it through as a "new" row. Rows arriving after
    their id's state has aged out are emitted again; replay that far
    back goes through the idempotent batch sinks instead (K4/K5)."""
    return (
        stream_df.withColumn("_wts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_wts", watermark)
        .dropDuplicatesWithinWatermark(list(id_cols))
        .drop("_wts")
    )


def interval_join_stream(
    left_df: DataFrame,
    right_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    max_lag_seconds: int = 7 * 24 * 3600,
    watermark: str = "2 hours",
    how: str = "inner",
    left_id_col: str = "event_id",
    right_id_col: str = "event_id",
) -> DataFrame:
    """Stream-stream event-time interval join — the streaming twin of
    the funnel/J7 attribution shape: each LEFT event (e.g. a click)
    joins every RIGHT event (e.g. a purchase) of the same key whose
    event time lands in ``[left_ts, left_ts + max_lag_seconds]``.

    Both sides carry watermarks and the join condition carries an
    explicit upper time bound, which is what lets Spark age out join
    state: a buffered left row is droppable once the right watermark
    passes ``left_ts + max_lag``, a right row once the left watermark
    passes its ts — state is bounded by (arrival rate x lag horizon),
    never the stream's history. Without the bound the join would be
    legal but state would grow forever; this function makes the bound
    part of the operator's signature.

    Same NTZ→instant casting contract as the other twins. Output rows
    carry both NTZ timestamps plus the lag in seconds; downstream
    attribution (first-touch = min lag per right event) composes on
    top in either batch or streaming mode.

    ``how="left_outer"`` emits the ABANDONMENT stream too: a left event
    with no in-lag match surfaces once — with null right columns — when
    the right watermark passes its horizon (``left_ts + max_lag``) and
    the engine can prove no match is still possible. The same state
    bound applies; the only extra cost is holding the unmatched flag
    until the horizon closes."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type for interval join: {how}")
    lag = int(max_lag_seconds)
    left = left_df.select(
        F.col(key_col).alias("_lkey"),
        F.col(ts_col).cast("timestamp").alias("_lwts"),
        F.col(left_id_col).alias("left_id"),
    ).withWatermark("_lwts", watermark)
    right = right_df.select(
        F.col(key_col).alias("_rkey"),
        F.col(ts_col).cast("timestamp").alias("_rwts"),
        F.col(right_id_col).alias("right_id"),
    ).withWatermark("_rwts", watermark)
    joined = left.join(
        right,
        (F.col("_lkey") == F.col("_rkey"))
        & (F.col("_rwts") >= F.col("_lwts"))
        & (F.col("_rwts") <= F.col("_lwts") + F.expr(f"INTERVAL {lag} SECONDS")),
        how,
    )
    return joined.select(
        F.col("_lkey").alias(key_col),
        "left_id",
        "right_id",
        F.col("_lwts").cast("timestamp_ntz").alias("left_ts"),
        F.col("_rwts").cast("timestamp_ntz").alias("right_ts"),
        (F.unix_timestamp("_rwts") - F.unix_timestamp("_lwts")).alias(
            "lag_seconds"
        ),
    )


def available_now_ingest(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    partition_by: Sequence[str] = (),
) -> None:
    """Cron-tick ingest: drain everything currently in the landing dir
    into the sink, exactly once (checkpointed), then stop — the
    Structured Streaming equivalent of the reference's daily Prefect
    flow run."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination()


def upsert_stream(
    stream_df: DataFrame,
    table_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
) -> None:
    """K5 upsert as a streaming sink: each micro-batch is merged into the
    keyed table via foreachBatch (new rows win on key collision), so
    re-delivered/late records stay idempotent — the reference's
    ON CONFLICT DO UPDATE (namdong_wind_collect.py:191-225) semantics."""
    from ..sinks.writers import upsert

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert(batch_df.sparkSession, batch_df, table_path, keys)

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def manifest_upsert_stream(
    stream_df: DataFrame,
    table_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
) -> None:
    """K5 upsert with ATOMIC batch visibility: each micro-batch merges
    through the manifest-committed table (sinks/manifest_table.py), so a
    reader either sees the batch in full or not at all — and a crash
    mid-merge leaves the previous version live, never a missing or
    half-written table (the gap the plain directory-swap upsert
    documents). Exactly-once end to end: the streaming checkpoint fences
    re-delivery on the source side, the key-merge makes a replayed batch
    a no-op on the sink side, and the pointer flip is the only commit
    point."""
    from ..sinks.manifest_table import manifest_upsert

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        manifest_upsert(batch_df.sparkSession, batch_df, table_path, keys)

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def corpus_admission_stream(
    stream_df: DataFrame,
    corpus_path: str,
    checkpoint_dir: str,
    ts_col: str = "ingest_ts",
    watermark: str = "2 hours",
    stats_out: list | None = None,
) -> None:
    """Continuous corpus admission — the streaming twin of
    ``jobs/corpus_ingest.corpus_ingest_job``: documents land in a
    stream, the quality gate and a within-watermark CONTENT-fingerprint
    dedup run in-stream (state bounded by the watermark horizon, keyed
    on the fingerprint so a redelivered or re-crawled identical text
    dedups even under a new doc_id), and each micro-batch then goes
    through the batch admission job, which settles exact dups against
    the EXISTING corpus and appends idempotently. Exactly-once
    composition: checkpoint fences source redelivery, the in-stream fp
    dedup drops intra-horizon repeats, and the admission job's
    corpus-side anti-join makes anything older a no-op.

    ``stats_out`` (if given) collects each micro-batch's admission
    stats dict — observability for tests and monitors."""
    from ..functions import text as T
    from ..jobs.corpus_ingest import corpus_ingest_job

    gated = (
        stream_df.filter(T.quality_keep("text"))
        .withColumn("_fp", T.fingerprint("text"))
        .withColumn("_wts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_wts", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp", "_wts")
    )

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats = corpus_ingest_job(
            batch_df.select("doc_id", "source", "lang", "text"),
            corpus_path,
            batch_id=str(batch_id),
        )
        if stats_out is not None:
            stats_out.append(stats)

    q = (
        gated.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def silver_tokenize_stream(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    stats_out: list | None = None,
) -> None:
    """Continuous tokenized-silver maintenance — the streaming twin of
    ``jobs/silver_tokenize.tokenize_silver_job``: documents land in a
    stream and each micro-batch folds into the manifest-committed
    (doc_id, source, lang, wl) silver table. Tokenize once per
    document EVER: the job's doc_id anti-join settles redeliveries and
    crash replays (a replayed batch tokenizes nothing), the manifest
    pointer flip is the only commit point, and the checkpoint fences
    source redelivery across restarts — the same exactly-once
    composition as ``corpus_admission_stream``.

    ``stats_out`` (if given) collects each micro-batch's stats dict."""
    from ..jobs.silver_tokenize import tokenize_silver_job

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats = tokenize_silver_job(
            batch_df.sparkSession,
            batch_df.select("doc_id", "source", "lang", "text"),
            table_path,
        )
        if stats_out is not None:
            stats_out.append({"batch_id": batch_id, **stats})

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _daily_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    stream_id: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> bool:
    """One foreachBatch application of the accumulating daily-total
    sink: per-(event_type, day) RAW value sums SUM-merged into the
    persistent table (module level so the replay-skip path is directly
    testable). Returns True if applied, False if skipped as a replay.

    Sums are merged UNROUNDED; consumers round at serve time, so the
    micro-batch split only reassociates double addition — below the
    serving rnd(4) grain, the same argument the dashboard's
    hourly-rollup refresh pins. SUM-merge is not
    redelivery-idempotent, hence the replay guard before any total
    moves."""
    if batch_df.isEmpty():
        return False
    spark = batch_df.sparkSession
    existing, version, last_applied, stored_stream = _sketch_state_read(
        spark, table_path
    )
    if _replay_guard(batch_id, last_applied, stream_id, stored_stream):
        return False
    delta = batch_df.groupBy(
        "event_type", F.to_date(ts_col).alias("day")
    ).agg(F.sum(value_col).alias("total_raw"))
    if existing is not None:
        merged = (
            existing.select("event_type", "day", "total_raw")
            .unionByName(delta)
            .groupBy("event_type", "day")
            .agg(F.sum("total_raw").alias("total_raw"))
        )
    else:
        merged = delta
    # |event types| x |calendar days| rows by construction
    rows = merged.collect()
    _sketch_state_publish(
        spark.createDataFrame(rows, merged.schema),
        table_path,
        version,
        batch_id,
        stream_id,
    )
    return True


def daily_rollup_stream(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> None:
    """Accumulating per-(type, day) total maintenance — the streaming
    feed under the LIVE FORECAST: events land in micro-batches, raw
    daily sums SUM-merge into the versioned state (t8's accumulating-
    merge semantics on the sketch-sink machinery: checkpoint fence +
    replay guard + atomic pointer flip), and
    ``holt_forecast_served`` folds the state into the same forecast
    table the batch ``ts_holt_forecast`` query computes — the
    data-sized work (event stream -> daily totals) is incremental,
    the recurrence itself is calendar-bounded and runs at serve
    time."""
    stream_id = _stream_instance_id(checkpoint_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        _daily_apply_batch(
            batch_df, batch_id, table_path, stream_id, ts_col, value_col
        )

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def holt_forecast_served(spark: SparkSession, table_path: str) -> DataFrame:
    """Holt linear-trend forecasts folded from the STREAMED daily
    state — once every event has been ingested, row-identical to the
    batch ``ts_holt_forecast`` catalog query: serving rounds the
    accumulated raw totals at 4 (absorbing micro-batch reassociation)
    and runs the SAME shared fold (``holt_from_daily``)."""
    from ..functions.rounding import rnd
    from ..plans.catalog_timeseries import holt_from_daily

    daily = read_sketch_table(spark, table_path).select(
        "event_type",
        "day",
        rnd(F.col("total_raw"), 4).alias("day_total"),
    )
    return holt_from_daily(daily)


def _paths_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    stream_id: str,
) -> bool:
    """One foreachBatch application of the session-path sink: each row
    is a CLOSED session carrying its ordered event-type sequence
    (``seq``); 3-step paths explode into (path, occurrences, sessions)
    deltas and SUM-merge into the persistent table. Module level so
    the replay-skip path is directly testable. Returns True if
    applied, False if skipped as a replay.

    Path counting is LINEAR over closed sessions (append-mode
    session_window emits each session exactly once), so the converged
    table equals the batch ``st_top_paths`` aggregate over the same
    closed sessions; like the CMS/histogram sinks the SUM-merge is
    not redelivery-idempotent, hence the replay guard before any
    count is touched."""
    if batch_df.isEmpty():
        return False
    spark = batch_df.sparkSession
    existing, version, last_applied, stored_stream = _sketch_state_read(
        spark, table_path
    )
    if _replay_guard(batch_id, last_applied, stream_id, stored_stream):
        return False
    seq = F.col("seq")
    grams = F.when(
        F.size(seq) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(seq) - 3),
            lambda i: F.concat_ws(
                ">",
                F.element_at(seq, i + 1),
                F.element_at(seq, i + 2),
                F.element_at(seq, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_session = batch_df.select(
        F.monotonically_increasing_id().alias("_sid"), grams.alias("_g")
    ).select("_sid", F.explode("_g").alias("path"))
    delta = per_session.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("_sid").alias("n_sessions"),
    )
    if existing is not None:
        merged = (
            existing.select("path", "n_occurrences", "n_sessions")
            .unionByName(delta)
            .groupBy("path")
            .agg(
                F.sum("n_occurrences").alias("n_occurrences"),
                F.sum("n_sessions").alias("n_sessions"),
            )
        )
    else:
        merged = delta
    # bounded by |event types|^3 rows by construction
    rows = merged.collect()
    if not rows:
        return False
    _sketch_state_publish(
        spark.createDataFrame(rows, merged.schema),
        table_path,
        version,
        batch_id,
        stream_id,
    )
    return True


def top_paths_stream(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> None:
    """``st_top_paths``' streaming twin: gap-based sessionization via
    the native ``session_window`` in APPEND mode (a session emits
    exactly once, when the watermark passes its gap horizon) carrying
    the time-ordered event-type sequence, then per-micro-batch path
    extraction SUM-merged into the versioned (path, n_occurrences,
    n_sessions) state table — the same exactly-once composition as the
    CMS/histogram sinks (checkpoint fences redelivery, replay guard
    skips crash-replayed batches, atomic pointer flip publishes).

    Serve with ``read_sketch_table`` ordered by n_occurrences — once
    every session is closed the state equals the batch
    ``st_top_paths`` aggregate (away from the exact-gap boundary seam
    ``session_stream`` documents)."""
    stream_id = _stream_instance_id(checkpoint_dir)
    sessions = (
        stream_df.withColumn("_wts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_wts", watermark)
        .groupBy(
            F.col(key_col),
            F.session_window("_wts", f"{gap_seconds} seconds").alias("sw"),
        )
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_wts", "event_type"))
                ),
                lambda s: s["event_type"],
            ).alias("seq")
        )
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        _paths_apply_batch(batch_df, batch_id, table_path, stream_id)

    q = (
        sessions.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def bpe_silver_stream(
    stream_df: DataFrame,
    table_path: str,
    merges_table: str,
    checkpoint_dir: str,
    stats_out: list | None = None,
) -> None:
    """Continuous BPE-token silver maintenance — the streaming twin of
    ``jobs/silver_tokenize.bpe_silver_job``: documents land in a
    stream and each micro-batch is tokenized by the COMMITTED merge
    list (never retrained in-stream — the tokenizer is a frozen model
    artifact, exactly like ``ivfpq_index_stream``'s frozen quantizers)
    and folded into the manifest-committed (doc_id, source, lang,
    btoks) table. Exactly-once composition: checkpoint fences source
    redelivery, the job's doc_id anti-join settles crash replays, the
    manifest pointer flip is the only commit point.

    ``stats_out`` (if given) collects each micro-batch's stats dict."""
    from ..jobs.silver_tokenize import bpe_silver_job

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats = bpe_silver_job(
            batch_df.sparkSession,
            batch_df.select("doc_id", "source", "lang", "text"),
            table_path,
            merges_table,
        )
        if stats_out is not None:
            stats_out.append({"batch_id": batch_id, **stats})

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ivfpq_index_stream(
    stream_df: DataFrame,
    index_root: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats_out: list | None = None,
) -> None:
    """Continuous IVFADC index maintenance — the streaming twin of
    ``jobs/pq_index.ivfpq_index_append``: new vectors land in a stream
    and each micro-batch is assigned with the COMMITTED quantizers and
    appended to the codes table in one group commit. Exactly-once
    composition: the checkpoint fences source redelivery, the append's
    id anti-join settles crash replays (a replayed batch appends
    nothing — duplicated code rows would double a vector's ADC terms
    in every probed ranking), and the group pointer flip is the only
    commit point. The quantizers stay frozen (the standard grow path);
    retraining is a batch ``ivfpq_index_build`` epoch, not a stream
    concern.

    ``stats_out`` (if given) collects each micro-batch's append stats."""
    from ..jobs.pq_index import ivfpq_index_append

    def _grow(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats = ivfpq_index_append(
            batch_df.sparkSession,
            batch_df.select(id_col, vec_col),
            index_root,
            id_col=id_col,
            vec_col=vec_col,
        )
        if stats_out is not None:
            stats_out.append({"batch_id": batch_id, **stats})

    q = (
        stream_df.writeStream.foreachBatch(_grow)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def neardup_admission_stream(
    stream_df: DataFrame,
    group_root: str,
    checkpoint_dir: str,
    ts_col: str = "ingest_ts",
    watermark: str = "2 hours",
    threshold: float = 0.5,
    stats_out: list | None = None,
) -> None:
    """Continuous NEAR-DUP-aware corpus admission — the streaming twin
    of ``jobs/neardup_ingest.near_dup_ingest_job_atomic``: documents
    land in a stream, a within-watermark exact-content dedup drops
    intra-horizon redeliveries cheaply in-stream (bounded state), and
    each micro-batch then runs the full incremental LSH admission —
    in-batch near-dup clustering, band-index probe against the corpus,
    and a single manifest-group commit of corpus + index (one pointer
    flip per micro-batch, both-or-neither).

    Exactly-once composition: the checkpoint fences source redelivery
    across restarts; within the horizon the content fingerprint dedup
    absorbs repeats before they cost minhash work; anything older
    probes out against the indexed corpus at jaccard 1.0 inside the
    admission job. A crash mid-batch replays the whole micro-batch,
    which converges to a no-op — the atomic group commit guarantees
    the corpus and its index never diverge, so the replay's probes see
    exactly what the crashed attempt published (or nothing at all).

    ``stats_out`` (if given) collects each micro-batch's admission
    stats dict."""
    from ..functions import text as T
    from ..jobs.neardup_ingest import near_dup_ingest_job_atomic

    gated = (
        stream_df.withColumn("_fp", T.fingerprint("text"))
        .withColumn("_wts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_wts", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp", "_wts")
    )

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats = near_dup_ingest_job_atomic(
            batch_df.drop(ts_col), group_root, threshold=threshold
        )
        if stats_out is not None:
            stats_out.append({"batch_id": batch_id, **stats})

    q = (
        gated.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- custom stateful operator: per-key running watermark (T6) -------------
WATERMARK_STATE_SCHEMA = StructType(
    [StructField("max_ts", LongType(), True), StructField("n_rows", LongType(), True)]
)
WATERMARK_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("last_ts", TimestampNTZType(), True),
        StructField("n_rows", LongType(), True),
    ]
)


# --- versioned atomic state publish for the sketch sinks ------------------
# foreachBatch is AT-LEAST-ONCE even with a checkpoint: a crash after
# the state write but before the checkpoint commit replays the batch
# with the SAME batch_id. The sketch sinks therefore (a) record the
# last-applied batch_id inside the published pointer and skip replays,
# and (b) publish each new state as an immutable version directory
# flipped live by an atomic pointer rename — a crash mid-publish leaves
# the previous version intact and readable, never a partial table.
_SKETCH_POINTER = "_LATEST"


def _sketch_state_read(
    spark: SparkSession, table_path: str
) -> tuple[DataFrame | None, int, int, str]:
    """Return (state_df | None, version, last_applied_batch_id,
    stream_id).

    Only a MISSING pointer means "no state yet"; a pointer that exists
    but whose version directory fails to load raises — silently
    treating a corrupt table as first-batch would reset accumulated
    registers/counters forever (the r9 ADVICE failure mode).

    ``stream_id`` (second pointer line; "" in pre-upgrade pointers)
    identifies WHICH stream's batch_id sequence ``last_applied`` came
    from: Structured Streaming batch_ids restart at 0 under a fresh
    checkpoint, so a bare batch_id guard would silently drop every
    batch of a re-checkpointed stream until it outran the old counter.

    Pointer and version I/O is deliberately driver-local POSIX (same
    deployment seam as sinks/manifest_table's lock CAS): table_path
    must be on a filesystem the driver sees — local disk, NFS, or a
    FUSE-mounted object store. An S3/GCS-native deployment swaps this
    for a conditional PUT behind the same two functions."""
    import os

    ptr = os.path.join(table_path, _SKETCH_POINTER)
    if not os.path.exists(ptr):
        return None, 0, -1, ""
    with open(ptr, encoding="ascii") as fh:
        lines = fh.read().splitlines()
    version_s, batch_s = lines[0].split()
    stream_id = lines[1] if len(lines) > 1 else ""
    version, last_batch = int(version_s), int(batch_s)
    vdir = os.path.join(table_path, f"v{version:08d}")
    return spark.read.parquet(vdir), version, last_batch, stream_id


def _replay_guard(
    batch_id: int, last_applied: int, stream_id: str, stored_stream: str
) -> bool:
    """True iff this batch is a crash-replay that must be skipped: the
    batch_id comparison is only meaningful within ONE stream's
    checkpointed sequence, so a different stream identity (fresh
    checkpoint, second stream onto the same table) always applies.

    Two legacy pointer formats are treated as MATCHING the current
    stream (the only writer of either was the stream now resuming, and
    treating them as foreign would double-apply one crash-replayed
    batch into SUM-merged state right across the upgrade):

    - a stored "" (pre-stream-identity pointer), and
    - a stored bare checkpoint abspath (the pre-instance-token format)
      equal to the abspath PREFIX of the current ``abspath:token``
      stream_id — without this, upgrading mid-stream reads the old
      pointer as a different stream and re-applies the replayed batch.

    Both wildcards exist ONLY for pointers written by older code: the
    next successful publish rewrites the pointer with the full current
    identity, so the legacy match is one-shot per table."""
    same_stream = (
        stored_stream == ""
        or stream_id == stored_stream
        or stream_id.startswith(stored_stream + ":")
    )
    return same_stream and batch_id <= last_applied


def _stream_instance_id(checkpoint_dir: str) -> str:
    """Identity of THIS checkpoint INSTANCE, not just its path.

    Structured Streaming batch_ids restart at 0 when a checkpoint is
    wiped and recreated at the SAME path, so a path-derived stream_id
    would make the replay guard silently skip every batch of the new
    stream until it outran the old last_applied counter — the exact
    failure the stream_id exists to prevent. A UUID marker file
    created inside the checkpoint dir on first use pins the identity
    to the instance: wipe the dir and the marker (hence the identity)
    is reborn with it, so the guard correctly sees a new sequence."""
    import os
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "_STREAM_INSTANCE")
    if not os.path.exists(marker):
        # Exactly-one-winner creation: write the token to a private tmp
        # (content complete + fsynced), then publish via os.link, which
        # atomically FAILS if the marker already exists. The previous
        # check-then-os.replace had a race where two concurrent first
        # users could each observe the marker missing, both replace, and
        # read DIFFERENT tokens for the same checkpoint instance. link
        # also guarantees a racing reader never sees a partially-written
        # marker (unlike O_CREAT|O_EXCL + write, which exposes an empty
        # file between create and write).
        tmp = os.path.join(checkpoint_dir, f".inst-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w", encoding="ascii") as fh:
            fh.write(uuid.uuid4().hex)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, marker)
        except FileExistsError:
            pass  # lost the race — read the winner's token below
        finally:
            os.remove(tmp)
    with open(marker, encoding="ascii") as fh:
        token = fh.read().strip()
    return f"{os.path.abspath(checkpoint_dir)}:{token}"


def _sketch_state_publish(
    df: DataFrame,
    table_path: str,
    version: int,
    batch_id: int,
    stream_id: str,
) -> None:
    """Write ``df`` as version ``version+1`` then atomically flip the
    pointer (tmp file + ``os.replace``). Old versions are pruned
    best-effort AFTER the flip, keeping the previous one as a
    crash-recovery fallback. See ``_sketch_state_read`` for the
    driver-local-filesystem seam and the stream_id contract."""
    import os
    import shutil

    new_version = version + 1
    vdir = os.path.join(table_path, f"v{new_version:08d}")
    df.coalesce(1).write.mode("overwrite").parquet(vdir)
    tmp = os.path.join(table_path, f".{_SKETCH_POINTER}.tmp")
    with open(tmp, "w", encoding="ascii") as fh:
        fh.write(f"{new_version} {batch_id}\n{stream_id}\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(table_path, _SKETCH_POINTER))
    for name in os.listdir(table_path):
        if name.startswith("v") and name < f"v{version:08d}":
            shutil.rmtree(os.path.join(table_path, name), ignore_errors=True)


def read_sketch_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Snapshot read of the latest published sketch state (HLL
    registers or CMS counters)."""
    df, _, _, _ = _sketch_state_read(spark, table_path)
    if df is None:
        raise FileNotFoundError(f"no sketch state published at {table_path}")
    return df


def _hll_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    key_col: str,
    stream_id: str,
) -> bool:
    """One foreachBatch application of the HLL register sink (module
    level so the replay-skip path is directly testable). Returns True
    if the batch was applied, False if skipped as a replay."""
    from ..operators import sketches as SK

    if batch_df.isEmpty():
        return False
    spark = batch_df.sparkSession
    existing, version, last_applied, stored_stream = _sketch_state_read(
        spark, table_path
    )
    if _replay_guard(batch_id, last_applied, stream_id, stored_stream):
        return False
    delta = SK.hll_registers(batch_df, key_col)
    if existing is not None:
        merged = SK.merge_registers(existing, delta)
    else:
        merged = delta.select("bucket", "rho")
    # ≤ m rows: stage to driver, publish atomically
    rows = merged.collect()
    _sketch_state_publish(
        spark.createDataFrame(rows, merged.schema),
        table_path,
        version,
        batch_id,
        stream_id,
    )
    return True


def _hll_daily_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    key_col: str,
    ts_col: str,
    stream_id: str,
) -> bool:
    """One foreachBatch application of the GROUPED daily HLL sink:
    per-(day, bucket) registers MAX-merged into the persistent table.
    Returns True if applied, False if skipped as a replay."""
    from ..operators import sketches as SK

    if batch_df.isEmpty():
        return False
    spark = batch_df.sparkSession
    existing, version, last_applied, stored_stream = _sketch_state_read(
        spark, table_path
    )
    if _replay_guard(batch_id, last_applied, stream_id, stored_stream):
        return False
    day = F.to_date(ts_col)
    keyed = (
        batch_df.select(day.alias("day"), F.col(key_col))
        .distinct()
        .select("day", SK.hll_hash(F.col(key_col)).alias("hv"))
    )
    delta = keyed.groupBy(
        "day", SK.hll_bucket(F.col("hv")).alias("bucket")
    ).agg(F.max(SK.hll_rho(F.col("hv"))).alias("rho"))
    if existing is not None:
        merged = (
            existing.select("day", "bucket", "rho")
            .unionByName(delta)
            .groupBy("day", "bucket")
            .agg(F.max("rho").alias("rho"))
        )
    else:
        merged = delta
    rows = merged.collect()  # |days| x m rows — retention-bounded
    _sketch_state_publish(
        spark.createDataFrame(rows, merged.schema),
        table_path,
        version,
        batch_id,
        stream_id,
    )
    return True


def hll_daily_register_stream(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> None:
    """Incremental GROUPED HyperLogLog maintenance — the streaming twin
    of ``sk_hll_daily_users``: one register set per day, MAX-merged
    across micro-batches, so a reporting pipeline reads per-day
    distinct-user estimates from |days|×m rows of state no matter how
    many events flow through. Same md5 register algebra as the batch
    query (bit-exact convergence), same replay-skip + versioned atomic
    pointer publish as the plain register sink; re-delivered rows are
    absorbed by MAX per (day, bucket). The driver-side merge collects
    |days|×m rows — bounded by retention, not traffic; a deployment
    with unbounded history would partition the state table by day and
    rewrite only the days present in the batch."""

    stream_id = _stream_instance_id(checkpoint_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        _hll_daily_apply_batch(
            batch_df, batch_id, table_path, key_col, ts_col, stream_id
        )

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cms_estimate_keys(
    spark: SparkSession, table_path: str, keys: Sequence
) -> DataFrame:
    """Point-query the STREAMED Count-Min state: for each key, the
    min-over-rows of its d bucket counters — the upper-bound frequency
    estimate, served from |keys|×d probe rows joined against the
    broadcast d×w counter table (the same probe shape as the batch
    `sk_cms_heavy_hitters`, but over state a stream maintained). This
    is the serving-side half of the streaming sketch: the sink keeps
    the counters current; dashboards call this without touching the
    event stream."""
    from ..operators.sketches import cms_bucket
    from ..plans.catalog_ext import _CMS_D, _CMS_W

    counters = read_sketch_table(spark, table_path)
    if not keys:
        # createDataFrame([]) cannot infer a schema; an empty probe set
        # is a valid request and gets the empty answer, not an error.
        return spark.createDataFrame(
            [], "key string, cms_estimate bigint"
        )
    # keys probe through the ENGINE's cast-to-string (one homogeneous
    # key type per call, same as the sink's key column) — Python str()
    # diverges from Spark's rendering for booleans, Decimals and
    # timestamps, which would silently probe the wrong buckets
    probes = (
        spark.createDataFrame([(k,) for k in keys], ["key_raw"])
        .select(F.col("key_raw").cast("string").alias("key"))
        .select(
            "key",
            F.explode(
                F.array(*[F.lit(i) for i in range(_CMS_D)])
            ).alias("row_i"),
        )
    )
    bucket = cms_bucket(F.col("row_i"), F.col("key"), _CMS_W)
    return (
        probes.select("key", "row_i", bucket.alias("bucket"))
        .join(F.broadcast(counters), ["row_i", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_estimate"))
    )


def _cms_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    key_col: str,
    stream_id: str,
) -> bool:
    """One foreachBatch application of the CMS counter sink (module
    level so the replay-skip path is directly testable). Returns True
    if the batch was applied, False if skipped as a replay."""
    from ..plans.catalog_ext import _CMS_D, _CMS_W

    if batch_df.isEmpty():
        return False
    spark = batch_df.sparkSession
    existing, version, last_applied, stored_stream = _sketch_state_read(
        spark, table_path
    )
    if _replay_guard(batch_id, last_applied, stream_id, stored_stream):
        return False
    from ..operators.sketches import cms_bucket

    rows_arr = F.array(*[F.lit(i) for i in range(_CMS_D)])
    bucket = cms_bucket(F.col("row_i"), F.col(key_col), _CMS_W)
    delta = (
        batch_df.select(F.col(key_col), F.explode(rows_arr).alias("row_i"))
        .groupBy(F.col("row_i"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if existing is not None:
        merged = (
            existing.select("row_i", "bucket", "c")
            .unionByName(delta)
            .groupBy("row_i", "bucket")
            .agg(F.sum("c").alias("c"))
        )
    else:
        merged = delta
    rows = merged.collect()  # ≤ d*w rows by construction
    _sketch_state_publish(
        spark.createDataFrame(rows, merged.schema),
        table_path,
        version,
        batch_id,
        stream_id,
    )
    return True


def hll_register_stream(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
) -> None:
    """Incremental HyperLogLog register maintenance: each micro-batch
    computes its own (bucket, rho) partial registers and MAX-merges
    them into a persistent register table — the streaming
    approximate-COUNT-DISTINCT whose state is ≤ m rows FOREVER,
    regardless of how many events or distinct keys flow through.

    This is the mergeability property doing real work: the register
    table after any sequence of micro-batches is bit-identical to the
    batch registers over the union of their rows (md5 hashing — no
    seeded JVM hash, no RNG), so the converged streaming estimate
    EQUALS the batch query's (`sk_hll_distinct_report`). Re-delivered
    ROWS are absorbed by MAX (idempotent) and replayed BATCHES are
    skipped via the pointer's last-applied batch_id, so at-least-once
    delivery needs no dedup in front. State publishes through the
    versioned atomic pointer flip — a crash mid-publish never corrupts
    accumulated registers. The merge runs over ≤ 2m rows per batch —
    the 100 TB cost lives entirely in the per-batch map-side register
    fold.
    """
    stream_id = _stream_instance_id(checkpoint_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        _hll_apply_batch(batch_df, batch_id, table_path, key_col, stream_id)

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cms_sketch_stream(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
) -> None:
    """Incremental Count-Min sketch maintenance: each micro-batch folds
    its rows into per-(row, bucket) counter deltas and SUM-merges them
    into a persistent d×w counter table — streaming heavy-hitter state
    bounded at d·w rows forever. CMS is LINEAR, so the merged table
    after any micro-batch split equals the batch sketch over the union
    of the rows exactly (md5 hashing, engine-deterministic). Unlike the
    HLL register MAX-merge the SUM-merge is NOT redelivery-idempotent
    (counters add), and foreachBatch is at-least-once even with a
    checkpoint (a crash after the publish but before the checkpoint
    commit replays the batch) — so the sink makes ITSELF idempotent:
    the published pointer records the last-applied batch_id and a
    replayed batch_id is skipped before any counter is touched. State
    publishes through the versioned atomic pointer flip, so a crash
    mid-publish leaves the previous counters intact rather than
    resetting the sketch."""
    stream_id = _stream_instance_id(checkpoint_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        _cms_apply_batch(batch_df, batch_id, table_path, key_col, stream_id)

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _hist_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
    stream_id: str,
) -> bool:
    """One foreachBatch application of the histogram bin sink (module
    level so the replay-skip path is directly testable). Returns True
    if the batch was applied, False if skipped as a replay.

    The published state carries (lo, hi, bins) as constant columns —
    the bin counts are meaningless without their bounds, so the sink
    REFUSES to merge into a table built under a different contract,
    and the serving side reads the bounds instead of trusting the
    caller. NULL values are dropped before binning (a NULL is not an
    observation; binning it would skew an edge bin — and would land in
    DIFFERENT edge bins in the batch twin)."""
    if batch_df.isEmpty():
        return False
    spark = batch_df.sparkSession
    existing, version, last_applied, stored_stream = _sketch_state_read(
        spark, table_path
    )
    if _replay_guard(batch_id, last_applied, stream_id, stored_stream):
        return False
    if existing is not None:
        meta = existing.select("lo", "hi", "bins").first()
        if (meta["lo"], meta["hi"], meta["bins"]) != (lo, hi, bins):
            raise ValueError(
                f"histogram sink contract mismatch: table {table_path} was "
                f"built with (lo={meta['lo']}, hi={meta['hi']}, "
                f"bins={meta['bins']}), got (lo={lo}, hi={hi}, bins={bins})"
            )
    width = (hi - lo) / float(bins)
    bin_col = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast(
                "int"
            ),
            F.lit(0),
        ),
        F.lit(bins - 1),
    )
    delta = (
        # NaN passes isNotNull and floor(NaN).cast('int') clamps it into
        # bin 0 — silently counting a non-observation in the lowest bin
        # and diverging from the batch twin. Drop NaN alongside NULL.
        batch_df.filter(
            F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col))
        )
        .select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if existing is not None:
        merged = (
            existing.select("bin", "c")
            .unionByName(delta)
            .groupBy("bin")
            .agg(F.sum("c").alias("c"))
        )
    else:
        merged = delta
    merged = merged.select(
        "bin",
        "c",
        F.lit(lo).alias("lo"),
        F.lit(hi).alias("hi"),
        F.lit(bins).alias("bins"),
    )
    rows = merged.collect()  # ≤ bins rows by construction
    _sketch_state_publish(
        spark.createDataFrame(rows, merged.schema),
        table_path,
        version,
        batch_id,
        stream_id,
    )
    return True


def histogram_sketch_stream(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 100.0,
    bins: int = 64,
) -> None:
    """Incremental binned-histogram maintenance — the streaming twin of
    ``sk_binned_quantiles`` and the third streaming sketch sink next to
    the HLL register MAX-merge and the CMS counter SUM-merge. Each
    micro-batch folds its rows into per-bin count deltas and SUM-merges
    them into a persistent ≤ ``bins``-row table; histograms are LINEAR,
    so the merged table after any micro-batch split equals the batch
    histogram over the union of the rows exactly.

    The bounds are part of the SINK CONTRACT, fixed up front (e.g. from
    a historical snapshot): a stream cannot re-derive global min/max
    without reprocessing, so out-of-range values CLAMP into the edge
    bins — that only flattens the extreme-tail estimates, never loses
    counts. Like the CMS sink, the SUM-merge is not
    redelivery-idempotent, so the published pointer records the
    last-applied batch_id and replayed batches are skipped before any
    bin is touched; publication goes through the versioned atomic
    pointer flip."""
    if not hi > lo:
        raise ValueError(f"histogram bounds need hi > lo, got [{lo}, {hi})")

    stream_id = _stream_instance_id(checkpoint_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        _hist_apply_batch(
            batch_df, batch_id, table_path, value_col, lo, hi, bins, stream_id
        )

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def histogram_quantiles(
    spark: SparkSession,
    table_path: str,
    qs: Sequence[float],
    lo: float | None = None,
    hi: float | None = None,
    bins: int | None = None,
) -> DataFrame:
    """Serve quantile estimates from the STREAMED histogram state via
    the SAME covering-bin interpolation as the batch
    ``sk_binned_quantiles`` (one shared implementation:
    operators/sketches.binned_quantile_estimates — the two cannot
    drift). The sink's (lo, hi, bins) contract is READ FROM THE STATE
    rather than trusted from the caller; passing them explicitly is a
    cross-check that raises on mismatch instead of silently serving
    quantiles against the wrong bounds. Returns (quantile, estimate)
    per requested q."""
    from ..operators.sketches import binned_quantile_estimates

    hist = read_sketch_table(spark, table_path)
    meta = hist.select("lo", "hi", "bins").first()
    s_lo, s_hi, s_bins = meta["lo"], meta["hi"], meta["bins"]
    for name, given, stored in (
        ("lo", lo, s_lo),
        ("hi", hi, s_hi),
        ("bins", bins, s_bins),
    ):
        if given is not None and given != stored:
            raise ValueError(
                f"histogram contract mismatch: caller expects {name}="
                f"{given}, state at {table_path} was built with {stored}"
            )
    return binned_quantile_estimates(
        hist.select("bin", F.col("c").alias("cnt")), qs, s_lo, s_hi, s_bins
    )


def _update_watermark(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Incrementally maintain MAX(ts)/COUNT per key across micro-batches."""
    max_us, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        pdf = pdf.dropna(subset=["ts"])  # NULL ts must not poison state
        if len(pdf) == 0:
            continue
        batch_max = pdf["ts"].max()
        batch_us = int(batch_max.value // 1_000)  # ns → µs
        max_us = batch_us if max_us is None else max(max_us, batch_us)
        n += len(pdf)
    state.update((max_us, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "last_ts": [pd.Timestamp(max_us * 1_000) if max_us is not None else pd.NaT],
            "n_rows": [n],
        }
    )


def running_watermark_stream(stream_df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """T6's per-key watermark table as an incrementally-maintained
    stateful stream: emits the updated (key, last_ts, n_rows) row for
    every key seen in each micro-batch."""
    ensure_worker_imports(stream_df.sparkSession)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        _update_watermark,
        outputStructType=WATERMARK_OUTPUT_SCHEMA,
        stateStructType=WATERMARK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming twin of ts_rolling_zscore_anomalies (§2.8 analytics) ---

ANOMALY_BASELINE_DAYS = 14
ANOMALY_MIN_BASELINE = 7
# retention: a day can only influence scores for the next 14 calendar
# days, so state beyond baseline+horizon is dead weight; keep a margin
# for late data within the retention window
ANOMALY_RETAIN_DAYS = 64
# clock-skew guard: a producer with a broken clock must not poison the
# retention horizon (one far-future row would anchor max(day) there
# and trim every legitimate day forever — and because the horizon
# trims on arrival, the key would stay bricked for all future real
# data). Batch days further than this ahead of the batch's 95th-
# percentile day are dropped before they ever enter state. The margin
# is deliberately SMALLER than ANOMALY_RETAIN_DAYS: an admitted
# outlier inside the margin can advance the horizon by at most
# (margin - retention) < 0 days past the legitimate frontier, so it
# can never trim real state. q95 (not median, not max) keeps wide
# legitimate backfills admissible — a uniform N-day backfill's max is
# within ~N/20 of its q95 — while one bad row cannot drag the anchor.
# Boundary (documented, not solvable without wall-clock): a batch
# consisting ONLY of broken-clock rows is indistinguishable from a
# legitimate time jump and will be admitted.
ANOMALY_MAX_FUTURE_SKEW = 30

ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("days", ArrayType(LongType()), True),  # epoch days
        StructField("sums", ArrayType(DoubleType()), True),  # raw day sums
    ]
)
ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), True),
        StructField("day", DateType(), True),
        StructField("day_total", DoubleType(), True),
        StructField("n_baseline", LongType(), True),
        StructField("baseline_mean", DoubleType(), True),
        StructField("baseline_sd", DoubleType(), True),
        StructField("zscore", DoubleType(), True),
        StructField("is_anomaly", BooleanType(), True),
    ]
)


def _py_rnd(x: float, digits: int) -> float:
    """Python twin of functions/rounding.rnd — half-away-from-zero on
    the binary double, so stream scores hash-match the batch query."""
    import math

    p = float(10**digits)
    if abs(x) * p >= float(2**63):
        return x
    return math.floor(abs(x) * p + 0.5) / p * (1.0 if x >= 0 else -1.0)


def _update_anomaly(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge the batch's per-day sums into state, then re-score the
    days this batch TOUCHED (changed days plus the later days whose
    trailing baseline contains one) against their baselines — same
    formula as the batch query: rounded day totals in, mean/sd
    re-rounded at 6 digits, z at 4. Unchanged days are not re-emitted
    (an upsert sink would otherwise rewrite ~50 rows per key per
    tick), and days whose baseline window has been partially trimmed
    by retention are never re-scored (a truncated baseline would emit
    a score diverging from the batch query and overwrite the correct
    earlier row in update mode)."""
    import datetime
    import math

    acc: dict[int, float] = (
        dict(zip(state.get[0], state.get[1])) if state.exists else {}
    )
    # Two passes: merge the WHOLE batch first (Arrow may split one
    # group across chunks — a per-chunk guard would see a poison row
    # alone in its own chunk and wave it through), then apply the skew
    # guard over the combined batch's day distribution.
    batch: dict[int, float] = {}
    for pdf in pdfs:
        pdf = pdf.dropna(subset=["ts", "value"])
        if len(pdf) == 0:
            continue
        # dtype-agnostic epoch-day (Arrow may hand back datetime64[ns]
        # or [us] depending on pandas version; an int64 cast would be
        # silently 1000x off on one of them)
        day_idx = (
            pdf["ts"].dt.normalize() - pd.Timestamp("1970-01-01")
        ).dt.days
        for d, s in pdf.groupby(day_idx)["value"].sum().items():
            batch[int(d)] = batch.get(int(d), 0.0) + float(s)
    changed: set[int] = set()
    if batch:
        bdays = sorted(batch)
        q95 = bdays[int(0.95 * (len(bdays) - 1))]
        skew_cap = q95 + ANOMALY_MAX_FUTURE_SKEW
        for d, s in batch.items():
            if d > skew_cap:
                continue  # broken-clock day: never enters state
            acc[d] = acc.get(d, 0.0) + s
            changed.add(d)
    horizon = None
    if acc:
        horizon = max(acc) - ANOMALY_RETAIN_DAYS
        acc = {d: s for d, s in acc.items() if d > horizon}
    state.update((list(acc.keys()), list(acc.values())))

    days_sorted = sorted(acc)
    rounded = {d: _py_rnd(acc[d], 4) for d in days_sorted}
    rows = []
    for d in days_sorted:
        # only days this batch touched (directly, or through their
        # baseline window) can have a new score
        if not any(
            d - ANOMALY_BASELINE_DAYS <= c <= d for c in changed
        ):
            continue
        # a day whose baseline window dips below the retention horizon
        # would score against a truncated baseline — never emit that
        if horizon is not None and d - ANOMALY_BASELINE_DAYS <= horizon:
            continue
        base = [
            rounded[b]
            for b in days_sorted
            if d - ANOMALY_BASELINE_DAYS <= b <= d - 1
        ]
        n = len(base)
        if n < ANOMALY_MIN_BASELINE:
            continue
        s = 0.0
        ss = 0.0
        for v in base:  # ascending-day order, matching the batch frame
            s += v
            ss += v * v
        mean = _py_rnd(s / n, 6)
        sd = _py_rnd(math.sqrt(max((ss - s * s / n) / (n - 1), 0.0)), 6)
        if sd <= 0.0:
            continue
        z = _py_rnd((rounded[d] - mean) / sd, 4)
        rows.append(
            (
                key[0],
                datetime.date(1970, 1, 1) + datetime.timedelta(days=d),
                rounded[d],
                n,
                mean,
                sd,
                z,
                abs(z) > 2.0,
            )
        )
    yield pd.DataFrame(
        rows,
        columns=[
            "event_type",
            "day",
            "day_total",
            "n_baseline",
            "baseline_mean",
            "baseline_sd",
            "zscore",
            "is_anomaly",
        ],
    )


def anomaly_stream(
    stream_df: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """``ts_rolling_zscore_anomalies`` as an incrementally-maintained
    stateful stream: per-key per-day raw sums accumulate across
    micro-batches (late rows within the retention window simply add
    in), and each batch re-scores ONLY the days it touched — directly,
    or through their trailing 14-day baseline — emitting them in
    update mode (an unchanged day is never re-emitted; a sink must
    upsert on (key, day), not expect complete snapshots per tick).
    Scores use the batch query's exact rounding ladder, so every
    emission row-matches it and the converged union of emissions IS
    the batch result (test_anomaly_stream_matches_batch). Days whose
    baseline window has been partially trimmed by retention are never
    re-scored. State is bounded at (keys x ANOMALY_RETAIN_DAYS)
    two-number entries — calendar-sized, never event-sized, at any
    traffic volume."""
    ensure_worker_imports(stream_df.sparkSession)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        _update_anomaly,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
