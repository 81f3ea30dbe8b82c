"""End-to-end corpus refresh — the full training-data pipeline as one
orchestrated flow: quality gate → exact dedup → near-dup purge →
mixture report + sequence pack plan, each stage landing as a parquet
table under ``base_dir``.

This is the composition story for the engine's corpus surface: every
stage is an operator the catalog already verifies one-by-one against
the DuckDB oracle (txt_quality_filtered_corpus, dd_exact_dup_groups,
dd_dedup_purged_corpus, smp_corpus_mix_report, pk_sequence_pack_plan);
the flow wires them through the orchestration layer (jobs/orchestrate:
dependency DAG, per-task retries, failure → downstream-SKIPPED) so a
scheduler tick refreshes the whole chain. Re-running is idempotent:
every write is a truncate-reload of a derived table, so a crash retry
or double tick converges on the same state.

Scale posture: stages hand DataFrames (plans), not materialized data —
Spark fuses each task's lineage into its write; the purge stage reuses
the same bucketed near-dup + size-gated connected-components machinery
as the catalog query (no collect of corpus-scale data on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import neardup
from ..operators.components import connected_components
from ..operators.dedup import dedup_keep_first
from ..operators.packing import sequence_pack_plan
from .orchestrate import Flow

NEAR_DUP_THRESHOLD = 0.5
PACK_SEQ_LEN = 2048


def _cluster_losers(
    clean: DataFrame, labels: DataFrame, keeper: str
) -> DataFrame:
    """Non-keeper cluster members under the chosen policy: ``min_id``
    (keep whichever crawled first — cheapest, no second corpus touch)
    or ``best_quality`` (rounded quality-score argmax, min-id tiebreak
    — the keep-the-best-copy policy of ``dd_quality_winner_purged``;
    quality is computed only for cluster members via a doc_id
    equi-join, so the extra cost is membership-sized)."""
    if keeper == "min_id":
        return labels.filter(F.col("vertex") != F.col("cluster_id")).select(
            F.col("vertex").alias("doc_id")
        )
    if keeper == "best_quality":
        from pyspark.sql import Window

        members = labels.select(
            F.col("vertex").alias("doc_id"), "cluster_id"
        )
        mq = clean.join(members, "doc_id").select(
            "doc_id", "cluster_id", T.quality_score("text").alias("_q")
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.desc("_q"), F.asc("doc_id")
        )
        return (
            mq.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") > 1)
            .select("doc_id")
        )
    raise ValueError(f"unknown keeper policy: {keeper!r}")


def corpus_refresh_flow(
    spark: SparkSession,
    source_path: str,
    base_dir: str,
    near_dup_threshold: float = NEAR_DUP_THRESHOLD,
    keeper: str = "min_id",
) -> Flow:
    """Build the refresh flow over the documents parquet at
    ``source_path``. Outputs under ``base_dir``:

    - ``clean/``     quality-gated, exact-deduped (fingerprint
                     keep-first) documents
    - ``purged/``    near-dup purged corpus (cluster keeper per
                     ``keeper``: "min_id" or "best_quality")
    - ``mixture/``   per-(source, lang) doc/token mixture table
    - ``pack_plan/`` (doc_id, pack_shard, seq_id, seq_offset) trainer
                     tape plan
    """

    def gate():
        docs = spark.read.parquet(source_path)
        clean = dedup_keep_first(
            docs.filter(T.quality_keep("text")).withColumn(
                "fp", T.fingerprint("text")
            ),
            keys=["fp"],
            order_col="doc_id",
        ).drop("fp")
        clean.write.mode("overwrite").parquet(f"{base_dir}/clean")
        return f"{base_dir}/clean"

    def purge(gate):
        clean = spark.read.parquet(gate)
        pairs = neardup.minhash_lsh_near_dups(
            clean, "doc_id", "text", threshold=near_dup_threshold, n=3
        )
        labels = connected_components(pairs, "id1", "id2")
        losers = _cluster_losers(clean, labels, keeper)
        purged = clean.join(losers, "doc_id", "left_anti")
        purged.write.mode("overwrite").parquet(f"{base_dir}/purged")
        return f"{base_dir}/purged"

    def mixture(purge):
        purged = spark.read.parquet(purge)
        mix = purged.groupBy("source", "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(T.words(F.col("text")))).alias("n_tokens"),
        )
        mix.write.mode("overwrite").parquet(f"{base_dir}/mixture")
        return f"{base_dir}/mixture"

    def pack_plan(purge):
        purged = spark.read.parquet(purge)
        plan = sequence_pack_plan(
            purged,
            "doc_id",
            F.size(T.words(F.col("text"))).cast("long"),
            ["source", "lang"],
            seq_len=PACK_SEQ_LEN,
        )
        plan.write.mode("overwrite").parquet(f"{base_dir}/pack_plan")
        return f"{base_dir}/pack_plan"

    flow = Flow("corpus-refresh")
    flow.task("gate", retries=1)(gate)
    flow.task("purge", depends_on=["gate"])(purge)
    flow.task("mixture", depends_on=["purge"])(mixture)
    flow.task("pack_plan", depends_on=["purge"])(pack_plan)
    return flow


def corpus_deployments(
    spark: SparkSession, source_path: str, base_dir: str
):
    """The corpus pipeline as a scheduled deployment (same registry
    machinery as the reference's Prefect deployments): a weekly refresh
    at Monday 03:00 — off-peak, and idempotent so a missed tick's
    catch-up or a double tick converges."""
    from .orchestrate import FlowRegistry

    reg = FlowRegistry()
    reg.register(
        "weekly-corpus-refresh",
        corpus_refresh_flow(spark, source_path, base_dir),
        cron="0 3 * * 1",
        tags=["corpus", "weekly"],
    )
    return reg
