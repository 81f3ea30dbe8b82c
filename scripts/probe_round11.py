"""Round-11 scale probe (conventions of scale_probe.py; appends under
"round11" in scale_probe_results.json).

pareto_100x — the concentration-query pair at 10k vs 1M users over
12M synthetic events, running the ACTUAL catalog plans via synthetic
sf_dirs:

- ``a19_pareto_value_share``: the exact answer via a global ranked
  window over the per-user profile — correct, but the ranking is a
  single-reducer sort whose cost bends with ENTITY count (its
  docstring's documented 10⁹-user limit).
- ``a21_pareto_binned_share``: the round-11 entity-count-proof twin —
  approx-quantile bins (one sketch aggregate, broadcast thresholds)
  + a |bins|-row cumulative. Expected ~flat in user count at fixed
  event volume.

Both probes clear the plan cache per rep so a21's memoized plan (and
its collected bin edges) cannot serve a warm answer — each rep pays
the full train+score path, which is what a fresh 100 TB run pays.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scale_probe import timed  # noqa: E402

N_EVENTS = 12_000_000


def synth_events_users(spark: SparkSession, n: int, n_users: int):
    """events-shaped frame with a configurable user-id modulus (the
    probe's variable is ENTITY count at fixed event volume)."""
    return spark.range(0, n, 1, 64).select(
        F.col("id").alias("event_id"),
        F.timestamp_add(
            "SECOND",
            (F.col("id") * 7 % 5_184_000).cast("long"),
            F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("ts"),
        F.pmod(F.xxhash64("id"), n_users).alias("user_id"),
        F.element_at(
            F.array(
                F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("error")
            ),
            (F.pmod(F.xxhash64("id", F.lit(1)), 4) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 10_000) / 100.0).alias("value"),
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from energy_data_pipeline_spark.plans import plan_cache
    from energy_data_pipeline_spark.plans.catalog import CATALOG

    base = tempfile.mkdtemp(prefix="probe11_")
    results: dict[str, float] = {}
    try:
        for label, n_users in (
            ("10k", 10_000),
            ("1m", 1_000_000),
            # profile-sized point: every event its own user, so the
            # post-aggregate stage sees a 12M-row profile — where the
            # unpartitioned ranked window's single-reducer sort is the
            # cost and the sketch+bin path is not
            ("12m", N_EVENTS),
        ):
            d = os.path.join(base, f"ev_{label}")
            os.makedirs(d)
            synth_events_users(spark, N_EVENTS, n_users).write.parquet(
                os.path.join(d, "events.parquet")
            )
            for key, qname in (
                ("a19", "a19_pareto_value_share"),
                ("a21", "a21_pareto_binned_share"),
            ):
                fn, _sql = CATALOG[qname]

                def run(fn=fn, d=d):
                    plan_cache.clear()
                    fn(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()

                results[f"{key}_{label}_users"] = timed(run)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    summary = {
        "a19_100x_users": round(
            results["a19_1m_users"] / results["a19_10k_users"], 2
        ),
        "a21_100x_users": round(
            results["a21_1m_users"] / results["a21_10k_users"], 2
        ),
        "a19_1200x_users": round(
            results["a19_12m_users"] / results["a19_10k_users"], 2
        ),
        "a21_1200x_users": round(
            results["a21_12m_users"] / results["a21_10k_users"], 2
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_probe_results.json",
    )
    try:
        existing = json.load(open(out_path))
    except Exception:
        existing = {}
    existing.setdefault("round11", {})["pareto"] = {
        "raw": results,
        "summary": summary,
    }
    json.dump(existing, open(out_path, "w"), indent=1)
    print(json.dumps({"raw": results, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
