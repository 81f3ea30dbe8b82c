"""Probe: per-batch cost of the incremental-ingest idempotency filter
vs committed-table size — plain left_anti against the full committed
key column (the pre-round-12 shape) vs the semi-filtered anti-join
(operators/dedup.anti_join_new_keys).

Synthetic keys on disk (bigint parquet), batch fixed at 1k keys, the
committed side swept over decades. The number that matters is the
SLOPE: the old shape shuffles+sorts the committed side per batch (cost
grows with table size); the new shape only scans it (cost grows with
scan time only — no shuffle, no sort).

Appends under "round12_ingest_antijoin" in scale_probe_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import tempfile

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-ingest-antijoin")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from energy_data_pipeline_spark.operators.dedup import anti_join_new_keys

    tmp = tempfile.mkdtemp(prefix="ingest_probe_")
    batch = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    batch.localCheckpoint()  # settle the batch side

    results = {}
    for n in (100_000, 1_000_000, 10_000_000):
        path = os.path.join(tmp, f"committed_{n}")
        # half the batch keys overlap the committed set
        spark.range(500, n + 500).withColumnRenamed(
            "id", "doc_id"
        ).write.mode("overwrite").parquet(path)
        committed = spark.read.parquet(path)

        def timed(df):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            runs.sort()
            return round(runs[1], 3)

        old = batch.join(committed, "doc_id", "left_anti")
        new = anti_join_new_keys(batch, committed, "doc_id")
        n_new = new.count()
        n_old = old.count()
        assert n_old == n_new == 500, (n_old, n_new)
        results[f"committed_{n}"] = {
            "plain_left_anti_s": timed(old),
            "semi_filtered_s": timed(new),
        }
        print(n, results[f"committed_{n}"], flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_probe_results.json",
    )
    try:
        with open(out_path) as f:
            all_results = json.load(f)
    except (OSError, ValueError):
        all_results = {}
    all_results["round12_ingest_antijoin"] = {
        "batch_rows": 1000,
        "overlap_rows": 500,
        "reps": "med-of-3 noop",
        **results,
    }
    with open(out_path, "w") as f:
        json.dump(all_results, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
