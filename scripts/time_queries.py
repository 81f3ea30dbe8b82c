"""Quiet med-of-N timer for a subset of catalog queries.

Usage: python scripts/time_queries.py q1 q2 ... [--reps N]
Mirrors bench.py's session config + warmup so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("time-queries")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from energy_data_pipeline_spark.plans.catalog import CATALOG
    from energy_data_pipeline_spark.sources import load_table
    from energy_data_pipeline_spark.sources.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, t).limit(1).count()
        except Exception:
            pass

    import pandas as _pd  # noqa: F401

    def _ident(it):
        yield from it

    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        _ident, schema="id long"
    ).count()

    from pyspark.sql import functions as F

    warm = spark.range(0, 2000, 1, int(cpus)).select(
        F.concat_ws(" ", F.lit("a b c d"), F.col("id").cast("string")).alias("t")
    )
    warm.select(
        F.md5("t"),
        F.array_sort(F.array_distinct(F.filter(F.split("t", r"\s+"), lambda w: w != ""))),
        F.regexp_extract("t", r"(\d+)", 1),
    ).write.format("noop").mode("overwrite").save()

    # same fixed CPU-calibration probe as bench.py (SCALE.md "bench
    # calibration") so ad-hoc timings are comparable to artifacts
    def _calibration() -> float:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(0, 2_000_000, 1, int(cpus)).select(
                F.sum(F.crc32(F.md5(F.col("id").cast("string"))))
            ).collect()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        return round(runs[1], 3)

    out = {"_calibration_s": _calibration()}
    for name in args:
        fn, _sql = CATALOG[name]
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        samples.sort()
        out[name] = {"min": samples[0], "med": samples[len(samples) // 2], "max": samples[-1]}
        print(f"{name}: {out[name]}", file=sys.stderr)
        # NO clearCache between queries/reps — bench.py deliberately
        # keeps pins warm (see its comment); clearing here made these
        # numbers incomparable to the artifact being diagnosed.
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
