"""Split each query's wall time into DataFrame BUILD (fn call: py4j +
Catalyst construction/analysis) vs EXECUTION (noop write of the built
frame), med-of-3 each, bench-identical session. Tells you whether a
slow query needs a prepared-plan memo (build-bound) or a plan-shape
change (exec-bound).

Usage: python scripts/build_vs_exec.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("build-vs-exec")
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

    def _ident(it):
        yield from it

    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        _ident, schema="id long"
    ).count()

    print(f"{'query':<35} {'build_med':>9} {'exec_med':>9} {'total':>7}")
    for name in names:
        if name not in CATALOG:
            print(f"{name}: UNKNOWN", file=sys.stderr)
            continue
        fn, _sql = CATALOG[name]
        builds, execs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        builds.sort()
        execs.sort()
        b, e = builds[1], execs[1]
        print(f"{name:<35} {b:9.3f} {e:9.3f} {b + e:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
