"""Dump .explain("formatted") for catalog queries to plans/<round>/.

Usage: python scripts/explain_dump.py --out plans/r12 --tag before q1 q2 ...
       python scripts/explain_dump.py --out plans/r12 --tag after --all

Mirrors bench.py's session config so the captured plan (join strategy,
exchange count, pushed filters) is the one the bench actually runs.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = "before"
    out_dir = "plans/r12"
    dump_all = "--all" in sys.argv
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--tag" and i + 1 < len(argv):
            tag = argv[i + 1]
            names = [n for n in names if n != tag]
        if a == "--out" and i + 1 < len(argv):
            out_dir = argv[i + 1]
            names = [n for n in names if n != out_dir]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("explain-dump")
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

    if dump_all:
        names = sorted(CATALOG)
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _sql = CATALOG[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            plan = f"EXPLAIN FAILED: {e}"
        # normalize plan-id noise so before/after diffs are readable
        plan = re.sub(r"#\d+L?", "#x", plan)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({tag}) sf_dir={sf_dir}\n")
            f.write(plan)
            if not plan.endswith("\n"):
                f.write("\n")
        n_exchange = plan.count("Exchange")
        n_python = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        )
        joins = sorted(set(re.findall(r"(\w*Join\w*)", plan)))
        print(f"{name}: exchanges={n_exchange} python_nodes={n_python} joins={joins} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
