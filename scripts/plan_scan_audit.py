"""Audit: how many times does each catalog query's physical plan scan
each source table? Repeated scans of the same parquet usually mean a
subtree is referenced N times without a pin (the t5 bug class: the
hourly aggregate was re-run four times before round 7 pinned it).

Prints one line per (query, table) with count >= the threshold, plus a
JSON summary. 2 scans is often legitimate (aggregate + join-back);
>= 3 deserves a look.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

THRESHOLD = int(os.environ.get("SCAN_AUDIT_THRESHOLD", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-scan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from energy_data_pipeline_spark.plans.catalog import CATALOG

    flagged: dict[str, dict[str, int]] = {}
    for name, (fn, _sql) in sorted(CATALOG.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan()
            # collectLeaves: InMemoryTableScan is itself a leaf, so a
            # pinned subtree counts ONCE no matter how many times the
            # plan string reprints its cached definition
            leaves = plan.collectLeaves()
        except Exception as e:  # noqa: BLE001 — audit only
            print(f"{name}: PLAN ERROR {e}", file=sys.stderr)
            continue
        counts: dict[str, int] = {}
        n_leaves = leaves.size()
        for i in range(n_leaves):
            leaf = leaves.apply(i)
            s = leaf.toString()
            m = re.search(r"/([a-z]+)\.parquet", s)
            if m and "InMemory" not in leaf.nodeName():
                t = m.group(1)
                counts[t] = counts.get(t, 0) + 1
        hot = {t: c for t, c in counts.items() if c >= THRESHOLD}
        if hot:
            flagged[name] = hot
            print(f"{name}: {hot}")
    print(json.dumps({"threshold": THRESHOLD, "flagged": flagged}))
    spark.stop()


if __name__ == "__main__":
    main()
