"""Audit every catalog query's physical plan for structural smells:

- duplicated window expressions (total _weN attrs vs distinct window
  function calls — the rnd-over-window blowup class, found 150-for-15
  in ts_ewma_daily round 12)
- join strategies: SortMergeJoin / CartesianProduct /
  BroadcastNestedLoopJoin occurrences
- Python boundary nodes (BatchEvalPython / ArrowEvalPython /
  MapInPandas / MapInArrow)
- Exchange count

Plan-only (no execution): one Catalyst pass per query.

Usage: python scripts/plan_shape_audit.py [--json out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-shape-audit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from energy_data_pipeline_spark.plans.catalog import CATALOG

    rows = []
    for name, (fn, _sql) in sorted(CATALOG.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — audit only
            print(f"{name}: PLAN ERROR {e}", file=sys.stderr)
            continue
        we_total = len(set(re.findall(r"_we\d+#x?\d*", plan)))
        # distinct window FUNCTION instances: lines inside Window args
        win_args = re.findall(r"windowspecdefinition", plan)
        rows.append(
            {
                "query": name,
                "we_attrs": we_total,
                "winspec_refs": len(win_args),
                "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
                "smj": len(re.findall(r"SortMergeJoin", plan)),
                "cartesian": len(re.findall(r"CartesianProduct", plan)),
                "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
                "python": len(
                    re.findall(
                        r"BatchEvalPython|ArrowEvalPython|MapInPandas|"
                        r"MapInArrow|FlatMapGroupsInPandas",
                        plan,
                    )
                ),
            }
        )

    rows.sort(key=lambda r: (-r["we_attrs"], -r["exchanges"]))
    print(
        f"{'query':<36} {'weattr':>6} {'wspec':>6} {'exch':>5} "
        f"{'smj':>4} {'cart':>4} {'bnlj':>4} {'py':>3}"
    )
    for r in rows:
        flag = ""
        if r["we_attrs"] > 3 * max(1, r["winspec_refs"]) // 2:
            flag = "  <-- window dup?"
        print(
            f"{r['query']:<36} {r['we_attrs']:>6} {r['winspec_refs']:>6} "
            f"{r['exchanges']:>5} {r['smj']:>4} {r['cartesian']:>4} "
            f"{r['bnlj']:>4} {r['python']:>3}{flag}"
        )
    out = None
    argv = sys.argv[1:]
    if "--json" in argv:
        out = argv[argv.index("--json") + 1]
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
