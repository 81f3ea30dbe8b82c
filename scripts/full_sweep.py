"""Full-catalog driver-gate replica sweep.

Runs every catalog query AND its DuckDB oracle at the given scale
factor under a hostile session timezone (the external driver does not
run in UTC), comparing through tests/oracle_harness.compare — the
exact canonicalization the driver applies (including the non-scalar
cell rejection and the HUGEINT dtype hazard check).

Usage:
    python scripts/full_sweep.py [sf_dir] [--tz America/New_York]

Exit code 0 iff every query matches. Prints one line per failure and a
summary. Generated oracles (callable SQL) are resolved against the
SAME sf_dir so expected-value tables match the grading scale.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--tz", default="America/New_York")
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--shuffle-partitions", type=int, default=16)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    os.environ["TZ"] = args.tz
    time.tzset()

    from energy_data_pipeline_spark.plans.catalog import CATALOG
    from energy_data_pipeline_spark.session import get_spark
    from tests.oracle_harness import compare, duck_connection

    spark = get_spark(
        app_name="full-sweep",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.conf.set("spark.sql.session.timeZone", args.tz)
    con = duck_connection(args.sf_dir)

    names = list(CATALOG)
    if args.only:
        requested = [n for n in args.only.split(",") if n]
        unknown = sorted(set(requested) - set(CATALOG))
        if unknown:
            # a typo'd name silently shrinking the sweep is a
            # false-green hazard in the gate replica — hard error
            print(f"unknown query names in --only: {', '.join(unknown)}")
            sys.exit(2)
        names = requested
    fails, rows_only = [], []
    t0 = time.time()
    for i, name in enumerate(names, 1):
        fn, sql = CATALOG[name]
        try:
            if callable(sql):
                sql = sql(args.sf_dir)
            df = fn(spark, args.sf_dir)
            if sql is None:
                n = df.count()
                rows_only.append(name)
                status = f"rows-only ({n})"
            else:
                rep = compare(df, con, sql)
                status = "ok" if rep["ok"] else f"FAIL {rep['issues']}"
                if not rep["ok"]:
                    fails.append((name, rep["issues"]))
        except Exception as e:  # noqa: BLE001 — sweep must visit every query
            status = f"ERROR {type(e).__name__}: {e}"
            fails.append((name, [str(e)[:300]]))
        if status != "ok":
            print(f"[{i}/{len(names)}] {name}: {status}", flush=True)
        elif i % 25 == 0:
            print(f"[{i}/{len(names)}] ... green so far", flush=True)
    wall = time.time() - t0
    # plan-cache headroom: LRU eviction past _MAX_ENTRIES unpersists
    # pins and causes rebuild storms every bench round — surface the
    # occupancy after a full catalog pass so growth is caught here,
    # not as a mystery perf regression
    from energy_data_pipeline_spark.plans import plan_cache

    n_memo = len(plan_cache._MEMO)
    cache_note = f"plan-cache {n_memo}/{plan_cache._MAX_ENTRIES} entries"
    if n_memo >= plan_cache._MAX_ENTRIES - 8:
        cache_note += " — HEADROOM LOW, raise _MAX_ENTRIES or prune pins"
    print(
        f"\nsweep: {len(names) - len(fails)}/{len(names)} green "
        f"({len(rows_only)} rows-only) in {wall:.0f}s at {args.sf_dir} "
        f"tz={args.tz} [{cache_note}]"
    )
    for name, issues in fails:
        print(f"  FAIL {name}: {issues}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
