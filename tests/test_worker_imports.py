"""Regression: Python-UDF queries must work when the external driver
process is launched from a CWD other than the repo root.

Round-1 verdict item #1: executors' Python workers resolve imports from
their own CWD/sys.path, so ``mapInPandas``/``applyInPandas`` closures
that reference package modules died with ``ModuleNotFoundError`` unless
the driver happened to run from /root/repo. ``shipping.
ensure_worker_imports`` fixes this by ``addPyFile``-ing a package zip.

The failure is only reproducible in a separate process whose CWD is NOT
the repo (pytest itself runs from the repo, and local-mode workers
inherit that CWD), so this test launches a subprocess driver-sim from a
temp directory and runs every Python-UDF catalog query.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER_SIM = textwrap.dedent(
    """
    import sys

    sys.path.insert(0, "@REPO@")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("foreign-cwd-driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    qs = E.queries()
    sf = "@SF_DIR@"
    # every Python-UDF path in the catalog + one native control query
    wanted = [
        "mm_feature_extract",
        "mm_frame_plan",
        "t3_spline_impute_view_series",
        "t5_impute_pipeline_demo",
        "a1_hourly_sum_by_type",
    ]
    missing = [n for n in wanted if n not in qs]
    if missing:
        raise SystemExit(
            f"CATALOG_RENAMED: {missing} absent from queries() - update "
            "tests/test_worker_imports.py's UDF-query list"
        )
    for name in wanted:
        n = qs[name](spark, sf).count()
        print(f"OK {name} rows={n}")
    spark.stop()
    print("ALL_GREEN")
    """
)


def test_pkg_zip_rebuilds_on_source_change(tmp_path, monkeypatch):
    # the zip cache is keyed on a content digest: editing a source in a
    # long-lived process must produce a fresh zip, not re-ship stale code
    from energy_data_pipeline_spark import shipping

    src = tmp_path / "m.py"
    src.write_text("x = 1\n")
    monkeypatch.setattr(
        shipping, "_source_files", lambda: [(str(src), "pkg/m.py")]
    )
    z1 = shipping._build_pkg_zip()
    assert shipping._build_pkg_zip() == z1  # unchanged sources → cache hit
    src.write_text("x = 2\n")
    st = os.stat(src)
    # force a distinct mtime even on coarse-granularity filesystems
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    z2 = shipping._build_pkg_zip()
    assert z2 != z1


def test_udf_queries_from_foreign_cwd(tmp_path):
    import pytest

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        pytest.skip(f"driver test data absent at {sf_dir}")
    script = tmp_path / "driver_sim.py"
    script.write_text(
        _DRIVER_SIM.replace("@REPO@", REPO).replace("@SF_DIR@", sf_dir)
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the external driver sets no PYTHONPATH
    }
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"driver-sim failed:\n{proc.stdout}\n{proc.stderr}"
    assert "ALL_GREEN" in proc.stdout, proc.stdout
    assert "ModuleNotFoundError" not in proc.stderr
