"""Ship this package to Python workers, independent of driver CWD.

Closures passed to ``mapInPandas`` / ``applyInPandas`` reference
module-level helpers (``_fake_decode``, ``_spline_fill_series``,
``fake_pv_fetcher`` ...). cloudpickle serializes those by *module
reference*, so the executor-side Python worker must be able to
``import energy_data_pipeline_spark`` — but workers resolve imports
from their own CWD/sys.path, not the driver's. When an external driver
process launches from any directory other than the repo root, every
Python-UDF query dies with ``ModuleNotFoundError``.

Fix: on first UDF-plan construction per SparkContext, zip the package
(sources only, built from ``__file__``) and ``sc.addPyFile`` it. Spark
distributes the zip to every current and future executor and prepends
it to the worker's ``sys.path`` — the canonical mechanism for shipping
Python dependencies to a cluster, and a no-op-sized cost (one ~100 KB
file broadcast once per application).

Every operator that builds a Python-UDF stage calls
``ensure_worker_imports(df.sparkSession)`` before returning its plan;
plan construction is lazy, so the file is registered before any job
that needs it can run.
"""

from __future__ import annotations

import os
import tempfile
import threading
import zipfile

from pyspark.sql import SparkSession

_PKG_NAME = "energy_data_pipeline_spark"
_lock = threading.Lock()
_shipped_apps: set[str] = set()
_zip_path: str | None = None


def _build_pkg_zip() -> str:
    """Zip the package's .py sources into a per-process temp file.

    ``addPyFile`` copies the file into Spark's file server immediately,
    but we keep the source zip for the process lifetime anyway so repeat
    sessions in one process (test suites) reuse it.
    """
    global _zip_path
    if _zip_path is not None and os.path.exists(_zip_path):
        return _zip_path
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, path = tempfile.mkstemp(
        prefix=f"{_PKG_NAME}_{os.getpid()}_", suffix=".zip"
    )
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
    _zip_path = path
    return path


def ensure_worker_imports(spark: SparkSession) -> None:
    """Idempotently register the package zip with this application.

    Keyed by ``applicationId`` so a fresh SparkContext (new test
    session, driver restart) re-ships; repeat calls within one
    application are a dict lookup.
    """
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _shipped_apps:
        return
    with _lock:
        if app_id in _shipped_apps:
            return
        sc.addPyFile(_build_pkg_zip())
        _shipped_apps.add(app_id)
