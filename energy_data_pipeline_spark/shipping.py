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

import hashlib
import os
import tempfile
import threading
import zipfile

from pyspark.sql import SparkSession

_PKG_NAME = "energy_data_pipeline_spark"
_lock = threading.Lock()
_shipped_apps: set[str] = set()
_zips_by_digest: dict[str, str] = {}


def _source_files() -> list[tuple[str, str]]:
    """(absolute, zip-relative) paths of every .py source in the package."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = []
    for root, _dirs, files in os.walk(pkg_dir):
        for name in sorted(files):
            if name.endswith(".py"):
                full = os.path.join(root, name)
                out.append((full, os.path.relpath(full, os.path.dirname(pkg_dir))))
    return out


def _build_pkg_zip() -> str:
    """Zip the package's .py sources into a per-process temp file.

    Cached by a content digest (path, size, mtime of every source), not
    for the process lifetime: a long-lived process that edits sources
    and then starts a fresh SparkContext (test suites reloading modules)
    ships the CURRENT sources, not a stale zip.
    """
    files = _source_files()
    h = hashlib.sha256()
    for full, rel in files:
        st = os.stat(full)
        h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
    digest = h.hexdigest()[:16]
    cached = _zips_by_digest.get(digest)
    if cached is not None and os.path.exists(cached):
        return cached
    fd, path = tempfile.mkstemp(
        prefix=f"{_PKG_NAME}_{os.getpid()}_{digest}_", suffix=".zip"
    )
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in files:
            zf.write(full, rel)
    # evict superseded digests so an edit-and-rerun loop holds at most
    # one zip on disk (addPyFile copied any prior zip into Spark's own
    # tempdir, so deleting ours cannot break a running application)
    for old_digest, old_path in list(_zips_by_digest.items()):
        del _zips_by_digest[old_digest]
        try:
            os.remove(old_path)
        except OSError:
            pass
    _zips_by_digest[digest] = path
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
