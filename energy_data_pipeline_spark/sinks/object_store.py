"""Object-store conditional-PUT commit backend for manifest tables.

``sinks/manifest_table.py``'s default commit CAS is a kernel ``flock``
— correct, but filesystem-local. Real multi-node deployments commit
through an object store's conditional write (S3 ``If-Match`` /
``If-None-Match: *`` conditional PUT, GCS ``x-goog-if-generation-match``)
— the store, not the writers' filesystem, adjudicates which commit
wins. This module supplies that backend through the SAME injectable
``compare_and_swap`` seam:

- :func:`http_conditional_put_cas` — a ``CasFn`` that adjudicates the
  pointer flip against an HTTP object store speaking the standard
  conditional-PUT contract (GET returns ``ETag``; PUT with
  ``If-Match: <etag>`` succeeds iff the object's ETag still matches,
  ``If-None-Match: *`` iff the object does not exist; a failed
  precondition is ``412``). Pure stdlib ``urllib`` — the same
  real-transport discipline as ``sources/pv_api.py``.
- :class:`LoopbackConditionalStore` — an in-process ``http.server``
  implementing exactly that contract (atomic under one lock, ETag =
  monotonically increasing generation), so the two-writer commit race
  is testable end-to-end through a REAL HTTP seam inside the sandbox.
  A deployment changes the base URL to its store/gateway, not code —
  the reference delegates this adjudication to Postgres transactions
  (daily_pv_automation.py:201-224); this is the file-table equivalent.

Protocol note (why this is a true CAS, unlike check-then-rename): two
writers that both read generation N and race their PUTs cannot both
win — the store compares-and-swaps the generation under its own lock,
so exactly one PUT returns 200 and the other 412 → the loser raises
``CommitConflictError``, re-reads, and retries on the new version.
The local ``_CURRENT`` file is applied only AFTER the store accepts
the commit, so local readers always see a store-adjudicated pointer.
"""

from __future__ import annotations

import os
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .manifest_table import CasFn, CommitConflictError


def _get_object(base_url: str, key: str) -> tuple[str | None, str | None]:
    """(value, etag) of the object, or (None, None) if absent."""
    try:
        with urllib.request.urlopen(f"{base_url}/{key}", timeout=10) as r:
            return r.read().decode("utf-8"), r.headers.get("ETag")
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return None, None
        raise


def _put_if(base_url: str, key: str, body: str, etag: str | None) -> bool:
    """Conditional PUT: If-Match when replacing, If-None-Match: * when
    creating. True on success, False on 412 (precondition failed)."""
    req = urllib.request.Request(
        f"{base_url}/{key}", data=body.encode("utf-8"), method="PUT"
    )
    if etag is None:
        req.add_header("If-None-Match", "*")
    else:
        req.add_header("If-Match", etag)
    try:
        with urllib.request.urlopen(req, timeout=10):
            return True
    except urllib.error.HTTPError as e:
        if e.code == 412:
            return False
        raise


def http_conditional_put_cas(base_url: str, key: str = "_CURRENT") -> CasFn:
    """Build a ``compare_and_swap`` for ``manifest_table`` commits that
    adjudicates through an HTTP object store's conditional PUT.

    Lost-update safety does NOT depend on the GET→PUT gap: the GET
    only verifies the writer staged against the live version (and
    learns the ETag); the PUT is what decides, atomically in the
    store. A writer whose parent is stale fails the value check; a
    writer racing another commit between its GET and PUT fails the
    ETag precondition — either way ``CommitConflictError``, never a
    lost update."""
    base = base_url.rstrip("/")

    def cas(current_path: str, tmp_path: str, expected: str | None) -> None:
        with open(tmp_path, encoding="utf-8") as f:
            new_val = f.read().strip()
        val, etag = _get_object(base, key)
        if val != expected:
            # REPAIR the local pointer to the store's truth before
            # rejecting: a writer that crashed between its accepted PUT
            # and its local replace leaves _CURRENT lagging the store,
            # and without the repair every retry re-reads the stale
            # local parent and conflicts forever. The store is the
            # authority; the local file is a cache of it. Concurrent
            # repairs may interleave so the cache transiently regresses
            # to an older STORE value — still a committed snapshot
            # (manifests are immutable), and the next conflict
            # re-repairs; correctness never rests on the cache.
            if val is not None:
                repair = f"{current_path}.repair.{os.getpid()}"
                with open(repair, "w", encoding="utf-8") as f:
                    f.write(val)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(repair, current_path)
            os.remove(tmp_path)
            raise CommitConflictError(
                f"concurrent commit detected via {base}/{key}: expected "
                f"live manifest {expected!r}, store holds {val!r}; "
                "local pointer repaired — re-read and retry"
            )
        if not _put_if(base, key, new_val, etag):
            os.remove(tmp_path)
            raise CommitConflictError(
                f"conditional PUT to {base}/{key} failed its precondition "
                f"(generation moved past {etag!r}); re-read and retry"
            )
        # the store accepted the commit — apply the pointer locally so
        # filesystem readers resolve the same version the store names
        os.replace(tmp_path, current_path)

    return cas


class LoopbackConditionalStore:
    """In-process HTTP object store implementing the conditional-PUT
    contract (GET → body + ETag; PUT guarded by If-Match /
    If-None-Match: *; 412 on a failed precondition). State is an
    in-memory dict guarded by one lock — the PUT's check-and-swap is
    atomic the way S3's conditional write is. Test/dev stand-in: the
    contract, status codes, and headers are the real ones."""

    def __init__(self) -> None:
        self._objects: dict[str, tuple[str, int]] = {}  # key -> (body, gen)
        self._lock = threading.Lock()
        store = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def do_GET(self):
                key = self.path.lstrip("/")
                with store._lock:
                    ent = store._objects.get(key)
                if ent is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                body, gen = ent
                data = body.encode("utf-8")
                self.send_response(200)
                self.send_header("ETag", f'"{gen}"')
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_PUT(self):
                key = self.path.lstrip("/")
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode("utf-8")
                if_match = self.headers.get("If-Match")
                if_none = self.headers.get("If-None-Match")
                with store._lock:
                    ent = store._objects.get(key)
                    if if_none == "*":
                        ok = ent is None
                    elif if_match is not None:
                        ok = ent is not None and f'"{ent[1]}"' == if_match
                    else:
                        ok = True  # unconditional PUT (not used by CAS)
                    if ok:
                        gen = (ent[1] + 1) if ent else 0
                        store._objects[key] = (body, gen)
                if not ok:
                    self.send_response(412)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("ETag", f'"{gen}"')
                self.end_headers()

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    @property
    def base_url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "LoopbackConditionalStore":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "LoopbackConditionalStore":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
