"""Prepared-plan memo for catalog queries.

Building a DataFrame pays Catalyst analysis at CONSTRUCTION time —
measured ~1.5 s of driver work for the minhash chain (a 96-aggregate
signature stage over higher-order-function shingle expressions), paid
again on every rebuild even though the logical plan is identical. Every
mature engine caches prepared plans; this is that, at the catalog layer:
one (SparkContext, key) -> DataFrame memo, so the three dedup queries
that share the minhash pair chain (pairs / clusters / purge) and
repeated invocations of the same query reuse one analyzed plan object.

Rules for what may be memoized — the caller's responsibility:
- PURE declarative frames only: plans built solely from source tables
  and transformations. Never memoize frames whose lineage was truncated
  by checkpointing or that embed run-specific state (the connected-
  components OUTPUT is iterative/checkpointed and must be rebuilt per
  run; its INPUT pair frame is declarative and memoizable).
- DETERMINISTIC literals are fine: a plan may embed values collected
  from the snapshot (IVF seed / Lloyd-trained centroids) when the
  computation is a pure deterministic function of the immutable data —
  that is model/index caching, standard for any vector store. A value
  that depends on run order, time, or RNG state must not be embedded.
- Source data must be immutable for the lifetime of the memo (true for
  the engine's parquet snapshot tables; a mutating-table catalog would
  key on a snapshot/version id — see sinks/manifest_table.py).

persist() registrations do not survive ``spark.catalog.clearCache()``,
so the memo stores each pinned sub-frame with its storage level and
re-registers on reuse — the plan is reused, the data re-materializes on
the next action if its cache entry was dropped. This keeps the memo
correct under arbitrary cache eviction: losing cached DATA only costs
recompute; the memoized PLAN is immutable.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from collections.abc import Callable, Hashable

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

# pinned sub-frame + the level it must be re-registered at
PinList = list[tuple[DataFrame, StorageLevel]]

# LRU-bounded: a long-lived service touching many snapshot directories
# must not accumulate plan objects (each holds its analyzed tree and
# pinned-frame references) without bound. 64 (plan, pins) entries is a
# few MB of driver heap; eviction only drops the PLAN — any data cached
# for its pins is governed by Spark's own block manager, and a rebuilt
# plan re-registers identical pins (same canonicalized subtrees), so an
# evicted-and-rebuilt entry even re-hits the existing data cache.
_MAX_ENTRIES = 64
_MEMO: OrderedDict[tuple, tuple[DataFrame, PinList]] = OrderedDict()
_LOCK = threading.Lock()


def cached_plan(
    spark: SparkSession,
    key: tuple[Hashable, ...],
    builder: Callable[[], tuple[DataFrame, PinList]],
) -> DataFrame:
    """Return the memoized DataFrame for ``key``, building it once per
    SparkContext. ``builder`` returns (frame, pins); pins are
    re-persisted on every reuse in case the cache was cleared since."""
    full_key = (id(spark.sparkContext),) + key
    with _LOCK:
        ent = _MEMO.get(full_key)
        if ent is not None:
            _MEMO.move_to_end(full_key)
    if ent is None:
        built = builder()  # outside the lock: builders may run Spark jobs
        with _LOCK:
            ent = _MEMO.setdefault(full_key, built)
            _MEMO.move_to_end(full_key)
            while len(_MEMO) > _MAX_ENTRIES:
                _MEMO.popitem(last=False)
    df, pins = ent
    for frame, level in pins:
        if not frame.is_cached:
            frame.persist(level)
    return df


def clear() -> None:
    """Drop all memoized plans (test hook)."""
    with _LOCK:
        _MEMO.clear()
