"""Shared bounded registry for per-(application, sf_dir) memoized
artifacts — persisted DataFrames, trained models, materialized store
paths.

The dedup/similarity operators memoize intermediate results that several
downstream operators reuse (LSH candidate pairs, shingle sets, k-means
centroids, the IVF cell store).  Before this registry each module kept
its own unbounded dict, so a long-lived session iterating many sf_dirs
accumulated persisted DataFrames forever (the reference bounds its
caches; exporter/internal/queue_sender.go's queue is capacity-bounded for
the same reason).  Here:

- ONE registry, LRU-ordered, capped at :data:`MAX_ENTRIES` — evicting a
  DataFrame entry unpersists it, so executor storage memory is released.
- :func:`clear_caches` empties everything (called by
  ``plans.collector.Collector.shutdown`` — the Shutdown half of the
  component lifecycle, otelcol/collector.go shutdown sequence).
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict

#: bound on live memoized artifacts; evictions unpersist DataFrames.
MAX_ENTRIES = 24

_LOCK = threading.RLock()
_ENTRIES: OrderedDict = OrderedDict()


def _release(val) -> None:
    if isinstance(val, (tuple, list)):
        for v in val:                 # multi-relation artifacts
            _release(v)
        return
    unpersist = getattr(val, "unpersist", None)
    if callable(unpersist):
        try:
            unpersist(False)          # async release; no blocking eviction
        except Exception:
            pass                      # session already stopped


def cached(kind: str, spark, sf_dir: str, build, extra: tuple = ()):
    """Return the memoized artifact for (kind, app, dir, *extra), building
    it with ``build()`` on miss.  LRU touch on hit; LRU evict + unpersist
    past MAX_ENTRIES."""
    key = (kind, spark.sparkContext.applicationId,
           os.path.abspath(sf_dir), *extra)
    with _LOCK:
        if key in _ENTRIES:
            _ENTRIES.move_to_end(key)
            return _ENTRIES[key]
    val = build()                     # build outside the lock (slow path)
    with _LOCK:
        if key in _ENTRIES:           # racing builder won; keep theirs
            _release(val)
            return _ENTRIES[key]
        _ENTRIES[key] = val
        while len(_ENTRIES) > MAX_ENTRIES:
            _, old = _ENTRIES.popitem(last=False)
            _release(old)
    return val


def clear_caches() -> None:
    """Drop every memoized artifact, unpersisting DataFrames."""
    with _LOCK:
        while _ENTRIES:
            _, val = _ENTRIES.popitem()
            _release(val)


def cache_len() -> int:
    with _LOCK:
        return len(_ENTRIES)
