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
#: Overridable for long sweeps (the full bench touches ~45 distinct keys
#: per sf_dir — relations AND model scalars — and a session iterating
#: two dirs doubles that; evicting mid-sweep forces rebuilds of
#: still-hot stores, r15's zero-jobs pin caught exactly that at 48).
MAX_ENTRIES = int(os.environ.get("SPARK_GRAFT_CACHE_ENTRIES", "128"))

#: same knob as the CC loop (operators/dedup.py): a checkpoint dir makes
#: every plan-truncating materialization a RELIABLE .checkpoint().
CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def plan_checkpoint(df):
    """Materialize ``df`` with TRUNCATED lineage (constant-size plan).

    Why not persist()+count(): a cache marker keeps the full logical
    plan underneath it, and Catalyst re-analyzes/re-optimizes that whole
    tree on EVERY downstream action before the InMemoryRelation
    substitution applies.  Measured on the two-epoch dedup chain
    (guide-§1 probe, r15): the memoized relation's plan printed 110k
    lines and each dependent collect() paid ~4.2 s of single-threaded
    driver planning vs 0.1 s against a truncated copy.  Checkpointing
    rewrites the plan to a scan of the materialized partitions, so
    dependents pay plan cost proportional to THEIR OWN operators only.

    Reliable ``.checkpoint(eager=True)`` when $SPARK_GRAFT_CHECKPOINT_DIR
    is set (or the context already has a checkpoint dir) — the 100 TB
    executor-loss stance shared with the CC loop; else
    ``localCheckpoint(eager=True)`` (single-box default, block-manager
    storage)."""
    sc = df.sparkSession.sparkContext
    want = os.environ.get(CHECKPOINT_DIR_ENV)
    if want and sc.getCheckpointDir() is None:
        sc.setCheckpointDir(want)
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _ckpt_jrdd(df):
    """The JVM RDD behind a checkpointed DataFrame's ``LogicalRDD`` (the
    RDD whose blocks ``localCheckpoint`` pinned), or None when the plan
    is not a LogicalRDD / the session is gone."""
    try:
        return df._jdf.queryExecution().logical().rdd()
    except Exception:
        return None


def materialized(df):
    """``plan_checkpoint`` for memoized relations, re-persisted on top.

    The checkpoint truncates the plan; the persist()+count() ON TOP of
    the truncated scan restores accurate size statistics (a bare
    LogicalRDD reports defaultSizeInBytes = huge, which silently
    downgraded every join against a memoized relation — cross joins to
    CartesianProduct, equi-joins to sort-merge — caught by the plan
    pins).  Net plan: InMemoryTableScan -> InMemoryRelation -> Scan
    ExistingRDD, constant-sized, with real cache stats.

    Storage discipline: once the columnar cache on top is built, the
    checkpoint RDD's own blocks are released — otherwise every memo
    holds the data TWICE (localCheckpoint row blocks + InMemoryRelation
    buffers) and eviction leaked the checkpoint copy forever
    (test_cache_registry_bounded_eviction counts the persistent-RDD
    census).  The MEMORY_AND_DISK cache copy spills rather than drops,
    so the truncated lineage is never recomputed short of process death
    (local mode) — and under $SPARK_GRAFT_CHECKPOINT_DIR a recompute
    reads the reliable checkpoint files anyway.  The input's own cache
    marker (if any) is released too."""
    ck = plan_checkpoint(df).persist()
    ck.count()
    jrdd = _ckpt_jrdd(ck)
    if jrdd is not None:
        try:
            jrdd.unpersist(False)
        except Exception:
            pass
    try:
        df.unpersist(False)
    except Exception:
        pass
    return ck

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
        jrdd = _ckpt_jrdd(val)        # defensive: a checkpoint whose
        if jrdd is not None:          # blocks were not already freed
            try:
                jrdd.unpersist(False)
            except Exception:
                pass


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
