"""Bounded cache registry: LRU eviction unpersists DataFrames (no
unbounded executor-storage growth across sf_dirs) and Collector.shutdown
clears everything."""

from __future__ import annotations

import shutil

from tests.conftest import SF_SMALL


def test_cache_registry_bounded_eviction(spark, tmp_path, monkeypatch):
    """Loop 3 dirs with MAX_ENTRIES=1: evicted entries are unpersisted
    and the persistent-RDD census does not grow past the bound."""
    from otel_arrow_collector_spark.operators import (cache_registry,
                                                      similarity)
    monkeypatch.setattr(cache_registry, "MAX_ENTRIES", 1)
    cache_registry.clear_caches()
    n0 = spark.sparkContext._jsc.getPersistentRDDs().size()
    dirs = []
    for i in range(3):
        d = tmp_path / f"sf{i}"
        d.mkdir()
        shutil.copy(f"{SF_SMALL}/embeddings.parquet",
                    d / "embeddings.parquet")
        dirs.append(str(d))
    dfs = [similarity.bucketed_embeddings(spark, d) for d in dirs]
    dfs[-1].count()
    assert cache_registry.cache_len() == 1
    # the two evicted DataFrames are unpersisted, the live one is not
    assert not dfs[0].storageLevel.useMemory
    assert not dfs[1].storageLevel.useMemory
    assert dfs[2].storageLevel.useMemory
    n1 = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert n1 <= n0 + 1, f"persistent RDDs grew {n0} -> {n1}"


def test_collector_shutdown_clears_caches(spark, tmp_path):
    """Collector.shutdown releases every memoized persisted DataFrame
    (the Shutdown half of the component lifecycle)."""
    from otel_arrow_collector_spark.operators import (cache_registry,
                                                      similarity)
    from otel_arrow_collector_spark.plans.collector import Collector
    df = similarity.bucketed_embeddings(spark, SF_SMALL)
    assert cache_registry.cache_len() >= 1
    c = Collector.__new__(Collector)     # lifecycle-only: no config needed
    c.plan = None
    c.shutdown()
    assert cache_registry.cache_len() == 0
    assert not df.storageLevel.useMemory
