"""Heavy-hitter detection: Misra-Gries summaries + exact recount.

The standard two-phase distributed heavy-hitter plan a telemetry or
corpus pipeline runs when the key space is too large to count exactly
(hot endpoints, hot tenants, dominant n-grams):

1. **Sketch phase** — per shard, a Misra-Gries summary with bounded
   capacity ``c`` (Misra & Gries 1982; the deterministic counter-based
   frequent-items sketch).  MG guarantees every key with true count
   > n/(c+1) survives in the summary, and each stored counter is a lower
   bound within n/(c+1) of the true count.  State is c counters per
   shard — independent of the key cardinality, the property that matters
   at 100 TB.
2. **Recount phase** — the (tiny) candidate set is broadcast back over
   the data for exact counts, and the phi-threshold filter runs on those
   exact counts.  Because phase 1 provably retains every true heavy
   hitter (phi > 1/(c+1)), the final answer is EXACT and deterministic
   even though the intermediate summary is arrival-order dependent —
   which is what makes the operator oracle-checkable against a plain
   GROUP BY in DuckDB.

A streaming twin (`streaming/heavy_hitters.py`) keeps the same MG state
across micro-batches via ``applyInPandasWithState``.

Reference analogue: the reference keeps per-key counters for its
telemetry matrix (obsreport) but has no bounded-state sketch; this is an
engine-added scale operator (driver north star).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

#: Misra-Gries summary capacity per shard.
MG_CAPACITY = 64
#: Number of hash shards for the sketch phase.
MG_SHARDS = 8

SUMMARY_SCHEMA = StructType([
    StructField("shard", LongType()),
    StructField("key", StringType()),
    StructField("lower_bound", LongType()),
])


def mg_update(counters: dict, keys, capacity: int) -> dict:
    """Misra-Gries update loop over an iterable of keys (shared by the
    batch and streaming operators)."""
    for k in keys:
        if k in counters:
            counters[k] += 1
        elif len(counters) < capacity:
            counters[k] = 1
        else:                       # decrement-all step
            drop = [c for c, v in counters.items() if v == 1]
            for c in counters:
                counters[c] -= 1
            for c in drop:
                del counters[c]
    return counters


def misra_gries_partial(df: DataFrame, key_col: str,
                        capacity: int = MG_CAPACITY,
                        shards: int = MG_SHARDS) -> DataFrame:
    """Phase 1: per-shard MG summaries.  Keys hash-partition into shards
    (all occurrences of a key land in ONE shard), so a key with global
    count > n/(capacity+1) certainly survives its shard's summary."""
    keyed = df.select(F.col(key_col).cast("string").alias("key")) \
              .withColumn("shard", F.pmod(F.xxhash64("key"), shards))

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Arrow batching may split one shard across several pandas
        # chunks, yielding SEVERAL capacity-bounded summaries per shard.
        # The candidate-superset guarantee survives: a key with global
        # density > 1/(capacity+1) has, by pigeonhole, at least one
        # chunk where its local density exceeds 1/(capacity+1), and MG
        # retains it there — so the union of chunk summaries still
        # contains every true heavy hitter (mergeable-summaries
        # argument; the recount phase then restores exactness).
        for pdf in pdfs:
            for shard, grp in pdf.groupby("shard"):
                counters = mg_update({}, grp["key"], capacity)
                yield pd.DataFrame({
                    "shard": int(shard),
                    "key": list(counters.keys()),
                    "lower_bound": list(counters.values())})

    # one pandas group per shard: repartition so each shard is contiguous
    return (keyed.repartition(shards, "shard")
                 .mapInPandas(run, SUMMARY_SCHEMA))


def heavy_hitters(df: DataFrame, key_col: str, phi_denom: int,
                  capacity: int = MG_CAPACITY) -> DataFrame:
    """Exact heavy hitters via sketch + recount: keys whose count exceeds
    n/phi_denom.  Requires phi_denom <= capacity (else a true heavy
    hitter could be evicted).  Returns (key, cnt) with exact counts."""
    if phi_denom > capacity:
        raise ValueError(
            f"phi_denom {phi_denom} needs capacity >= it, got {capacity}")
    cands = (misra_gries_partial(df, key_col, capacity)
             .select("key").distinct())
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    exact = (keyed.join(F.broadcast(cands), "key", "left_semi")
                  .groupBy("key")
                  .agg(F.count(F.lit(1)).alias("cnt")))
    n = keyed.count()
    return (exact.filter(F.col("cnt") > n / phi_denom)
                 .orderBy(F.col("cnt").desc(), "key"))


def heavy_hitter_events(spark, sf_dir):
    """Declared query: event types busier than n/8 of the stream — the
    hot-signal detector.  The MG candidate phase is provably a superset
    of the true answer, the recount is exact, so a plain GROUP BY +
    HAVING is a complete oracle."""
    events = load_table(spark, sf_dir, "events")
    return heavy_hitters(events, "event_type", phi_denom=8)


QUERIES["heavy_hitter_events"] = heavy_hitter_events
ORACLES["heavy_hitter_events"] = """
WITH n AS (SELECT COUNT(*) AS n FROM events)
SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events, n
GROUP BY event_type, n.n
HAVING COUNT(*) > n.n / 8.0
ORDER BY cnt DESC, key
"""
