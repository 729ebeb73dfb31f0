"""Streaming Misra-Gries heavy-hitter sketch — the stateful twin of
``operators/sketches.py``.

Per-shard MG counters persist across micro-batches via
``applyInPandasWithState``: the same bounded ``capacity`` counters per
shard regardless of how many batches or distinct keys flow through —
the property that lets a hot-key monitor run forever on an unbounded
stream.  Each batch emits the shard's current summary (update-mode
snapshot); the MG guarantee (every key with true count > n/(capacity+1)
is present, counters are lower bounds) holds over the FULL prefix of
the stream because the update loop is exactly the batch operator's
``mg_update`` applied to the concatenation of all batches.

Reference analogue: arrival-order stateful processing over an unbounded
stream (SURVEY §2.9); the reference keeps unbounded per-key obsreport
counters — this is the bounded-state version a 100 TB deployment needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

from ..operators.sketches import MG_CAPACITY, MG_SHARDS, mg_update

SUMMARY_SCHEMA = StructType([
    StructField("shard", LongType()),
    StructField("key", StringType()),
    StructField("lower_bound", LongType()),
    StructField("n_seen", LongType()),      # rows this shard has absorbed
])

_STATE_SCHEMA = StructType([
    StructField("keys", ArrayType(StringType())),
    StructField("counts", ArrayType(LongType())),
    StructField("n_seen", LongType()),
])


def misra_gries_stream(events: DataFrame, key_col: str,
                       capacity: int = MG_CAPACITY,
                       shards: int = MG_SHARDS) -> DataFrame:
    """Streaming MG summaries: one bounded counter set per shard,
    carried across micro-batches; emits the post-batch summary rows."""
    keyed = events.select(F.col(key_col).cast("string").alias("key")) \
                  .withColumn("shard", F.pmod(F.xxhash64("key"), shards))

    def update(shard_key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, n_seen = state.get
            counters = dict(zip(keys, counts))
        else:
            counters, n_seen = {}, 0
        for pdf in pdfs:
            mg_update(counters, pdf["key"], capacity)
            n_seen += len(pdf)
        state.update((list(counters.keys()), list(counters.values()),
                      n_seen))
        yield pd.DataFrame({
            "shard": int(shard_key[0]),
            "key": list(counters.keys()),
            "lower_bound": list(counters.values()),
            "n_seen": n_seen})

    return keyed.groupBy("shard").applyInPandasWithState(
        update, SUMMARY_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
