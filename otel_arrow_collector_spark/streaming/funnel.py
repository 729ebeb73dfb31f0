"""Streaming conversion-funnel state — the stateful twin of q71.

Per-user first-timestamp-per-stage state persists across micro-batches
via ``applyInPandasWithState``; each batch emits the user's updated
stage timestamps (update-mode snapshot).  Because the per-stage
aggregate is MIN (order-independent), the final streaming state equals
the batch ``groupBy(user).agg(min when stage)`` exactly, for ANY
arrival order — the equivalence the tests pin.

The funnel predicate itself (signup < first view < first purchase) is a
stateless projection over the emitted state, shared with the batch
query's definition.

Scale: state is one timestamp per stage per live user; the shuffle keys
on user_id (high cardinality).  Idle users can be expired with an
event-time timeout in production; kept forever here, mirroring the
reference's stream-lifetime state (arrow/stream.go:34-69).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: Funnel stages in order (event_type values).
STAGES = ("signup", "view", "purchase")

STATE_SCHEMA = StructType(
    [StructField(f"t_{s}", LongType()) for s in STAGES])

OUT_SCHEMA = StructType(
    [StructField("user_id", LongType())]
    + [StructField(f"t_{s}", LongType()) for s in STAGES])


def funnel_stream(events: DataFrame) -> DataFrame:
    """events(user_id, event_type, ts_ns) -> per-user min timestamp per
    stage, maintained across micro-batches."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        mins = list(state.get) if state.exists else [None] * len(STAGES)
        for pdf in pdfs:
            for stage_i, stage in enumerate(STAGES):
                hits = pdf.loc[pdf["event_type"] == stage, "ts_ns"]
                if len(hits):
                    m = int(hits.min())
                    if mins[stage_i] is None or m < mins[stage_i]:
                        mins[stage_i] = m
        state.update(tuple(mins))
        yield pd.DataFrame([{"user_id": key[0],
                             **{f"t_{s}": mins[i]
                                for i, s in enumerate(STAGES)}}])

    keyed = events.select(
        "user_id", "event_type", F.col("ts").cast("long").alias("ts_ns"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        update, OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)


def funnel_flags(firsts: DataFrame) -> DataFrame:
    """Stage-completion flags over first-timestamp rows (shared by the
    batch and streaming paths): ordered-sequence semantics."""
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_view"))
    return firsts.select(
        "user_id", s1.alias("did_signup"), s2.alias("did_view_after"),
        s3.alias("did_full_funnel"))
