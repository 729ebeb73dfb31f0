"""Streaming tail sampling — the stateful twin of q90_tail_sampling.

The reference's tail-sampling shape (docs/processing.md:222-225: a
``groupbytrace``-style buffer holds every span of a trace until a
decision-wait elapses, then ONE policy verdict is made for the whole
trace) expressed with ``applyInPandasWithState`` + event-time timeout:

- spans are keyed by trace id ((user_id, day) here, as in q90); state
  accumulates the per-trace aggregates the policies need (count,
  has_error, min/max timestamp) — O(1) per trace, never the spans
  themselves, which is what makes the operator feasible at ingest
  scale;
- each arrival re-arms an event-time timeout at
  ``max_event_us + decision_wait_us``; when the WATERMARK passes that
  point the trace is complete-enough and the verdict fires exactly
  once (error policy, then latency, then the deterministic 2/16 hash
  policy, then drop — q90's decision table);
- after the verdict the state flips to a decided marker kept for one
  more decision-wait (the reference's decision cache): spans arriving
  later neither re-open the trace nor duplicate the verdict, then the
  marker times out and is dropped, so state stays bounded by the
  number of in-flight traces.

Batch equivalence (pinned in tests/test_tail_sampling_stream.py): once
the watermark passes every trace's decision point, the multiset of
(policy, n_events) verdicts equals q90's batch aggregation over the
same rows, regardless of how arrival shuffles spans across
micro-batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("day", LongType()),
    StructField("policy", StringType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("has_error", LongType()),
    StructField("min_us", LongType()),
    StructField("max_us", LongType()),
    StructField("decided", StringType()),    # None until the verdict
])

#: q90's latency policy threshold (20 hours, in microseconds)
LATENCY_THRESHOLD_US = 72_000_000_000


def decide_policy(user_id: int, day: int, has_error: int,
                  span_us: int) -> str:
    """q90's decision table, one trace at a time (the md5 2/16
    probabilistic policy bit-matches the batch/oracle expression)."""
    if has_error:
        return "error"
    if span_us >= LATENCY_THRESHOLD_US:
        return "latency"
    h = hashlib.md5(f"ts:{user_id}:{day}".encode()).hexdigest()
    return "probabilistic" if h[0] in ("0", "1") else "drop"


def tail_sample_stream(events: DataFrame,
                       decision_wait_us: int = 60_000_000) -> DataFrame:
    """Per-trace sampling verdicts, one row per completed trace.

    ``events`` needs user_id, event_type and a ``us`` epoch-microsecond
    column; the stream must carry a watermark-able event-time, which
    this operator derives as ``timestamp_micros(us)`` with a
    ``decision_wait_us`` watermark delay.
    """
    wait_ms = decision_wait_us // 1000
    keyed = (events
             .withColumn("ts", F.timestamp_micros(F.col("us")))
             .withWatermark("ts", f"{max(wait_ms, 1)} milliseconds")
             .select("user_id", "event_type", "us", "ts",
                     F.expr("us div 86400000000").alias("day")))

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        user_id, day = int(key[0]), int(key[1])
        if state.hasTimedOut:
            n, he, mn, mx, decided = state.get
            if decided is not None:
                # decision-cache TTL elapsed -> drop the marker
                state.remove()
            else:
                policy = decide_policy(user_id, day, int(he),
                                       int(mx) - int(mn))
                # keep the decided marker for one more wait so late
                # spans cannot duplicate the verdict
                state.update((int(n), int(he), int(mn), int(mx), policy))
                state.setTimeoutTimestamp(
                    state.getCurrentWatermarkMs() + wait_ms)
                yield pd.DataFrame([{"user_id": user_id, "day": day,
                                     "policy": policy,
                                     "n_events": int(n)}])
            return
        if state.exists:
            n, he, mn, mx, decided = state.get
        else:
            n, he, mn, mx, decided = 0, 0, None, None, None
        max_seen = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            he = max(he, int((pdf["event_type"] == "error").any()))
            lo, hi = int(pdf["us"].min()), int(pdf["us"].max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
            max_seen = hi if max_seen is None else max(max_seen, hi)
        if decided is not None:
            # late span after the verdict: follow the cached decision,
            # do not re-open (groupbytrace decision cache)
            state.update((int(n), int(he), int(mn), int(mx), decided))
            return
        state.update((int(n), int(he), int(mn), int(mx), None))
        if max_seen is not None:
            # clamp: a straggler span may arrive after the watermark
            # already passed its trace's decision point — fire at the
            # next opportunity instead of (illegally) in the past
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(max_seen // 1000 + wait_ms, wm + 1))
        yield from ()

    return keyed.groupBy("user_id", "day").applyInPandasWithState(
        update, OUT_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.EventTimeTimeout)
