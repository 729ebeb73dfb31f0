"""Streaming rate limiter — the stateful twin of q91_rate_limit.

Per-(user, window) admission counters persist across micro-batches via
``applyInPandasWithState``: each arriving event is ALLOWED while its
(user, window) counter is below the quota and THROTTLED after, no
matter how the stream slices into batches — the decision for any event
depends only on the count of earlier events in its window, so the
streaming verdict sequence equals the batch ROW_NUMBER verdict under
the same arrival order (pinned by the batch-equivalence test).  State
is one integer per active (user, window); expired windows are dropped
whenever a newer window appears for the key, so state stays bounded by
the number of concurrently-active windows per user (1, once the
watermark passes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StructField, StructType)

OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("window", LongType()),
    StructField("event_id", LongType()),
    StructField("allowed", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("windows", ArrayType(LongType())),
    StructField("counts", ArrayType(LongType())),
])


def rate_limit_stream(events: DataFrame, quota: int,
                      window_us: int = 86_400_000_000) -> DataFrame:
    """Per-event admission verdicts under a K-per-(user, window) quota,
    state carried across micro-batches.  ``events`` needs user_id,
    event_id, and a ``us`` epoch-microseconds column; events must be
    fed in arrival order within a batch (the source's job, as for any
    limiter)."""
    keyed = events.select("user_id", "event_id", "us",
                          F.expr(f"us div {int(window_us)}")
                          .alias("window"))

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            wins, counts = state.get
            seen = dict(zip(wins, counts))
        else:
            seen = {}
        rows = []
        for pdf in pdfs:
            for _, r in pdf.sort_values(["us", "event_id"]).iterrows():
                w = int(r["window"])
                c = seen.get(w, 0)
                rows.append({"user_id": int(key[0]), "window": w,
                             "event_id": int(r["event_id"]),
                             "allowed": int(c < quota)})
                seen[w] = c + 1
        # retire windows older than the newest (bounded state)
        if seen:
            newest = max(seen)
            seen = {w: c for w, c in seen.items() if w >= newest - 1}
        state.update((list(seen.keys()), list(seen.values())))
        yield pd.DataFrame(rows)

    return keyed.groupBy("user_id").applyInPandasWithState(
        update, OUT_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
