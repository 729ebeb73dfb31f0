"""Streaming CDC apply — the stateful twin of q95_cdc_apply.

A keyed change feed (upserts + tombstone deletes) maintained as a live
materialized view with ``applyInPandasWithState``: per key the state
holds only the WINNING version under last-writer-wins order
(commit time, then event id) — O(1) per key regardless of how many
versions flow through — plus the version counter.  Every micro-batch
that changes a key's winning row (or its version count) re-emits the
key's CURRENT view row in update mode; a key whose winner is a
tombstone emits ``deleted=true`` (the retraction a downstream sink
needs to drop the key).

Out-of-order tolerant by construction: LWW compares (us, event_id), so
an older version arriving AFTER a newer one cannot win — the state
update is commutative over arrival order, which is what makes the view
eventually equal to the batch q95 result under ANY shuffling of the
feed across micro-batches (pinned in tests/test_cdc_stream.py,
including restart-from-checkpoint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                               StringType, StructField, StructType)

OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_versions", LongType()),
    StructField("last_type", StringType()),
    StructField("last_value", DoubleType()),
    StructField("deleted", BooleanType()),
])

_STATE_SCHEMA = StructType([
    StructField("n_versions", LongType()),
    StructField("best_us", LongType()),
    StructField("best_eid", LongType()),
    StructField("best_type", StringType()),
    StructField("best_value", DoubleType()),
])


def cdc_apply_stream(changes: DataFrame) -> DataFrame:
    """Live LWW view over a change feed.  ``changes`` needs user_id,
    event_type, value, an epoch-microsecond ``us`` and event_id."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.exists:
            n, bus, beid, btype, bval = state.get
        else:
            n, bus, beid, btype, bval = 0, None, None, None, None
        changed = False
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                n += 1
                changed = True
                cand = (int(r.us), int(r.event_id))
                if bus is None or cand > (bus, beid):
                    bus, beid = cand
                    btype, bval = str(r.event_type), float(r.value)
        if not changed:
            return
        state.update((int(n), int(bus), int(beid), btype, float(bval)))
        yield pd.DataFrame([{
            "user_id": user_id, "n_versions": int(n),
            "last_type": btype, "last_value": float(bval),
            "deleted": btype == "error"}])

    return (changes.groupBy("user_id")
            .applyInPandasWithState(update, OUT_SCHEMA, _STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def latest_view(rows) -> dict:
    """Collapse an update-mode emission log to the final view: the last
    emission per key wins; tombstoned keys drop (the sink-side apply)."""
    final: dict = {}
    for r in rows:
        final[r.user_id] = r
    return {u: r for u, r in final.items() if not r.deleted}
