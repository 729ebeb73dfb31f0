"""Streaming interval-union coverage — the stateful twin of
``operators/relational.q112_interval_coverage`` (micro-batch = event
arrivals, merged-island list = keyed state).

Each (event_type, user_id) group's state is its CURRENT disjoint island
list ``[(st, en), ...]``; an arriving batch's leases merge in by the
same sweep the batch window runs (sort by start, extend-or-open), and
the group emits its refreshed aggregate (n_islands, covered_us) in
update mode — latest row per key wins, exactly the semantics of
re-running the batch query over everything seen so far.

Re-delivery is idempotent FOR FREE: interval union is an idempotent,
commutative, associative merge (a re-delivered lease lands inside an
existing island and changes nothing), so unlike the dedup twin no
per-event id set is needed — the state is the merged geometry only.
That is why the emitted aggregate carries NO n_events column: an exact
arrival count under at-least-once delivery would require unbounded
event-id state; coverage does not (the same reasoning the reference
applies when its deltatocumulative state keeps aggregated points, not
raw samples — processor/deltatocumulativeprocessor).

Scale shape: state is keyed by (type, user) — high cardinality, no
skew; each entry is the user's island list, bounded by MAX_ISLANDS
(memlimit semantics: a user whose activity never merges is a state
leak; refuse loudly, the incr_dedup/BandStateOverflow pattern).

Equivalence (pytest-pinned): after any batch split / shuffled arrival /
duplication of events, the final per-key emission equals the shared
batch sweep ``operators.relational.interval_islands`` aggregated per
key — stream and batch cannot diverge on merge semantics because the
pin recomputes the expected side with the batch code itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StringType,
                               StructField, StructType)

OUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("user_id", LongType()),
    StructField("n_islands", LongType()),
    StructField("covered_us", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("starts", ArrayType(LongType())),
    StructField("ends", ArrayType(LongType())),
])

#: per-key island bound: a key holding more disjoint islands than this
#: never merges anything — its state grows linearly with events, the
#: exact leak a bounded-state stream must refuse loudly rather than
#: carry (10k x 60s islands is ~7 days of non-stop disjoint activity).
MAX_ISLANDS = 10_000

LEASE_US = 60_000_000


class IslandStateOverflowError(RuntimeError):
    """A single (event_type, user_id) key exceeded :data:`MAX_ISLANDS`
    disjoint islands — unmergeable activity whose state would grow
    without bound (the interval twin of BandStateOverflowError)."""


def _merge(islands: list[tuple[int, int]],
           new: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Union-merge sorted-or-not interval lists into a disjoint sorted
    list — the Python form of the batch prefix-max sweep."""
    xs = sorted(islands + new)
    out: list[tuple[int, int]] = []
    for s, t in xs:
        if out and s <= out[-1][1]:
            if t > out[-1][1]:
                out[-1] = (out[-1][0], t)
        else:
            out.append((s, t))
    return out


def _emit_coverage(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState,
                   max_islands: int = MAX_ISLANDS
                   ) -> Iterator[pd.DataFrame]:
    islands = (list(zip(state.get[0], state.get[1]))
               if state.exists else [])
    new = []
    for pdf in pdfs:
        new.extend((int(s), int(s) + LEASE_US) for s in pdf["s"])
    if new:
        islands = _merge(islands, new)
        if len(islands) > max_islands:
            raise IslandStateOverflowError(
                f"key {key!r}: {len(islands)} disjoint islands "
                f"(cap {max_islands}) — state grows linearly with "
                "events for this key. Raise max_islands only with the "
                "checkpoint/memory budget to match, or coarsen the "
                "lease so activity merges.")
        state.update(([s for s, _ in islands],
                      [t for _, t in islands]))
    yield pd.DataFrame({
        "event_type": [key[0]], "user_id": [key[1]],
        "n_islands": [len(islands)],
        "covered_us": [sum(t - s for s, t in islands)]})


def interval_union_stream(events: DataFrame,
                          max_islands: int = MAX_ISLANDS) -> DataFrame:
    """Streaming coverage: ``events`` (event_type, user_id, s[us]) ->
    update-mode (event_type, user_id, n_islands, covered_us), the
    running union-of-leases geometry per key.  ``max_islands`` bounds
    per-key state (closure-carried so it reaches the executors)."""

    def emit(key, pdfs, state):
        return _emit_coverage(key, pdfs, state, max_islands)

    return (events.select("event_type", "user_id", "s")
            .groupBy("event_type", "user_id")
            .applyInPandasWithState(
                emit, OUT_SCHEMA, _STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
