"""Streaming sessionization — the stateful twin of q80_sessionization.

The reference buffers per-entity activity and cuts on inactivity only
in batch jobs; Structured Streaming expresses the same semantics
NATIVELY with ``F.session_window`` (merging session windows with
watermark-driven finalization) — no ``applyInPandasWithState`` needed,
which is the Spark-first answer: the engine's session-window state
store handles out-of-order merges (two fragments of one session
arriving in different micro-batches coalesce in state) and emits each
session exactly once in append mode when the watermark passes its end.

Boundary (pinned by test): Spark merges two events into one session
when ``next - prev <= gap`` — the window extent is half-open
``[first, last + gap)`` but the MERGE test is closed — which is
exactly q80's batch predicate (a gap of exactly 30:00.000000 stays
in-session; strictly more than that cuts), so the native gap duration
is q80's 30 minutes verbatim.

Batch equivalence (pinned in tests/test_session_stream.py): once the
watermark passes every session's end, the multiset of
(user_id, n_events, dur_sec) sessions equals q80's per-session
aggregate over the same rows, regardless of arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: q80's inactivity gap (30 minutes, microseconds)
SESSION_GAP_US = 1_800_000_000


def sessionize_stream(events: DataFrame,
                      gap_us: int = SESSION_GAP_US,
                      watermark_us: int = SESSION_GAP_US) -> DataFrame:
    """One row per CLOSED session: (user_id, start_us, n_events,
    dur_sec).  ``events`` needs ``user_id`` and an epoch-microsecond
    ``us`` column; sessions finalize when the watermark (delayed by
    ``watermark_us``) passes ``last_event + gap``.
    """
    wm_ms = max(watermark_us // 1000, 1)
    keyed = (events
             .withColumn("ts", F.timestamp_micros(F.col("us")))
             .withWatermark("ts", f"{wm_ms} milliseconds"))
    # closed merge boundary == q80's strictly-greater cut (see module doc)
    sess = (keyed.groupBy(
                "user_id",
                F.session_window("ts", f"{gap_us} microseconds"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.min("us").cast("long").alias("start_us"),
                 F.max("us").cast("long").alias("end_us")))
    return sess.select(
        "user_id", "start_us", "n_events",
        F.expr("(end_us - start_us) div 1000000").cast("long")
         .alias("dur_sec"))
