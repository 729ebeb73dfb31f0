"""Stream-stream interval join — the streaming twin of declared query
Q18 (timestamp-correlation theta join, SURVEY.md §2.8): correlate two
event streams on an equi-key within a bounded time interval.

Structured Streaming requires watermarks on BOTH sides plus a time-range
join condition so it can bound the join state: each side buffers only
rows younger than (watermark + interval).  That state bound is exactly
what makes the operator viable on an unbounded 100 TB/day stream — the
batch Q18 plan would buffer everything.

Reference parity: the reference correlates telemetry by trace context in
stateless pass-through fashion; interval correlation (signup→purchase,
span→log, request→retry) is the analytical extension the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key: str = "user_id",
                         ts_col: str = "ts",
                         interval: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Join rows of ``right`` occurring in (left.ts, left.ts + interval]
    for the same ``key``.  Both inputs may be streaming DataFrames; each
    gets a watermark so the join state is bounded.

    Returns (key, l_ts, r_ts, l_event_id, r_event_id).
    """
    lw = (left.withWatermark(ts_col, watermark)
              .select(F.col(key).alias("l_key"),
                      F.col(ts_col).alias("l_ts"),
                      F.col("event_id").alias("l_event_id")))
    rw = (right.withWatermark(ts_col, watermark)
               .select(F.col(key).alias("r_key"),
                       F.col(ts_col).alias("r_ts"),
                       F.col("event_id").alias("r_event_id")))
    cond = ((F.col("l_key") == F.col("r_key"))
            & (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {interval}")))
    return (lw.join(rw, cond)
              .select(F.col("l_key").alias(key),
                      "l_ts", "r_ts", "l_event_id", "r_event_id"))


def enrich_stream(stream: DataFrame, dim: DataFrame, key: str,
                  how: str = "left") -> DataFrame:
    """Stream-static enrichment join — the streaming form of attaching
    resource/dimension attributes to records
    (docs/processing.md:210-214 ``set(attributes[...],
    resource.attributes[...])``; Q12's enrichment join).

    The static side is broadcast to every task of every micro-batch: no
    stream state at all, and the dimension may be refreshed between
    batches (Spark re-resolves the static plan per micro-batch).  Default
    LEFT join: an unknown key must not drop telemetry
    (missing-dimension tolerance, Q14).
    """
    return stream.join(F.broadcast(dim), key, how)
