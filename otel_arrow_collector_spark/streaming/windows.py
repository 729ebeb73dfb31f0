"""Event-time windowing — the streaming twins of Q31/Q32.

The reference is arrival-time driven (its batch timer,
batch_processor.go:183-250, knows nothing of event time); our streaming
mode upgrades to event-time with explicit watermarks (§2.9), which is the
scale-correct semantics: late data is bounded, state is evictable, and the
same query text works on one node or a thousand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours",
                    ts_col: str = "ts") -> DataFrame:
    """Tumbling-window counters (Q31 streaming twin).

    Works on both batch and streaming DataFrames; on streams the watermark
    bounds state so the aggregation runs forever at fixed memory.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(F.col(ts_col), window).alias("w"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum("value"), 2).alias("s"))
              .select(F.col("w.start").alias("w_start"),
                      F.col("w.end").alias("w_end"), "n", "s"))


def sessionized(events: DataFrame, gap: str = "30 minutes",
                watermark: str = "2 hours",
                ts_col: str = "ts", key: str = "user_id") -> DataFrame:
    """Session windows with a fixed inactivity gap (Q32 streaming twin;
    stateful session merging is Spark-native via session_window)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"),
                       F.col(key))
              .agg(F.count(F.lit(1)).alias("n_events"))
              .select(key, F.col("sw.start").alias("s_start"),
                      F.col("sw.end").alias("s_end"), "n_events"))


def hopping_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes", watermark: str = "2 hours",
                   ts_col: str = "ts",
                   key: str = "event_type") -> DataFrame:
    """Hopping (sliding) windows — the q47 streaming twin.  ``F.window``
    with a slide replicates each event into size/slide overlapping
    windows, exactly the explicit explode plan q47 declares in batch;
    the watermark bounds the open-window state on streams."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"),
                       F.col(key))
              .agg(F.count(F.lit(1)).alias("n"))
              .select(key, F.col("w.start").alias("w_start"),
                      F.col("w.end").alias("w_end"), "n"))
