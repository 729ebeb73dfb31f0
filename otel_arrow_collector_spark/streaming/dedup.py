"""Streaming dedup sink — the persistent queue's at-least-once redelivery
(exporter/exporterhelper/internal/persistent_storage.go:278-345: requests
re-enqueued after crash, so downstream sees duplicates) made exactly-once
by an idempotent consumer: dropDuplicates within the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(df: DataFrame, keys: list[str],
                 watermark: str = "1 hour",
                 ts_col: str = "ts") -> DataFrame:
    """Drop redelivered records by id within the watermark horizon.

    State is bounded by the watermark (keys older than the horizon are
    evicted), which is what makes this viable on an unbounded stream.
    """
    out = df
    if df.isStreaming:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(keys)
    return out.dropDuplicates(keys)
