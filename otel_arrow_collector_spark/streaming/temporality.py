"""Streaming Delta -> Cumulative temporality conversion — the stateful
twin of operators/metrics.py's batch converter (SURVEY.md §4 custom item
(e); AggregationTemporality semantics,
pdata/pmetric/aggregation_temporality.go:14-21).

Per-series running totals persist across micro-batches via
``applyInPandasWithState``: series key = (metric_name, series_fp) where
``series_fp`` is the canonical attribute+resource fingerprint (the same
key the reference uses to identify a stream of datapoints, §2.7
dimensioned counters).

Arrival-order stance: within a micro-batch points are accumulated in
event-time order; across micro-batches accumulation follows arrival order
— exactly the reference's arrival-time-driven processing (SURVEY.md §2.9).
Final per-series totals are order-independent (addition commutes).

Scale: state is 3 scalars per live series; the shuffle is keyed by series
fingerprint (high cardinality = good partitioning).  Idle-series state is
never dropped here — production deployments add an event-time timeout to
expire dead series; the reference has no such expiry either (stream state
lives for the stream's lifetime, arrow/stream.go:34-69).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, IntegerType, LongType, StringType,
                               StructField, StructType)

#: Input/output projection: the narrow series-point surface; callers
#: project METRIC_POINT_SCHEMA down with `with_series_fp`.
POINT_SCHEMA = StructType([
    StructField("metric_name", StringType()),
    StructField("series_fp", StringType()),
    StructField("time_unix_nano", LongType()),
    StructField("start_time_unix_nano", LongType()),
    StructField("value_int", LongType()),
    StructField("value_double", DoubleType()),
    StructField("aggregation_temporality", IntegerType()),
])

_STATE_SCHEMA = StructType([
    StructField("cum_int", LongType()),
    StructField("cum_double", DoubleType()),
    StructField("start_ts", LongType()),
])


def with_series_fp(points: DataFrame) -> DataFrame:
    """METRIC_POINT_SCHEMA rows -> the narrow streaming projection with the
    canonical series fingerprint (same formula as the batch operator)."""
    fp = F.expr("to_json(array_sort(map_entries(attributes))) || '|' || "
                "to_json(array_sort(map_entries(resource_attributes)))")
    return points.select(
        "metric_name", fp.alias("series_fp"), "time_unix_nano",
        "start_time_unix_nano", "value_int", "value_double",
        "aggregation_temporality")


def _convert(key: tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:       # not configured; defensive
        state.remove()
        return
    cum_i, cum_d, start = state.get if state.exists else (0, 0.0, None)
    rows = pd.concat(list(pdfs), ignore_index=True)
    if not len(rows):
        return
    rows = rows.sort_values("time_unix_nano", kind="mergesort")
    out = []
    for r in rows.itertuples(index=False):
        if start is None:
            start = int(r.start_time_unix_nano) \
                if pd.notna(r.start_time_unix_nano) else None
        vi = vd = None
        if pd.notna(r.value_int):
            cum_i += int(r.value_int)
            vi = cum_i
        elif pd.notna(r.value_double):
            cum_d += float(r.value_double)
            vd = cum_d
        out.append(dict(metric_name=key[0], series_fp=key[1],
                        time_unix_nano=int(r.time_unix_nano),
                        start_time_unix_nano=start,
                        value_int=vi, value_double=vd,
                        aggregation_temporality=2))
    state.update((cum_i, cum_d, start))
    yield pd.DataFrame(out)


def delta_to_cumulative_stream(points: DataFrame) -> DataFrame:
    """Streaming POINT_SCHEMA deltas -> cumulative points; running state
    survives micro-batch boundaries (the property the batch window
    operator cannot provide)."""
    return (points.groupBy("metric_name", "series_fp")
                  .applyInPandasWithState(
                      _convert, POINT_SCHEMA, _STATE_SCHEMA,
                      "append", GroupStateTimeout.NoTimeout))
