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
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

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


# ---------------------------------------------------------------------------
# streaming counter rate (the stream twin of q40 / PromQL rate())
# ---------------------------------------------------------------------------

RATE_SCHEMA = StructType([
    StructField("metric_name", StringType()),
    StructField("series_fp", StringType()),
    StructField("time_unix_nano", LongType()),
    StructField("rate_per_s", DoubleType()),
])

_RATE_STATE = StructType([
    StructField("last_ts", LongType()),
    StructField("last_v", DoubleType()),
])


def _rate(key: tuple, pdfs: Iterator[pd.DataFrame],
          state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:       # not configured; defensive
        state.remove()
        return
    last_ts, last_v = state.get if state.exists else (None, None)
    rows = pd.concat(list(pdfs), ignore_index=True)
    if not len(rows):
        return
    rows = rows.sort_values("time_unix_nano", kind="mergesort")
    out = []
    for r in rows.itertuples(index=False):
        if pd.notna(r.value_double):
            v = float(r.value_double)
        elif pd.notna(r.value_int):
            v = float(r.value_int)
        else:
            continue
        ts = int(r.time_unix_nano)
        rate = None
        if last_ts is not None and ts > last_ts:
            # PromQL-style monotonic reset: a drop means the counter
            # restarted, so the delta since reset is the value itself
            dv = v if v < last_v else v - last_v
            rate = dv / ((ts - last_ts) / 1e9)
        out.append(dict(metric_name=key[0], series_fp=key[1],
                        time_unix_nano=ts, rate_per_s=rate))
        # late/duplicate points (ts <= last_ts) yield NULL above and must
        # NOT regress the stored previous point — otherwise the next
        # in-order point computes its rate over the wrong interval and a
        # stale lower value reads as a counter reset
        if last_ts is None or ts > last_ts:
            last_ts, last_v = ts, v
    state.update((last_ts, last_v))
    yield pd.DataFrame(out)


def counter_rate_stream(points: DataFrame) -> DataFrame:
    """Streaming per-series counter rate (PromQL ``rate()`` shape; the
    stream twin of declared query q40): one row per input point with the
    per-second rate against the PREVIOUS point of that series, where
    "previous" survives micro-batch boundaries via one-(ts,value)-per-key
    state.  First point of a series and zero/negative time gaps yield
    NULL; a value drop is treated as a counter reset (monotonic-sum
    consumption semantics, pdata/pmetric/aggregation_temporality.go:14-21).

    Scale: state is 2 scalars per live series, shuffle keyed by series
    fingerprint — identical partitioning profile to
    ``delta_to_cumulative_stream``."""
    return (points.groupBy("metric_name", "series_fp")
                  .applyInPandasWithState(
                      _rate, RATE_SCHEMA, _RATE_STATE,
                      "append", GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# streaming histogram merge (the stream twin of q41/q42's merge operator)
# ---------------------------------------------------------------------------

HIST_POINT_SCHEMA = StructType([
    StructField("metric_name", StringType()),
    StructField("series_fp", StringType()),
    StructField("time_unix_nano", LongType()),
    StructField("count", LongType()),
    StructField("sum", DoubleType()),
    StructField("explicit_bounds", ArrayType(DoubleType())),
    StructField("bucket_counts", ArrayType(LongType())),
])

HIST_MERGED_SCHEMA = StructType([
    StructField("metric_name", StringType()),
    StructField("series_fp", StringType()),
    StructField("time_unix_nano", LongType()),
    StructField("count", LongType()),
    StructField("sum", DoubleType()),
    StructField("explicit_bounds", ArrayType(DoubleType())),
    StructField("bucket_counts", ArrayType(LongType())),
])

#: Arrays ride in the state row as csv text — scalar state cells keep the
#: state schema trivially Arrow-compatible across Spark versions.
_HIST_STATE = StructType([
    StructField("count", LongType()),
    StructField("sum", DoubleType()),
    StructField("t_max", LongType()),
    StructField("bounds_csv", StringType()),
    StructField("buckets_csv", StringType()),
])


def _merge_hist(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:       # not configured; defensive
        state.remove()
        return
    if state.exists:
        count, total, t_max, bounds_csv, buckets_csv = state.get
        bounds = [float(x) for x in bounds_csv.split(",")] \
            if bounds_csv else []
        buckets = [int(x) for x in buckets_csv.split(",")] \
            if buckets_csv else []
    else:
        count, total, t_max, bounds, buckets = 0, 0.0, None, None, None
    rows = pd.concat(list(pdfs), ignore_index=True)
    if not len(rows):
        return
    for r in rows.itertuples(index=False):
        b = [float(x) for x in r.explicit_bounds]
        c = [int(x) for x in r.bucket_counts]
        if bounds is None:
            bounds, buckets = b, [0] * len(c)
        elif b != bounds:
            # bounds-checked merge, same contract as the batch operator
            # (operators/metrics.py BoundsMismatchError)
            raise ValueError(
                f"series {key} mixes explicit_bounds {b} vs {bounds}; "
                f"re-bucket before merging")
        if len(c) != len(buckets):
            # same bounds but malformed count array: zip() would silently
            # truncate and drop counts — fail loudly like the bounds check
            raise ValueError(
                f"series {key} bucket_counts length {len(c)} != "
                f"{len(buckets)} (expected len(bounds)+1)")
        buckets = [a + x for a, x in zip(buckets, c)]
        count += int(r.count)
        total += float(r.sum) if pd.notna(r.sum) else 0.0
        ts = int(r.time_unix_nano)
        t_max = ts if t_max is None or ts > t_max else t_max
    state.update((count, total, t_max,
                  ",".join(str(x) for x in bounds),
                  ",".join(str(x) for x in buckets)))
    yield pd.DataFrame([dict(metric_name=key[0], series_fp=key[1],
                             time_unix_nano=t_max, count=count, sum=total,
                             explicit_bounds=bounds,
                             bucket_counts=buckets)])


def histogram_merge_stream(points: DataFrame) -> DataFrame:
    """Streaming explicit-bounds histogram merge (the stream twin of the
    batch ``merge_histograms`` operator behind q41/q42): per-series
    cumulative bucket-wise addition across micro-batches, emitting one
    merged snapshot row per series per micro-batch.  The LAST emitted
    snapshot equals the batch operator's output on the same points —
    batch-equivalence is the test contract.

    Mixing differing bounds within a series raises (the batch
    BoundsMismatchError contract).  State per series is 3 scalars + 2
    short csv arrays; shuffle keyed by series fingerprint."""
    return (points.groupBy("metric_name", "series_fp")
                  .applyInPandasWithState(
                      _merge_hist, HIST_MERGED_SCHEMA, _HIST_STATE,
                      "append", GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# streaming exponential-histogram merge (the stream twin of q36's operator:
# cross-batch scale renegotiation, generated_exponentialhistogramdatapoint
# .go:105-125)
# ---------------------------------------------------------------------------

EXPHIST_POINT_SCHEMA = StructType([
    StructField("metric_name", StringType()),
    StructField("series_fp", StringType()),
    StructField("time_unix_nano", LongType()),
    StructField("scale", IntegerType()),
    StructField("zero_count", LongType()),
    StructField("count", LongType()),
    StructField("sum", DoubleType()),
    StructField("positive_offset", IntegerType()),
    StructField("positive_bucket_counts", ArrayType(LongType())),
    StructField("negative_offset", IntegerType()),
    StructField("negative_bucket_counts", ArrayType(LongType())),
])

EXPHIST_MERGED_SCHEMA = EXPHIST_POINT_SCHEMA

_EXPHIST_STATE = StructType([
    StructField("scale", IntegerType()),
    StructField("zero_count", LongType()),
    StructField("count", LongType()),
    StructField("sum", DoubleType()),
    StructField("t_max", LongType()),
    StructField("pos_offset", IntegerType()),
    StructField("pos_csv", StringType()),
    StructField("neg_offset", IntegerType()),
    StructField("neg_csv", StringType()),
])


def _downscale_py(off: int, counts: list[int],
                  shift: int) -> tuple[int, list[int]]:
    """Base-2 downscale by ``shift`` levels: index i -> i >> shift
    (arithmetic shift, matching the batch operator's _downscale_sql)."""
    if not counts or shift == 0:
        return off, list(counts)
    lo = off >> shift
    hi = (off + len(counts) - 1) >> shift
    out = [0] * (hi - lo + 1)
    for k, c in enumerate(counts):
        out[((off + k) >> shift) - lo] += c
    return lo, out


def _csv(buckets: list[int]) -> str:
    return ",".join(str(x) for x in buckets)


def _uncsv(csv: str) -> list[int]:
    return [int(x) for x in csv.split(",")] if csv else []


def _add_aligned(a_off: int, a: list[int], b_off: int,
                 b: list[int]) -> tuple[int, list[int]]:
    """Offset-aligned bucket addition (both sides already at one scale)."""
    if not a:
        return b_off, list(b)
    if not b:
        return a_off, list(a)
    lo = min(a_off, b_off)
    hi = max(a_off + len(a), b_off + len(b))
    out = [0] * (hi - lo)
    for i, c in enumerate(a):
        out[a_off + i - lo] += c
    for i, c in enumerate(b):
        out[b_off + i - lo] += c
    return lo, out


def _merge_exphist(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:       # not configured; defensive
        state.remove()
        return
    if state.exists:
        (scale, zero, count, total, t_max,
         p_off_s, p_csv, n_off_s, n_csv) = state.get
        pos = (p_off_s, _uncsv(p_csv))
        neg = (n_off_s, _uncsv(n_csv))
    else:
        scale = t_max = None
        zero, count, total = 0, 0, 0.0
        pos, neg = (0, []), (0, [])
    rows = pd.concat(list(pdfs), ignore_index=True)
    if not len(rows):
        return
    for r in rows.itertuples(index=False):
        p_scale = int(r.scale)
        in_pos = (int(r.positive_offset)
                  if pd.notna(r.positive_offset) else 0,
                  [int(x) for x in (r.positive_bucket_counts
                                    if r.positive_bucket_counts is not None
                                    else [])])
        in_neg = (int(r.negative_offset)
                  if pd.notna(r.negative_offset) else 0,
                  [int(x) for x in (r.negative_bucket_counts
                                    if r.negative_bucket_counts is not None
                                    else [])])
        if scale is None:
            scale, pos, neg = p_scale, in_pos, in_neg
        else:
            # renegotiate BOTH sides to the COARSEST scale seen so far
            tgt = min(scale, p_scale)
            if tgt < scale:
                pos = _downscale_py(*pos, scale - tgt)
                neg = _downscale_py(*neg, scale - tgt)
                scale = tgt
            in_pos = _downscale_py(*in_pos, p_scale - tgt)
            in_neg = _downscale_py(*in_neg, p_scale - tgt)
            pos = _add_aligned(*pos, *in_pos)
            neg = _add_aligned(*neg, *in_neg)
        zero += int(r.zero_count)
        count += int(r.count)
        total += float(r.sum) if pd.notna(r.sum) else 0.0
        ts = int(r.time_unix_nano)
        t_max = ts if t_max is None or ts > t_max else t_max
    state.update((scale, zero, count, total, t_max,
                  pos[0], _csv(pos[1]), neg[0], _csv(neg[1])))
    yield pd.DataFrame([dict(metric_name=key[0], series_fp=key[1],
                             time_unix_nano=t_max, scale=scale,
                             zero_count=zero, count=count, sum=total,
                             positive_offset=pos[0],
                             positive_bucket_counts=pos[1],
                             negative_offset=neg[0],
                             negative_bucket_counts=neg[1])])


def exp_histogram_merge_stream(points: DataFrame) -> DataFrame:
    """Streaming exponential-histogram merge with cross-batch base-2 scale
    renegotiation (the stream twin of merge_exp_histograms): when a finer
    point arrives the incoming buckets downscale; when a COARSER point
    arrives the accumulated state itself downscales — the property a
    batch window can express but per-batch merging cannot.  One merged
    snapshot row per series per micro-batch; the final snapshot equals the
    batch operator's output (the test contract)."""
    return (points.groupBy("metric_name", "series_fp")
                  .applyInPandasWithState(
                      _merge_exphist, EXPHIST_MERGED_SCHEMA, _EXPHIST_STATE,
                      "append", GroupStateTimeout.NoTimeout))
