"""Metric-semantics operators: temporality conversion round-trip,
histogram merge, sum roll-up, split-first-N (SURVEY.md §2.7 / §4 custom
work item e)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from otel_arrow_collector_spark.model import generate_metrics, generate_traces
from otel_arrow_collector_spark.model.telemetry import (METRIC_POINT_SCHEMA,
                                                        attr)
from otel_arrow_collector_spark.operators.metrics import (
    BoundsMismatchError, cumulative_to_delta, delta_to_cumulative,
    merge_histograms, sum_rollup)
from otel_arrow_collector_spark.streaming import size_capped_chunks
from otel_arrow_collector_spark.streaming.batching import split_first_n


def _series(spark, values, temporality, name="sum-int", t0=1000):
    """One int-sum series with the given per-point values."""
    rows = []
    for k, v in enumerate(values):
        rows.append(dict(
            metric_name=name, description="", unit="1", metric_type=2,
            aggregation_temporality=temporality, is_monotonic=True,
            start_time_unix_nano=t0, time_unix_nano=t0 + (k + 1) * 10,
            attributes={"host": attr("a")}, value_int=v, value_double=None,
            count=None, sum=None, min=None, max=None, bucket_counts=None,
            explicit_bounds=None, scale=None, zero_count=None,
            positive_offset=None, positive_bucket_counts=None,
            negative_offset=None, negative_bucket_counts=None,
            quantile_values=None, exemplars=None, flags=0,
            resource_attributes={}, scope_name="", scope_version=""))
    return spark.createDataFrame(rows, METRIC_POINT_SCHEMA)


def test_delta_to_cumulative(spark):
    out = delta_to_cumulative(_series(spark, [5, 3, 2, 10], temporality=1))
    got = [r.value_int for r in out.orderBy("time_unix_nano").collect()]
    assert got == [5, 8, 10, 20]
    assert out.first().aggregation_temporality == 2


def test_cumulative_to_delta_with_reset(spark):
    # cumulative drops 12 -> 4: source restart; post-reset value as-is
    out = cumulative_to_delta(_series(spark, [5, 12, 4, 9], temporality=2))
    got = [r.value_int for r in out.orderBy("time_unix_nano").collect()]
    assert got == [5, 7, 4, 5]
    assert out.first().aggregation_temporality == 1


def test_temporality_roundtrip(spark):
    src = _series(spark, [5, 3, 2, 10], temporality=1)
    back = cumulative_to_delta(delta_to_cumulative(src))
    got = [r.value_int for r in back.orderBy("time_unix_nano").collect()]
    assert got == [5, 3, 2, 10]


def test_series_isolation(spark):
    """Conversion never crosses series boundaries (different attrs)."""
    a = _series(spark, [1, 1], temporality=1)
    b = _series(spark, [100, 100], temporality=1).withColumn(
        "attributes", F.expr("map('host', named_struct("
        "'s','b','i',CAST(NULL AS BIGINT),'d',CAST(NULL AS DOUBLE),"
        "'b',CAST(NULL AS BOOLEAN),'json',CAST(NULL AS STRING)))"))
    out = delta_to_cumulative(a.unionByName(b))
    per_series = sorted(r.value_int for r in
                        out.filter("time_unix_nano = 1020").collect())
    assert per_series == [2, 200]


def test_histogram_merge(spark):
    md = generate_metrics(spark, 7)   # contains the golden histogram dps
    hist = md.filter("metric_type = 3 AND bucket_counts IS NOT NULL")
    doubled = hist.unionByName(hist)
    merged = merge_histograms(doubled)
    r = merged.first()
    assert r["count"] == 2 and r["sum"] == 30.0
    assert list(r.bucket_counts) == [0, 2]       # bucket-wise addition
    assert list(r.explicit_bounds) == [1.0]
    assert r["min"] == 15.0 and r["max"] == 15.0


def test_histogram_merge_rejects_mixed_bounds(spark):
    md = generate_metrics(spark, 7)
    hist = md.filter("metric_type = 3 AND bucket_counts IS NOT NULL")
    other = (hist.withColumn("explicit_bounds",
                             F.expr("array(2.0D)")))
    with pytest.raises(BoundsMismatchError, match="re-bucket"):
        merge_histograms(hist.unionByName(other))


def test_sum_rollup_cumulative_takes_last(spark):
    cum = _series(spark, [5, 12, 20], temporality=2)
    out = sum_rollup(cum)
    assert out.first().total == 20


def test_sum_rollup_delta_adds(spark):
    d = _series(spark, [5, 12, 20], temporality=1)
    assert sum_rollup(d).first().total == 37


def test_split_first_n_preserves_envelopes(spark):
    """splitTraces first-N: head has exactly N, tail the rest, and every
    row keeps its resource envelope (splittraces.go:11-66)."""
    td = generate_traces(spark, 10)
    head, tail = split_first_n(td, 3, ["start_time_unix_nano", "name"])
    assert head.count() == 3 and tail.count() == 7
    assert all(r.resource_attributes["resource-attr"].s ==
               "resource-attr-val-1" for r in head.collect())
    # no loss, no duplication
    assert head.unionByName(tail).count() == 10


def test_split_matches_batch_chunks(spark):
    td = generate_traces(spark, 10)
    chunks = size_capped_chunks(td, 4)
    assert sum(c.count() for c in chunks) == 10
    assert max(c.count() for c in chunks) <= 4


def test_explode_exemplars_keeps_context(spark):
    """Exemplars explode with datapoint context and hex trace/span ids
    (Exemplar semantics, generated_exemplar.go:96-101)."""
    from otel_arrow_collector_spark.operators.metrics import explode_exemplars
    md = generate_metrics(spark, 7)
    ex = explode_exemplars(md)
    n_ex = md.select(F.sum(F.size(F.coalesce("exemplars",
                                             F.array())))).first()[0]
    assert ex.count() == n_ex and n_ex > 0
    r = ex.first()
    assert r.metric_name and r.point_time_unix_nano is not None
    assert {"span_id", "trace_id", "filtered_attributes"} <= set(ex.columns)


def _exp_point(name="exp", t=1010, scale=0, zero=0, pos=None, neg=None,
               count=0, s=None, mn=None, mx=None):
    pos_off, pos_counts = pos if pos else (None, None)
    neg_off, neg_counts = neg if neg else (None, None)
    return dict(
        metric_name=name, description="", unit="1", metric_type=4,
        aggregation_temporality=1, is_monotonic=None,
        start_time_unix_nano=1000, time_unix_nano=t,
        attributes={"host": attr("a")}, value_int=None, value_double=None,
        count=count, sum=s, min=mn, max=mx, bucket_counts=None,
        explicit_bounds=None, scale=scale, zero_count=zero,
        positive_offset=pos_off, positive_bucket_counts=pos_counts,
        negative_offset=neg_off, negative_bucket_counts=neg_counts,
        quantile_values=None, exemplars=None, flags=0,
        resource_attributes={}, scope_name="", scope_version="")


def _exp_df(spark, points):
    return spark.createDataFrame(points, METRIC_POINT_SCHEMA)


def test_exp_histogram_merge_equal_scales(spark):
    """Equal scales: offset-aligned bucket addition, no downscaling
    (generated_exponentialhistogramdatapoint.go:105-125)."""
    from otel_arrow_collector_spark.operators.metrics import \
        merge_exp_histograms
    df = _exp_df(spark, [
        _exp_point(t=1010, scale=2, zero=1, pos=(0, [1, 2]), count=4, s=1.5),
        _exp_point(t=1020, scale=2, zero=2, pos=(2, [3]), count=6, s=2.5)])
    r = merge_exp_histograms(df).first()
    assert r.scale == 2
    assert r.zero_count == 3 and r["count"] == 10 and r["sum"] == 4.0
    assert r.positive_offset == 0
    assert list(r.positive_bucket_counts) == [1, 2, 3]
    assert r.time_unix_nano == 1020 and r.start_time_unix_nano == 1000


def test_exp_histogram_merge_downscales_to_coarser(spark):
    """Unequal scales: the finer point is downscaled (index >> shift) to
    the coarser scale before merging."""
    from otel_arrow_collector_spark.operators.metrics import \
        merge_exp_histograms
    df = _exp_df(spark, [
        # scale 2, indexes 2,3,4 -> at scale 1: 1,1,2 -> off 1, [2,1]
        _exp_point(t=1010, scale=2, pos=(2, [1, 1, 1]), count=3),
        # already at scale 1, index 0
        _exp_point(t=1020, scale=1, pos=(0, [5]), count=5)])
    r = merge_exp_histograms(df).first()
    assert r.scale == 1
    assert r.positive_offset == 0
    assert list(r.positive_bucket_counts) == [5, 2, 1]
    assert r["count"] == 8


def test_exp_histogram_merge_negative_indexes_floor(spark):
    """Arithmetic shift floors negative indexes: -3,-2,-1 >> 1 -> -2,-1,-1
    (negative-range buckets downscale the same way)."""
    from otel_arrow_collector_spark.operators.metrics import \
        merge_exp_histograms
    df = _exp_df(spark, [
        _exp_point(t=1010, scale=1, neg=(-3, [1, 1, 1]), count=3),
        _exp_point(t=1020, scale=0, zero=7, count=7)])
    r = merge_exp_histograms(df).first()
    assert r.scale == 0
    assert r.negative_offset == -2
    assert list(r.negative_bucket_counts) == [1, 2]
    assert r.zero_count == 7
    assert list(r.positive_bucket_counts) == []


def test_exp_histogram_merge_zero_only_accumulates(spark):
    from otel_arrow_collector_spark.operators.metrics import \
        merge_exp_histograms
    df = _exp_df(spark, [
        _exp_point(t=1010, scale=3, zero=5, count=5),
        _exp_point(t=1020, scale=3, zero=7, count=7, mn=0.0, mx=0.0)])
    r = merge_exp_histograms(df).first()
    assert r.zero_count == 12 and r["count"] == 12 and r.scale == 3
    assert list(r.positive_bucket_counts) == []
    assert r["min"] == 0.0 and r["max"] == 0.0


def test_exp_histogram_merge_null_attribute_map(spark):
    """NULL attribute maps form ONE series and survive the merge: the
    series-key fingerprints are join keys (target-scale equi-join), and a
    raw to_json(NULL) fingerprint would never match itself — the sentinel
    coalesce in _with_series_key keeps NULL-keyed series intact."""
    from otel_arrow_collector_spark.operators.metrics import \
        merge_exp_histograms
    pts = [_exp_point(t=1010, scale=2, zero=1, pos=(0, [1, 2]), count=4),
           _exp_point(t=1020, scale=2, zero=2, pos=(2, [3]), count=6)]
    for p in pts:
        p["attributes"] = None
        p["resource_attributes"] = None
    rows = merge_exp_histograms(_exp_df(spark, pts)).collect()
    assert len(rows) == 1                       # not dropped, one series
    r = rows[0]
    assert r["count"] == 10 and r.zero_count == 3
    assert list(r.positive_bucket_counts) == [1, 2, 3]


def test_histogram_merge_null_attribute_map(spark):
    """Same NULL-series guarantee on the explicit-bounds path: the bucket
    sub-aggregation joins back on the fingerprints, so NULL-attribute
    datapoints must keep their bucket sums (not NULL them out)."""
    base = dict(
        metric_name="h", description="", unit="1", metric_type=3,
        aggregation_temporality=1, is_monotonic=None,
        start_time_unix_nano=1000, attributes=None, value_int=None,
        value_double=None, min=None, max=None, scale=None, zero_count=None,
        positive_offset=None, positive_bucket_counts=None,
        negative_offset=None, negative_bucket_counts=None,
        quantile_values=None, exemplars=None, flags=0,
        resource_attributes=None, scope_name="", scope_version="")
    rows = [dict(base, time_unix_nano=1010, count=3, sum=6.0,
                 bucket_counts=[1, 2], explicit_bounds=[1.0]),
            dict(base, time_unix_nano=1020, count=5, sum=9.0,
                 bucket_counts=[4, 1], explicit_bounds=[1.0])]
    df = spark.createDataFrame(rows, METRIC_POINT_SCHEMA)
    out = merge_histograms(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["count"] == 8 and r["sum"] == 15.0
    assert list(r.bucket_counts) == [5, 3]      # joined back, not NULLed
