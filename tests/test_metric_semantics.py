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
