"""Span-structure operators over the canonical trace fixtures
(internal/testdata/trace.go semantics: alternating operationA/B spans,
events on A-spans, links on B-spans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from otel_arrow_collector_spark.model import generate_traces
from otel_arrow_collector_spark.operators.spans import (explode_events,
                                                        explode_links,
                                                        parent_child_edges,
                                                        root_spans,
                                                        span_durations)


def test_explode_events_keeps_context(spark):
    td = generate_traces(spark, 6)
    ev = explode_events(td)
    assert ev.count() == td.select(F.sum(F.size(F.coalesce(
        "events", F.array())))).first()[0]
    r = ev.first()
    assert r.trace_id and r.event_name
    assert "event_attributes" in ev.columns


def test_explode_links(spark):
    td = generate_traces(spark, 6)
    lk = explode_links(td)
    n_links = td.select(F.sum(F.size(F.coalesce(
        "links", F.array())))).first()[0]
    assert lk.count() == n_links
    assert {"linked_trace_id", "linked_span_id",
            "link_attributes"} <= set(lk.columns)


def test_span_durations_nonnegative(spark):
    td = generate_traces(spark, 8)
    d = span_durations(td)
    assert d.filter(F.col("duration_ns") < 0).count() == 0
    assert d.select(F.max("duration_ns")).first()[0] > 0


def test_parent_child_and_roots_partition_spans(spark):
    td = generate_traces(spark, 8)
    edges = parent_child_edges(td)
    roots = root_spans(td)
    # every span is a root or a child reachable via an edge (fixture traces
    # are single-level), and no span is both
    n = td.count()
    assert roots.count() + edges.count() >= n or edges.count() == 0
    assert roots.count() <= n
