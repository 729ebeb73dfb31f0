"""Span-structure operators — the pdata record-access surface over the
nested arrays of SPAN_SCHEMA: events[] and links[]
(pdata/ptrace/generated_spanevent.go, generated_spanlink.go), span
duration (start/end Timestamp ns, pdata/pcommon/timestamp.go:15), and
parent->child linkage (generated_span.go:73-78 ParentSpanID).

All pure DataFrame ops; explodes carry the span's identity columns so
every produced row keeps its provenance (the flattened-row discipline of
SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: identity columns every exploded row keeps
_CTX = ["trace_id", "span_id", "name", "resource_attributes",
        "scope_name", "scope_version"]


def explode_events(spans: DataFrame) -> DataFrame:
    """One row per span event, with span context (SpanEvent:
    time_unix_nano, name, attributes + dropped count)."""
    return (spans.select(*_CTX, F.posexplode("events").alias("event_idx", "e"))
                 .select(*_CTX, "event_idx",
                         F.col("e.time_unix_nano").alias("event_time_unix_nano"),
                         F.col("e.name").alias("event_name"),
                         F.col("e.attributes").alias("event_attributes"),
                         F.col("e.dropped_attributes_count")
                          .alias("event_dropped_attributes_count")))


def explode_links(spans: DataFrame) -> DataFrame:
    """One row per span link (SpanLink: linked trace/span ids, state,
    attributes)."""
    return (spans.select(*_CTX, F.posexplode("links").alias("link_idx", "l"))
                 .select(*_CTX, "link_idx",
                         F.col("l.trace_id").alias("linked_trace_id"),
                         F.col("l.span_id").alias("linked_span_id"),
                         F.col("l.trace_state").alias("linked_trace_state"),
                         F.col("l.attributes").alias("link_attributes")))


def span_durations(spans: DataFrame) -> DataFrame:
    """Duration in nanoseconds per span (end - start; ns longs are the
    source of truth, SURVEY.md §1.5 timestamp mapping)."""
    return spans.withColumn(
        "duration_ns",
        F.col("end_time_unix_nano") - F.col("start_time_unix_nano"))


def parent_child_edges(spans: DataFrame) -> DataFrame:
    """(parent, child) span pairs within each trace — the span-tree edge
    set (ParentSpanID linkage).  Equi-join on (trace_id, span_id): at
    scale this shuffles both sides on the same key once."""
    parents = spans.select(F.col("trace_id"),
                           F.col("span_id").alias("parent_id"),
                           F.col("name").alias("parent_name"))
    children = (spans.filter(F.col("parent_span_id").isNotNull()
                             & (F.col("parent_span_id") != ""))
                     .select("trace_id",
                             F.col("parent_span_id").alias("parent_id"),
                             F.col("span_id").alias("child_id"),
                             F.col("name").alias("child_name")))
    return children.join(parents, ["trace_id", "parent_id"])


def root_spans(spans: DataFrame) -> DataFrame:
    """Spans with no parent — trace entry points."""
    return spans.filter(F.col("parent_span_id").isNull()
                        | (F.col("parent_span_id") == ""))
