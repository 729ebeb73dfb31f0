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


# ---------------------------------------------------------------------------
# spanmetrics: traces -> RED metrics (the traces->metrics connector shape;
# connector semantics as in plans/pipeline.py kind: spanmetrics)
# ---------------------------------------------------------------------------

#: spanmetrics-style default latency bounds, in milliseconds.
DEFAULT_LATENCY_BOUNDS_MS = [2.0, 4.0, 6.0, 8.0, 10.0, 50.0, 100.0, 200.0,
                             400.0, 800.0, 1000.0, 1400.0, 2000.0, 5000.0,
                             10000.0, 15000.0]


def span_red_metrics(spans: DataFrame,
                     bounds_ms: list[float] | None = None) -> DataFrame:
    """Aggregate spans into RED metrics as HISTOGRAM DATAPOINTS: one
    explicit-bounds duration histogram per (span name, status_code),
    shaped as METRIC_POINT_SCHEMA rows so the entire §2.7 machinery
    (merge_histograms, histogram_quantile_col, temporality streams)
    consumes the connector's output unchanged.

    Rate = count over the window, Errors = points with status.code = 2
    dimension, Duration = the bucket histogram — the classic
    traces->metrics connector roll-up.

    Scale: one hash aggregation keyed by (name, status) — low
    cardinality; bucket counts are conditional sums (map-side combinable);
    no window, no join.
    """
    from ..model.telemetry import METRIC_POINT_SCHEMA
    bounds = [float(b) for b in (bounds_ms or DEFAULT_LATENCY_BOUNDS_MS)]
    dur_ms = ((F.col("end_time_unix_nano")
               - F.col("start_time_unix_nano")) / 1e6)
    d = spans.select(F.col("name"), F.col("status_code"),
                     dur_ms.alias("dur_ms"),
                     "start_time_unix_nano", "end_time_unix_nano")
    lo = [0.0] + bounds
    hi = bounds + [None]
    bucket_cols = []
    # OTLP explicit-bounds buckets are upper-INCLUSIVE: (a, b]
    # (metrics.pb.go:1081-1091 "Histogram buckets are inclusive of their
    # upper boundary"); bucket 0 = dur <= bounds[0], last = dur > bounds[-1].
    for i, (a, b) in enumerate(zip(lo, hi)):
        cond = (F.col("dur_ms") <= F.lit(b)) if i == 0 else (
            (F.col("dur_ms") > F.lit(a)) if b is None else
            (F.col("dur_ms") > F.lit(a)) & (F.col("dur_ms") <= F.lit(b)))
        bucket_cols.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"b{i}"))
    agg = (d.groupBy("name", "status_code")
             .agg(F.count(F.lit(1)).cast("long").alias("count"),
                  F.sum("dur_ms").alias("sum"),
                  F.min("dur_ms").alias("min"),
                  F.max("dur_ms").alias("max"),
                  F.min("start_time_unix_nano").alias("start_time_unix_nano"),
                  F.max("end_time_unix_nano").alias("time_unix_nano"),
                  *bucket_cols))
    attrs = F.expr(
        "map('span.name', named_struct('s', name, 'i', CAST(NULL AS BIGINT),"
        " 'd', CAST(NULL AS DOUBLE), 'b', CAST(NULL AS BOOLEAN),"
        " 'json', CAST(NULL AS STRING)),"
        " 'status.code', named_struct('s', CAST(NULL AS STRING),"
        " 'i', CAST(status_code AS BIGINT), 'd', CAST(NULL AS DOUBLE),"
        " 'b', CAST(NULL AS BOOLEAN), 'json', CAST(NULL AS STRING)))")
    out = agg.select(
        F.lit("duration_ms").alias("metric_name"),
        F.lit("span duration histogram (spanmetrics)").alias("description"),
        F.lit("ms").alias("unit"),
        F.lit(3).alias("metric_type"),
        F.lit(1).alias("aggregation_temporality"),     # delta window
        F.lit(None).cast("boolean").alias("is_monotonic"),
        "start_time_unix_nano", "time_unix_nano",
        attrs.alias("attributes"),
        F.lit(None).cast("long").alias("value_int"),
        F.lit(None).cast("double").alias("value_double"),
        "count", "sum", "min", "max",
        F.array(*[F.col(f"b{i}") for i in range(len(bounds) + 1)])
         .alias("bucket_counts"),
        F.array(*[F.lit(b) for b in bounds]).cast("array<double>")
         .alias("explicit_bounds"),
        F.lit(None).cast("int").alias("scale"),
        F.lit(None).cast("long").alias("zero_count"),
        F.lit(None).cast("int").alias("positive_offset"),
        F.lit(None).cast("array<bigint>").alias("positive_bucket_counts"),
        F.lit(None).cast("int").alias("negative_offset"),
        F.lit(None).cast("array<bigint>").alias("negative_bucket_counts"),
        F.lit(None).cast(
            "array<struct<quantile:double,value:double>>")
         .alias("quantile_values"),
        F.expr("CAST(NULL AS ARRAY<STRUCT<filtered_attributes: "
               "MAP<STRING, STRUCT<s:STRING,i:BIGINT,d:DOUBLE,b:BOOLEAN,"
               "json:STRING>>, time_unix_nano: BIGINT, value_double: DOUBLE,"
               " value_int: BIGINT, span_id: STRING, trace_id: STRING>>)")
         .alias("exemplars"),
        F.lit(0).alias("flags"),
        F.expr("map()").cast(
            "map<string,struct<s:string,i:bigint,d:double,b:boolean,"
            "json:string>>").alias("resource_attributes"),
        F.lit("spanmetrics").alias("scope_name"),
        F.lit("").alias("scope_version"),
    )
    return out.to(METRIC_POINT_SCHEMA)
