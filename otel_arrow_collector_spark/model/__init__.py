"""Telemetry data model: flattened span / metric-datapoint / log-record row
schemas (SURVEY.md §1.3/§1.5) + canonical fixture generators mirroring the
reference's golden test inputs (/root/reference/internal/testdata/)."""

from .telemetry import (ATTR_TYPE, LOG_SCHEMA, METRIC_POINT_SCHEMA,
                        SPAN_SCHEMA, VALUE_TYPE, attr, generate_logs,
                        generate_metrics, generate_traces, log_record_count,
                        metric_point_count, span_count)

__all__ = ["ATTR_TYPE", "LOG_SCHEMA", "METRIC_POINT_SCHEMA", "SPAN_SCHEMA",
           "VALUE_TYPE", "attr", "generate_logs", "generate_metrics",
           "generate_traces", "log_record_count", "metric_point_count",
           "span_count"]
