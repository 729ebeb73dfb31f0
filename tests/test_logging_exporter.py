"""Logging exporter text formatter (loggingexporter/logging_exporter.go,
internal/otlptext/databuffer.go): verbosity levels over the canonical
fixture batches."""

from __future__ import annotations

import pytest

from otel_arrow_collector_spark.exporters.logging_exporter import (
    console_sink, format_logs, format_traces)
from otel_arrow_collector_spark.model import generate_logs, generate_traces


def test_basic_is_one_summary_line(spark):
    td = generate_traces(spark, 6)
    out = format_traces(td, "basic").collect()
    assert len(out) == 1 and '"#spans": 6' in out[0].line


def test_normal_one_line_per_span(spark):
    td = generate_traces(spark, 4)
    lines = [r.line for r in format_traces(td, "normal").collect()]
    assert len(lines) == 4
    assert all("name=operation" in ln for ln in lines)


def test_detailed_dumps_fields_and_attributes(spark):
    td = generate_traces(spark, 2)
    blocks = [r.line for r in format_traces(td, "detailed").collect()]
    assert len(blocks) == 2
    b = blocks[0]
    for needle in ("Trace ID", "Status code", "Attributes:", "-> "):
        assert needle in b
    # attribute values use the reference's typed Str()/Int() rendering
    assert "Str(" in b or "Int(" in b


def test_logs_detailed_renders_any_typed_body(spark):
    ld = generate_logs(spark, 3)
    blocks = [r.line for r in format_logs(ld, "detailed").collect()]
    assert len(blocks) == 3
    assert all("Body" in b and "Severity" in b for b in blocks)


def test_console_sink_bounded(spark, capsys):
    td = generate_traces(spark, 8)
    text = console_sink(td, "traces", "normal", max_rows=3)
    assert len(text.splitlines()) == 3
    assert capsys.readouterr().out.strip() == text


def test_bad_verbosity_rejected(spark):
    with pytest.raises(ValueError, match="verbosity"):
        format_traces(generate_traces(spark, 1), "chatty")
