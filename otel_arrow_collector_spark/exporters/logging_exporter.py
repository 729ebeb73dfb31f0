"""Logging exporter — pretty-prints telemetry batches at configurable
verbosity, mirroring the reference's text surface
(exporter/loggingexporter/logging_exporter.go:20-90; formatter
internal/otlptext/databuffer.go:21-280).

Spark-first: the formatter is a DataFrame -> DataFrame[line string]
transform built entirely from JVM-side string expressions (format_string /
concat_ws / transform over the attribute map), so "formatting" is itself a
distributed columnar op — the console sink only collects the final lines
it prints (bounded by ``max_rows``, the show()-style guard).

Verbosity levels (logging_exporter.go config):
- ``basic``     one summary line per batch (signal + record count)
- ``normal``    one line per record: headline fields only
- ``detailed``  multi-line per record: every field + expanded attributes
  (databuffer.go's ``Attributes:`` / per-field dump)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VERBOSITIES = ("basic", "normal", "detailed")

#: value-struct -> display text (databuffer.go valueToString: one-of tag)
_VAL = ("CASE WHEN {v}.s IS NOT NULL THEN concat('Str(', {v}.s, ')') "
        "WHEN {v}.i IS NOT NULL THEN concat('Int(', CAST({v}.i AS STRING), ')') "
        "WHEN {v}.d IS NOT NULL THEN concat('Double(', CAST({v}.d AS STRING), ')') "
        "WHEN {v}.b IS NOT NULL THEN concat('Bool(', CAST({v}.b AS STRING), ')') "
        "WHEN {v}.json IS NOT NULL THEN concat('Json(', {v}.json, ')') "
        "ELSE 'Empty()' END")


def _attrs_block(col: str, indent: str = "     -> ") -> str:
    """attributes map -> sorted '     -> key: Str(value)' lines."""
    entry = _VAL.format(v="e.value")
    return (f"concat_ws('\\n', transform(array_sort(map_entries({col})), "
            f"e -> concat('{indent}', e.key, ': ', {entry})))")


def format_traces(df: DataFrame, verbosity: str = "normal") -> DataFrame:
    """Span rows -> text lines (one row per line-block)."""
    if verbosity not in VERBOSITIES:
        raise ValueError(f"verbosity must be one of {VERBOSITIES}")
    if verbosity == "basic":
        return df.agg(F.format_string(
            "TracesExporter\t{\"#spans\": %d}", F.count(F.lit(1))).alias("line"))
    if verbosity == "normal":
        line = F.format_string(
            "%s %s name=%s kind=%d status=%d",
            "trace_id", "span_id", "name", "kind", "status_code")
        return df.select(line.alias("line"))
    block = F.concat_ws(
        "\n",
        F.format_string("Span #%s", F.col("span_id")),
        F.lit("Resource attributes:"),
        F.expr(_attrs_block("resource_attributes")),
        F.format_string("    Trace ID       : %s", F.col("trace_id")),
        F.format_string("    Parent ID      : %s",
                        F.coalesce("parent_span_id", F.lit(""))),
        F.format_string("    Name           : %s", F.col("name")),
        F.format_string("    Kind           : %d", F.col("kind")),
        F.format_string("    Start time     : %d", F.col("start_time_unix_nano")),
        F.format_string("    End time       : %d", F.col("end_time_unix_nano")),
        F.format_string("    Status code    : %d", F.col("status_code")),
        F.format_string("    Status message : %s",
                        F.coalesce("status_message", F.lit(""))),
        F.lit("Attributes:"),
        F.expr(_attrs_block("attributes")),
    )
    return df.select(block.alias("line"))


def format_logs(df: DataFrame, verbosity: str = "normal") -> DataFrame:
    """Log-record rows -> text lines."""
    if verbosity not in VERBOSITIES:
        raise ValueError(f"verbosity must be one of {VERBOSITIES}")
    if verbosity == "basic":
        return df.agg(F.format_string(
            "LogsExporter\t{\"#logs\": %d}", F.count(F.lit(1))).alias("line"))
    body = F.expr(_VAL.format(v="body"))
    if verbosity == "normal":
        return df.select(F.format_string(
            "%d %s %s", "time_unix_nano",
            F.coalesce("severity_text", F.lit("")), body).alias("line"))
    block = F.concat_ws(
        "\n",
        F.lit("LogRecord"),
        F.lit("Resource attributes:"),
        F.expr(_attrs_block("resource_attributes")),
        F.format_string("    Timestamp      : %d", F.col("time_unix_nano")),
        F.format_string("    Observed       : %d",
                        F.col("observed_time_unix_nano")),
        F.format_string("    Severity       : %s (%d)",
                        F.coalesce("severity_text", F.lit("")),
                        F.col("severity_number")),
        F.concat(F.lit("    Body           : "), body),
        F.format_string("    Trace ID       : %s",
                        F.coalesce("trace_id", F.lit(""))),
        F.format_string("    Span ID        : %s",
                        F.coalesce("span_id", F.lit(""))),
        F.lit("Attributes:"),
        F.expr(_attrs_block("attributes")),
    )
    return df.select(block.alias("line"))


def console_sink(df: DataFrame, signal: str = "traces",
                 verbosity: str = "normal", max_rows: int = 100) -> str:
    """Format + print (bounded); returns the printed text — the logging
    exporter's pushTraces -> stdout behavior."""
    fmt = {"traces": format_traces, "logs": format_logs}[signal]
    lines = [r.line for r in fmt(df, verbosity).limit(max_rows).collect()]
    text = "\n".join(lines)
    print(text)
    return text
