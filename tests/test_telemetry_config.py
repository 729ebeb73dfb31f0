"""service telemetry: config section (service/telemetry/config.go) —
confmap -> Collector mapping, logger configuration (level/encoding/
sampling), invalid-level rejection, and the always-record self-trace
sampler rule (otel_trace_sampler.go:20-28)."""

from __future__ import annotations

import json
import logging

import pytest

from otel_arrow_collector_spark.plans.collector import Collector
from otel_arrow_collector_spark.plans.pipeline import ConfigError
from otel_arrow_collector_spark.plans.telemetry import (
    LogsConfig, configure_logger, parse_telemetry, should_record)
from otel_arrow_collector_spark.plans.zpages import SpanRecorder
from tests.conftest import SF_SMALL

_BASE = """yaml:
receivers: {ev: {kind: table, table: events}}
exporters: {out: {kind: "null"}}
pipelines:
  p1: {receivers: [ev], exporters: [out]}
telemetry:
  logs: {level: warn, encoding: json, initial_fields: {service: engine}}
  metrics: {level: detailed}
  traces: {enabled: true, samples_per_bucket: 5}
"""

_BAD_LEVEL = _BASE.replace("level: warn", "level: loud")
_BAD_MLEVEL = _BASE.replace("level: detailed", "level: verbose")
_BAD_ENC = _BASE.replace("encoding: json", "encoding: xml")


def test_collector_maps_telemetry_section(spark):
    c = Collector(spark, _BASE, sf_dir=SF_SMALL)
    c.start()
    try:
        assert c.telemetry.logs.level == "warn"
        assert c.telemetry.logs.encoding == "json"
        assert c.telemetry.logs.initial_fields == {"service": "engine"}
        assert c.telemetry.metrics.level == "detailed"
        assert c.telemetry.traces.enabled is True
        assert isinstance(c.span_recorder, SpanRecorder)
        assert c.span_recorder.samples_per_bucket == 5
        assert c.logger.level == logging.WARNING
    finally:
        c.shutdown()


def test_invalid_levels_and_encoding_rejected(spark):
    for bad in (_BAD_LEVEL, _BAD_MLEVEL, _BAD_ENC):
        with pytest.raises(ConfigError, match="unrecognized"):
            Collector.dry_run(spark, bad, sf_dir=SF_SMALL)
    with pytest.raises(ConfigError, match="mapping"):
        parse_telemetry("nope")


def test_defaults_when_section_absent():
    t = parse_telemetry(None)
    assert t.logs.level == "info" and t.logs.encoding == "console"
    assert t.metrics.level == "basic"
    assert t.traces.enabled is True


def test_logger_json_encoding_and_sampling(tmp_path):
    out = tmp_path / "svc.log"
    cfg = LogsConfig(level="info", encoding="json",
                     output_paths=[str(out)],
                     initial_fields={"service": "engine"},
                     sampling_initial=2, sampling_thereafter=3)
    log = configure_logger(cfg, name="telemetry-test")
    log.debug("below level")              # filtered by level
    for _ in range(8):
        log.info("repeated message")
    for h in log.handlers:
        h.flush()
    lines = [json.loads(x) for x in out.read_text().splitlines()]
    # sampling: first 2 pass, then every 3rd (occurrences 5 and 8)
    assert len(lines) == 4
    assert all(x["msg"] == "repeated message" for x in lines)
    assert all(x["service"] == "engine" for x in lines)
    assert all(x["level"] == "info" for x in lines)
    # reconfigure is idempotent (hot-reload): handlers replaced
    log2 = configure_logger(cfg, name="telemetry-test")
    assert len(log2.handlers) == 1


def test_always_record_parent_based_sampler():
    # sampled parent -> sampled; no parent / unsampled -> record-only
    assert should_record(True) == (True, True)
    assert should_record(False) == (True, False)
    assert should_record(None) == (True, False)


def test_collector_self_spans_feed_tracez(spark):
    """Self-traces: compile + run operations land in the tracez
    recorder (the always-record rule), so /debug/tracez shows the
    collector's own operation latency profile."""
    c = Collector(spark, _BASE, sf_dir=SF_SMALL)
    c.start()
    try:
        counts, errors, samples, _ = c.span_recorder.snapshot()
        assert "collector/compile" in counts
        assert "collector/run" in counts
        assert errors == {}
        page = __import__(
            "otel_arrow_collector_spark.plans.zpages",
            fromlist=["ZPages"]).ZPages(
                tracez_recorder=c.span_recorder).tracez().decode()
        assert "collector/compile" in page and "collector/run" in page
    finally:
        c.shutdown()


def test_traces_disabled_records_nothing(spark):
    cfg = _BASE.replace("enabled: true", "enabled: false")
    c = Collector(spark, cfg, sf_dir=SF_SMALL)
    c.start()
    try:
        assert c.span_recorder is None
    finally:
        c.shutdown()


def test_metrics_level_none_collects_nothing(spark):
    from otel_arrow_collector_spark.exporters.obsreport import ObsReport
    o = ObsReport(level="none")
    o.record("otlp", "traces", "accepted", 5)
    assert o.snapshot() == {}
    with pytest.raises(ValueError):           # misuse still validates
        o.record("otlp", "traces", "nonsense")
    with pytest.raises(ValueError, match="unknown telemetry level"):
        ObsReport(level="loud")
    cfg = _BASE.replace("level: detailed", "level: none")
    c = Collector(spark, cfg, sf_dir=SF_SMALL)
    c.start()
    try:
        assert c.obsreport.level == "none"
        c.obsreport.record("otlp", "traces", "accepted", 3)
        assert c.obsreport.snapshot() == {}
    finally:
        c.shutdown()


def test_collector_zpages_assembly_with_resource(spark):
    cfg = _BASE.replace(
        "telemetry:",
        "telemetry:\n  resource: {service.name: engine-x, drop.me: null}")
    c = Collector(spark, cfg, sf_dir=SF_SMALL)
    c.start()
    try:
        zp = c.zpages()
        body = zp.servicez().decode()
        assert "service.name" in body and "engine-x" in body
        assert "drop.me" not in body           # null suppresses (config.go)
        assert "collector/run" in zp.tracez().decode()
        assert "p1" in zp.pipelinez().decode()
    finally:
        c.shutdown()
