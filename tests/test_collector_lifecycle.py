"""Collector run cycle: dry-run, start, hot-reload, failed-apply shutdown
(otelcol/collector.go:144-268)."""

from __future__ import annotations

import pytest

from otel_arrow_collector_spark.plans.collector import Collector, State
from otel_arrow_collector_spark.plans.confmap import ResolveError
from otel_arrow_collector_spark.plans.pipeline import ConfigError
from tests.conftest import SF_SMALL

_CFG_A = """yaml:
receivers: {ev: {kind: table, table: events}}
processors: {only_errors: {kind: filter, where: "event_type = 'error'"}}
exporters: {out: {kind: "null"}}
pipelines:
  p1: {receivers: [ev], processors: [only_errors], exporters: [out]}
"""

_CFG_B = """yaml:
receivers: {ev: {kind: table, table: events}}
exporters: {out: {kind: "null"}}
pipelines:
  p1: {receivers: [ev], exporters: [out]}
"""

_CFG_BAD = """yaml:
receivers: {ev: {kind: table, table: events}}
exporters: {out: {kind: "null"}}
pipelines:
  p1: {receivers: [missing_receiver], exporters: [out]}
"""


def test_dry_run_validates_without_running(spark):
    g = Collector.dry_run(spark, _CFG_A, sf_dir=SF_SMALL)
    assert "p1" in g.pipelines
    with pytest.raises(ConfigError):
        Collector.dry_run(spark, _CFG_BAD, sf_dir=SF_SMALL)


def test_start_and_reload_changes_behavior(spark):
    c = Collector(spark, _CFG_A, sf_dir=SF_SMALL)
    res_a = c.start()
    assert c.state is State.RUNNING
    n_filtered = res_a["p1/out"]

    res_b = c.reload(_CFG_B)   # drop the filter -> more rows
    assert c.state is State.RUNNING
    assert res_b["p1/out"] > n_filtered


def test_failed_reload_closes_collector(spark):
    c = Collector(spark, _CFG_A, sf_dir=SF_SMALL)
    c.start()
    with pytest.raises(ConfigError):
        c.reload(_CFG_BAD)
    assert c.state is State.CLOSED
    with pytest.raises(RuntimeError, match="closed"):
        c.start()


def test_reload_requires_running(spark):
    c = Collector(spark, _CFG_A, sf_dir=SF_SMALL)
    with pytest.raises(RuntimeError, match="cannot reload"):
        c.reload()


def test_env_reference_in_config(spark, monkeypatch):
    monkeypatch.setenv("EVENT_KIND", "purchase")
    cfg = """yaml:
receivers: {ev: {kind: table, table: events}}
processors: {f: {kind: filter, where: "event_type = '${EVENT_KIND}'"}}
exporters: {out: {kind: "null"}}
pipelines:
  p1: {receivers: [ev], processors: [f], exporters: [out]}
"""
    c = Collector(spark, cfg, sf_dir=SF_SMALL)
    assert c.start()["p1/out"] > 0


def test_missing_config_uri():
    with pytest.raises(ResolveError):
        Collector.dry_run(None, "file:/nonexistent/config.yaml")
