"""Config resolver (confmap/resolver.go:117-158): scheme providers,
deep merge, recursive ${} expansion, cycle guard."""

from __future__ import annotations

import pytest

from otel_arrow_collector_spark.plans.confmap import ResolveError, resolve


def test_file_provider_and_bare_path(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("receivers: {mem: {}}\npipelines: {t: {receivers: [mem]}}")
    assert resolve(str(p)) == resolve(f"file:{p}")
    assert "receivers" in resolve(str(p))


def test_merge_later_overrides_deep(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text("proc: {batch: {size: 100, timeout: 5}}\nkeep: 1")
    b.write_text("proc: {batch: {size: 999}}")
    out = resolve(str(a), str(b))
    assert out["proc"]["batch"] == {"size": 999, "timeout": 5}   # deep merge
    assert out["keep"] == 1


def test_env_expansion_default_scheme(monkeypatch):
    monkeypatch.setenv("BATCH_SIZE", "4096")
    out = resolve("yaml:size: ${BATCH_SIZE}")
    assert out["size"] == 4096   # whole-string ref keeps native YAML type


def test_env_expansion_inside_string(monkeypatch):
    monkeypatch.setenv("HOST", "collector.local")
    out = resolve("yaml:endpoint: http://${env:HOST}:4317")
    assert out["endpoint"] == "http://collector.local:4317"


def test_recursive_expansion(monkeypatch, tmp_path):
    inner = tmp_path / "inner.yaml"
    inner.write_text("deep: ${env:LEAF}")
    monkeypatch.setenv("LEAF", "42")
    out = resolve(f"yaml:nested: ${{file:{inner}}}")
    assert out["nested"] == {"deep": 42}


def test_unknown_scheme_and_missing_env():
    with pytest.raises(ResolveError, match="no provider"):
        resolve("yaml:x: ${s3:bucket/key}")
    with pytest.raises(ResolveError, match="is not set"):
        resolve("yaml:x: ${env:DEFINITELY_NOT_SET_12345}")


def test_cycle_guard(monkeypatch):
    monkeypatch.setenv("A", "${env:B}")
    monkeypatch.setenv("B", "${env:A}")
    with pytest.raises(ResolveError, match="depth"):
        resolve("yaml:x: ${env:A}")


def test_resolved_config_compiles_to_pipeline(monkeypatch, tmp_path):
    """End-to-end §3.1: URI -> resolved conf -> PipelineGraph (DryRun)."""
    from otel_arrow_collector_spark.plans.pipeline import PipelineGraph
    monkeypatch.setenv("TABLE", "events")
    cfg = tmp_path / "pipeline.yaml"
    cfg.write_text("""
receivers:
  table_reader: {table: "${TABLE}"}
exporters:
  capture: {kind: memory}
pipelines:
  metrics_flow:
    receivers: [table_reader]
    exporters: [capture]
""")
    graph = PipelineGraph(resolve(str(cfg)))
    assert graph.receivers["table_reader"]["table"] == "events"
    assert "metrics_flow" in graph.pipelines
