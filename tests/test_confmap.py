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


# --- http/https providers (httpprovider/provider.go) ----------------------

@pytest.fixture()
def http_yaml_server():
    """Local HTTP server: /good.yaml -> config doc, anything else -> 404."""
    import http.server
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/good.yaml":
                body = b"receivers:\n  r: {kind: table, table: events}\nanswer: 42\n"
                self.send_response(200)
                self.send_header("Content-Type", "text/yaml")
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/bad.yaml":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"\x00\xff not: [valid")
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_provider_fetches_yaml(http_yaml_server):
    cfg = resolve(f"{http_yaml_server}/good.yaml")
    assert cfg["answer"] == 42
    assert cfg["receivers"]["r"]["table"] == "events"


def test_http_provider_merges_with_file(tmp_path, http_yaml_server):
    local = tmp_path / "override.yaml"
    local.write_text("answer: 7\n")
    cfg = resolve(f"{http_yaml_server}/good.yaml", str(local))
    assert cfg["answer"] == 7                      # later URI wins
    assert "receivers" in cfg                      # deep merge kept the rest


def test_http_provider_non_2xx_raises(http_yaml_server):
    with pytest.raises(ResolveError, match="HTTP 404"):
        resolve(f"{http_yaml_server}/missing.yaml")


def test_http_provider_invalid_yaml_raises(http_yaml_server):
    with pytest.raises(ResolveError, match="not valid YAML"):
        resolve(f"{http_yaml_server}/bad.yaml")


def test_http_provider_connection_refused_raises():
    with pytest.raises(ResolveError, match="cannot fetch"):
        resolve("http://127.0.0.1:1/nope.yaml")
