"""zpages debug-surface tests — the reference's diagnostics pages
(service/zpages.go:17-23 paths; service/internal/graph/zpages.go:21-70
pipelinez table incl. connector annotation and the pipelinenamez filter;
service/zpages.go:78-93 featurez gate table), rendered from live engine
state and served by the OTLP/HTTP receiver."""

from __future__ import annotations

import urllib.request

from otel_arrow_collector_spark.exporters.obsreport import ObsReport
from otel_arrow_collector_spark.plans import PipelineGraph
from otel_arrow_collector_spark.plans.featuregate import Registry, Stage
from otel_arrow_collector_spark.plans.zpages import (BuildInfo, ZPages,
                                                     EXTENSION_PATH,
                                                     FEATURE_PATH,
                                                     PIPELINE_PATH,
                                                     SERVICE_PATH)
from otel_arrow_collector_spark.sources.http_receiver import OtlpHttpReceiver

CFG = """
receivers:
  table/events: {kind: table, table: events}
processors:
  filter/errors: {kind: filter, where: "event_type = 'error'"}
exporters:
  sink/count: {kind: "null"}
connectors:
  forward: {kind: forward}
pipelines:
  errs: {receivers: [table/events], processors: [filter/errors], exporters: [forward]}
  out:  {receivers: [forward], exporters: [sink/count]}
"""


def _zp() -> ZPages:
    reg = Registry()
    reg.register("engine.zpagesTest", Stage.BETA, description="test gate")
    obs = ObsReport()
    obs.record("otlp", "traces", "accepted", 7)
    return ZPages(build_info=BuildInfo(version="1.2.3"),
                  graph=PipelineGraph.from_yaml(CFG), registry=reg,
                  extensions=["zpages", "file_storage"], obsreport=obs)


def test_servicez_build_runtime_links_and_counters():
    body = _zp().servicez().decode()
    assert "Build Info" in body and "1.2.3" in body
    assert "Runtime Info" in body and "Python" in body
    for link in (PIPELINE_PATH, EXTENSION_PATH, FEATURE_PATH):
        assert link in body
    assert "otlp/traces/accepted" in body and ">7<" in body


def test_pipelinez_rows_connector_annotation_and_filter():
    zp = _zp()
    body = zp.pipelinez().decode()
    # both pipelines, connector annotated in BOTH roles
    # (graph/zpages.go:35-54 receiver- and exporter-side switches)
    assert "errs" in body and "out" in body
    assert "forward (connector)" in body
    assert "table/events" in body and "filter/errors" in body
    # immutable DataFrames: mutates-data is constant false
    assert "<td>false</td>" in body
    filtered = zp.pipelinez("out").decode()
    assert "out" in filtered and "filter/errors" not in filtered


def test_featurez_and_extensionz_tables():
    zp = _zp()
    f = zp.featurez().decode()
    assert "engine.zpagesTest" in f and "true" in f and "Beta" in f
    e = zp.extensionz().decode()
    assert "file_storage" in e and "zpages" in e


def test_handle_dispatch_unknown_page_is_none():
    zp = _zp()
    assert zp.handle("/debug/nopez", {}) is None
    code, body = zp.handle(SERVICE_PATH, {})
    assert code == 200 and b"Build Info" in body


def test_zpages_served_by_live_receiver(tmp_path):
    rcv = OtlpHttpReceiver(str(tmp_path / "spool"), zpages=_zp())
    host, port = rcv.start()
    try:
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(f"{base}/debug/servicez") as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/html")
            assert b"Build Info" in r.read()
        url = f"{base}/debug/pipelinez?pipelinenamez=errs"
        with urllib.request.urlopen(url) as r:
            page = r.read().decode()
            assert "errs" in page and ">out<" not in page
        # /status JSON surface still works alongside the zpages
        with urllib.request.urlopen(f"{base}/status") as r:
            assert r.status == 200 and b"counters" in r.read()
        try:
            urllib.request.urlopen(f"{base}/debug/unknown")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as exc:
            assert exc.code == 404
    finally:
        rcv.stop()
