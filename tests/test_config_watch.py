"""Config-watch hot reload: a running collector picks up file edits
(otelcol/collector.go:236-252 Watch loop -> reloadConfiguration
194-208); invalid edits are dry-run-rejected and keep the old plan."""

from __future__ import annotations

import time

from otel_arrow_collector_spark.plans.collector import Collector, State
from otel_arrow_collector_spark.plans.watcher import ConfigWatcher
from tests.conftest import SF_SMALL

_FILTERED = """\
receivers: {ev: {kind: table, table: events}}
processors: {only_errors: {kind: filter, where: "event_type = 'error'"}}
exporters: {out: {kind: "null"}}
pipelines:
  p1: {receivers: [ev], processors: [only_errors], exporters: [out]}
"""

_UNFILTERED = """\
receivers: {ev: {kind: table, table: events}}
exporters: {out: {kind: "null"}}
pipelines:
  p1: {receivers: [ev], exporters: [out]}
"""

_BAD = """\
receivers: {ev: {kind: table, table: events}}
exporters: {out: {kind: "null"}}
pipelines:
  p1: {receivers: [missing_receiver], exporters: [out]}
"""


def _write(path, text):
    # A fresh mtime even on coarse-granularity filesystems.
    path.write_text(text)
    now = time.time()
    import os
    os.utime(path, (now, now))


def test_watcher_fires_reload_on_config_edit(spark, tmp_path):
    cfg = tmp_path / "collector.yaml"
    _write(cfg, _FILTERED)
    c = Collector(spark, str(cfg), sf_dir=SF_SMALL)
    res = c.start()
    n_filtered = res["p1/out"]

    with ConfigWatcher(c) as w:
        _write(cfg, _UNFILTERED)
        assert w.wait_for(1), "watcher never fired"
    assert [e.kind for e in w.events] == ["reloaded"]
    assert c.state is State.RUNNING
    # the live plan now reflects the edited config (filter dropped)
    assert w.events[0].detail["p1/out"] > n_filtered
    c.shutdown()


def test_invalid_edit_keeps_old_plan_running(spark, tmp_path):
    cfg = tmp_path / "collector.yaml"
    _write(cfg, _FILTERED)
    c = Collector(spark, str(cfg), sf_dir=SF_SMALL)
    n_before = c.start()["p1/out"]

    with ConfigWatcher(c) as w:
        _write(cfg, _BAD)
        assert w.wait_for(1), "watcher never fired"
        assert w.events[0].kind == "rejected"
        assert c.state is State.RUNNING          # old plan still live
        assert c.plan.run()["p1/out"] == n_before

        # fixing the file while the watcher is still up recovers
        _write(cfg, _UNFILTERED)
        assert w.wait_for(2), "watcher never fired on the fix"
    assert w.events[1].kind == "reloaded"
    assert c.state is State.RUNNING
    assert w.events[1].detail["p1/out"] > n_before
    c.shutdown()


def test_debounce_collapses_write_burst(spark, tmp_path):
    cfg = tmp_path / "collector.yaml"
    _write(cfg, _FILTERED)
    c = Collector(spark, str(cfg), sf_dir=SF_SMALL)
    c.start()

    with ConfigWatcher(c, interval=0.05, debounce=0.4) as w:
        # an editor-style burst: several writes inside one debounce
        # window must produce ONE reload of the final content
        for text in (_UNFILTERED, _FILTERED, _UNFILTERED):
            _write(cfg, text)
            time.sleep(0.1)
        assert w.wait_for(1)
        time.sleep(0.6)          # would surface any extra firings
    assert [e.kind for e in w.events] == ["reloaded"]
    c.shutdown()


def test_watcher_requires_file_uris(spark):
    c = Collector(spark, "yaml:exporters: {out: {kind: 'null'}}",
                  sf_dir=SF_SMALL)
    try:
        ConfigWatcher(c).start()
    except ValueError as e:
        assert "file-based" in str(e)
    else:
        raise AssertionError("expected ValueError for yaml:-only URIs")


def test_apply_failure_after_valid_dryrun_closes_collector(spark, tmp_path):
    """The third event kind: a config that VALIDATES but fails to
    APPLY (telemetry metrics address already bound) goes through
    reload()'s reference-faithful failed-apply path — full shutdown —
    and the watcher records it as 'failed' and stops."""
    import socket

    from otel_arrow_collector_spark.plans.watcher import WatchEvent

    blocker = socket.socket()
    blocker.bind(("127.0.0.1", 0))
    blocker.listen(1)
    port = blocker.getsockname()[1]
    try:
        cfg = tmp_path / "collector.yaml"
        _write(cfg, _FILTERED)
        c = Collector(spark, str(cfg), sf_dir=SF_SMALL)
        c.start()
        with ConfigWatcher(c) as w:
            _write(cfg, _FILTERED + (
                "telemetry:\n  metrics:\n    level: basic\n"
                f"    address: 127.0.0.1:{port}\n"))
            assert w.wait_for(1), "watcher never fired"
        assert isinstance(w.events[0], WatchEvent)
        assert w.events[0].kind == "failed"
        assert c.state is State.CLOSED
    finally:
        blocker.close()


# --- http(s) provider watch (conditional GET; r10 verdict ask #4) ----------

class _ConfigHTTPServer:
    """Local HTTP config server with a mutable document, optional ETag /
    Last-Modified validators, and a request log of conditional hits."""

    def __init__(self, body: str, *, etag: bool = True,
                 last_modified: str | None = None):
        import http.server
        import threading
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                outer.requests.append(
                    self.headers.get("If-None-Match"))
                if outer.gone:
                    self.send_error(404)
                    return
                if (etag and outer.etag is not None
                        and self.headers.get("If-None-Match")
                        == outer.etag):
                    self.send_response(304)
                    self.end_headers()
                    return
                data = outer.body.encode()
                self.send_response(200)
                if etag:
                    self.send_header("ETag", outer.etag)
                if last_modified is not None:
                    self.send_header("Last-Modified", last_modified)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):
                pass

        self.requests: list = []
        self.body = body
        self.gone = False
        self.etag = '"v1"' if etag else None
        self._etag_on = etag
        self.srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.url = f"http://127.0.0.1:{self.srv.server_address[1]}/c.yaml"
        threading.Thread(target=self.srv.serve_forever,
                         daemon=True).start()

    def set_body(self, body: str):
        self.body = body
        if self._etag_on:
            self.etag = f'"v{len(self.requests)}-{hash(body) & 0xffff}"'

    def close(self):
        self.srv.shutdown()
        self.srv.server_close()


def test_http_watch_reloads_on_change_and_rejects_invalid(spark):
    """An http(s): config URI is watched via conditional GET: a served
    change fires a reload; serving an INVALID config is dry-run
    rejected and the old plan keeps running; fixing it recovers."""
    srv = _ConfigHTTPServer(_FILTERED)
    try:
        c = Collector(spark, srv.url, sf_dir=SF_SMALL)
        res = c.start()
        n_filtered = res["p1/out"]
        with ConfigWatcher(c, http_interval=0.05) as w:
            srv.set_body(_UNFILTERED)
            assert w.wait_for(1), "watcher never fired on http change"
            assert [e.kind for e in w.events] == ["reloaded"]
            assert w.events[0].detail["p1/out"] > n_filtered
            srv.set_body(_BAD)
            assert w.wait_for(2), "watcher never saw the bad config"
            assert w.events[1].kind == "rejected"
            assert c.state is State.RUNNING
            srv.set_body(_FILTERED)
            assert w.wait_for(3), "watcher never fired on the fix"
            assert w.events[2].kind == "reloaded"
        assert c.state is State.RUNNING
        # the 304 path actually ran: conditional headers were sent
        assert any(h is not None for h in srv.requests)
        c.shutdown()
    finally:
        srv.close()


def test_http_watch_no_validators_falls_back_to_body_hash(spark):
    """A server with no ETag/Last-Modified still watches correctly —
    the token degrades to the body sha256 (every poll is a full GET)."""
    srv = _ConfigHTTPServer(_FILTERED, etag=False)
    try:
        c = Collector(spark, srv.url, sf_dir=SF_SMALL)
        c.start()
        with ConfigWatcher(c, http_interval=0.05) as w:
            srv.set_body(_UNFILTERED)
            assert w.wait_for(1), "watcher never fired without validators"
            assert w.events[0].kind == "reloaded"
        assert c.state is State.RUNNING
        c.shutdown()
    finally:
        srv.close()


def test_http_probe_persistent_404_registers_as_deletion():
    """A permanently deleted remote config (consecutive 4xx) must
    surface as a change — like a vanished local file — while the first
    few 4xx stay 'no information' (a deploy race is not a deletion),
    and the gone-token is stable (no reload-cycling on repeat 404s).
    ADVICE r11."""
    from otel_arrow_collector_spark.plans.watcher import _HttpProbe
    srv = _ConfigHTTPServer(_FILTERED)
    try:
        p = _HttpProbe(srv.url, interval=0.0)
        t0 = p.probe()
        assert t0[0] == "etag"
        srv.gone = True
        assert p.probe() == t0          # 1st 404: could be a blip
        assert p.probe() == t0          # 2nd: still no information
        t_gone = p.probe()              # 3rd consecutive: a fact
        assert t_gone == ("gone", 404)
        assert p.probe() == t_gone      # stable — one event, not a cycle
        srv.gone = False                # restored: registers as change
        assert p.probe() == t0
    finally:
        srv.close()


def test_http_probe_lastmod_only_detects_subsecond_edit():
    """With only a Last-Modified validator the probe must hash the
    body, not trust the validator: two different bodies served under
    the SAME Last-Modified second must produce different tokens
    (ADVICE r11 — the 1-second granularity miss)."""
    from otel_arrow_collector_spark.plans.watcher import _HttpProbe
    srv = _ConfigHTTPServer(
        _FILTERED, etag=False,
        last_modified="Wed, 21 Oct 2015 07:28:00 GMT")
    try:
        p = _HttpProbe(srv.url, interval=0.0)
        t0 = p.probe()
        assert t0[0] == "sha"
        srv.body = _UNFILTERED         # same Last-Modified, new body
        t1 = p.probe()
        assert t1 != t0 and t1[0] == "sha"
    finally:
        srv.close()


def test_http_watch_transient_error_is_not_a_change(spark):
    """Killing the config server mid-watch must NOT fire a reload cycle
    — a network blip carries no information about the config (unlike a
    vanished file, which is a local fact)."""
    srv = _ConfigHTTPServer(_FILTERED)
    c = Collector(spark, srv.url, sf_dir=SF_SMALL)
    c.start()
    with ConfigWatcher(c, http_interval=0.05) as w:
        srv.close()              # server gone; probes now error
        time.sleep(0.8)
        assert w.events == []
        assert c.state is State.RUNNING
    c.shutdown()
