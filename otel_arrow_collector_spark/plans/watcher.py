"""Config-watch driven hot reload — the reference's provider Watch loop.

``otelcol/collector.go:236-252`` selects on ``ConfigProvider.Watch()``
and re-runs the whole resolve->compile->run cycle
(``reloadConfiguration``, collector.go:194-208) whenever a provider
reports a change; the fileprovider itself has no inotify hook, so this
watcher polls file mtimes (the same fidelity class, with debounce to
collapse editor write bursts).  ``http(s):`` config URIs are watched
too — the reference's Watch interface is provider-agnostic — via
conditional GET (ETag / Last-Modified validators, body-hash fallback)
at a slower cadence than the local mtime poll.

One deliberate divergence, guarded up front rather than after teardown:
the reference's ``reloadConfiguration`` shuts the old service down
BEFORE re-setup, so an invalid edit kills the collector outright.  This
watcher runs the reference's own ``DryRun`` validation
(collector.go:209-219) against the changed config FIRST and only fires
``Collector.reload()`` when it passes — an invalid edit is recorded as
a rejected event and the running plan is untouched, which is what an
operator editing the config of a live engine actually wants.  A config
that passes dry-run but still fails apply (e.g. a port bind race) goes
through ``reload()``'s reference-faithful failed-apply path (full
shutdown + unwind).
"""

from __future__ import annotations

import os
import re
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from .collector import Collector, State


class _FileProbe:
    """(mtime, size) change token for a local path; a vanished file
    probes as (-1, -1) so deletion registers as a change (and the
    eventual re-write as another)."""

    def __init__(self, path: str):
        self.path = path

    def probe(self) -> tuple:
        try:
            st = os.stat(self.path)
            return (st.st_mtime, st.st_size)
        except OSError:
            return (-1.0, -1)


class _HttpProbe:
    """Conditional-GET change token for an ``http(s):`` config URI
    (the reference's Watch interface is provider-agnostic,
    otelcol/collector.go:236-252; this is the polling analogue for the
    httpprovider).  Sends ``If-None-Match`` when the server gave an
    ETag; 304 keeps the current token, 200 re-derives it.  Without an
    ETag every poll is a full GET hashed by body sha256 — Last-Modified
    is deliberately NOT used as a change token or conditional validator
    (its 1-second granularity silently swallows successive edits within
    the same second; ADVICE r11), it only costs one body transfer per
    (slow-cadence) poll to be exact instead.

    Errors: a TRANSIENT fetch error (network, 5xx) keeps the current
    token forever — a blip is no information about the config, and
    reload-cycling on it would tear a healthy plan down.  A PERSISTENT
    client error (:data:`GONE_AFTER` consecutive 4xx responses) flips
    the token to ``("gone", code)`` — a deleted remote config is a fact
    about the config, exactly as a vanished local file probes (-1, -1);
    the watcher's dry-run then surfaces it as a rejected event while
    the old plan keeps running.  Polled at its own (slower) cadence
    than local files: ``interval`` here is seconds between real GETs;
    off-cadence probes return the cached token."""

    #: consecutive 4xx probes before a remote config counts as deleted
    #: (one 404 can be a deploy race / LB blip; three on the slow
    #: cadence is a durable fact).
    GONE_AFTER = 3

    def __init__(self, url: str, interval: float):
        self.url = url
        self.interval = interval
        self._etag: str | None = None
        self._client_errs = 0
        self._token: tuple = ("init",)
        self._next_due = 0.0   # first probe() fetches immediately

    def probe(self) -> tuple:
        now = time.monotonic()
        if now < self._next_due:
            return self._token
        self._next_due = now + self.interval
        import urllib.error
        import urllib.request
        req = urllib.request.Request(self.url)
        if self._etag is not None:
            req.add_header("If-None-Match", self._etag)
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                body = resp.read()
                self._etag = resp.headers.get("ETag")
        except urllib.error.HTTPError as e:
            if e.code == 304:
                self._client_errs = 0
                return self._token        # validated unchanged
            if 400 <= e.code < 500:
                self._client_errs += 1
                if self._client_errs >= self.GONE_AFTER:
                    self._token = ("gone", e.code)
                    # drop the validator: once deleted, a restored
                    # config must arrive as a full 200 (a 304 against
                    # the stale ETag would pin the gone-token forever)
                    self._etag = None
            return self._token            # 5xx: no information
        except (urllib.error.URLError, OSError):
            return self._token            # transient: no information
        self._client_errs = 0
        if self._etag is not None:
            self._token = ("etag", self._etag)
        else:
            import hashlib
            self._token = ("sha", hashlib.sha256(body).hexdigest())
        return self._token


def _probes(uris: list[str],
            http_interval: float) -> dict[str, object]:
    """The watchable subset of config URIs: ``file:`` scheme (or bare
    paths) by mtime poll, ``http:``/``https:`` by conditional GET
    (env:/yaml: are inline — nothing external can change)."""
    out: dict[str, object] = {}
    for u in uris:
        m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):(.*)$", u, re.DOTALL)
        scheme, rest = (m.group(1), m.group(2)) if m else ("file", u)
        if scheme == "file":
            out[u] = _FileProbe(rest)
        elif scheme in ("http", "https"):
            out[u] = _HttpProbe(u, http_interval)
    return out


@dataclass
class WatchEvent:
    """One watcher decision, in order: ``kind`` is ``reloaded`` (cycle
    re-ran, ``detail`` = exporter results), ``rejected`` (new config
    failed dry-run validation; old plan untouched, ``detail`` = the
    error), or ``failed`` (dry-run passed but apply failed; collector
    closed per the reference's failed-apply path)."""
    kind: str
    detail: Any = field(default=None)


class ConfigWatcher:
    """Poll the collector's file-based config URIs; on a (debounced)
    change, validate-then-reload.  Events are recorded in arrival order
    on :attr:`events`; ``on_event`` gets each one as it happens."""

    def __init__(self, collector: Collector, *,
                 interval: float = 0.10, debounce: float = 0.15,
                 http_interval: float = 2.0,
                 on_event: Callable[[WatchEvent], None] | None = None):
        self.collector = collector
        self.interval = interval
        self.debounce = debounce
        self.on_event = on_event
        self.events: list[WatchEvent] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._probes = _probes(collector.config_uris, http_interval)
        if not self._probes:
            raise ValueError(
                "no file-based or http(s) config URIs to watch")
        # Baseline at CONSTRUCTION, not thread start: callers build the
        # watcher next to (or before) the config resolve they want to
        # watch from; an edit landing in the construct->start gap is
        # then a detected change, not a silently absorbed baseline.
        self._base = self._snapshot()

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "ConfigWatcher":
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="config-watcher")
        self._thread.start()
        return self

    def stop(self) -> None:
        """Signal the poll loop and wait for it to exit.  The join is
        UNBOUNDED on purpose: an in-flight ``reload()`` (a Spark job —
        easily longer than any fixed timeout) must finish before the
        caller proceeds to ``Collector.shutdown()``; returning early
        would race the reload's apply phase against the shutdown and
        tear extensions down under a running recompile."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def __enter__(self) -> "ConfigWatcher":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- poll loop ---------------------------------------------------------

    def _snapshot(self) -> dict[str, tuple]:
        return {u: p.probe() for u, p in self._probes.items()}

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            cur = self._snapshot()
            if cur == self._base:
                continue
            # Debounce: wait until the file set has been stable for one
            # full debounce window (editors write in bursts; a reload
            # mid-burst would resolve a torn config).
            stable_since = time.monotonic()
            last = cur
            while not self._stop.wait(self.interval):
                nxt = self._snapshot()
                if nxt != last:
                    last, stable_since = nxt, time.monotonic()
                elif time.monotonic() - stable_since >= self.debounce:
                    break
            if self._stop.is_set():
                return
            self._base = last
            self._apply()
            if self.collector.state is not State.RUNNING:
                return          # failed apply closed the collector

    def _apply(self) -> None:
        c = self.collector
        try:
            Collector.dry_run(c.spark, *c.config_uris,
                              sources=c.sources, sf_dir=c.sf_dir)
        except Exception as e:
            self._emit(WatchEvent("rejected", e))
            return
        try:
            res = c.reload()
        except Exception as e:
            self._emit(WatchEvent("failed", e))
            return
        self._emit(WatchEvent("reloaded", res))

    def _emit(self, ev: WatchEvent) -> None:
        self.events.append(ev)
        if self.on_event is not None:
            self.on_event(ev)

    # -- test/ops hook -----------------------------------------------------

    def wait_for(self, n_events: int, timeout: float = 30.0) -> bool:
        """Block until at least ``n_events`` have been recorded."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if len(self.events) >= n_events:
                return True
            time.sleep(0.02)
        return len(self.events) >= n_events
