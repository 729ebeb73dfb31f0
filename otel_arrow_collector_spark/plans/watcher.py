"""Config-watch driven hot reload — the reference's provider Watch loop.

``otelcol/collector.go:236-252`` selects on ``ConfigProvider.Watch()``
and re-runs the whole resolve->compile->run cycle
(``reloadConfiguration``, collector.go:194-208) whenever a provider
reports a change; the fileprovider itself has no inotify hook, so this
watcher polls file mtimes (the same fidelity class, with debounce to
collapse editor write bursts).

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


def _file_paths(uris: list[str]) -> list[str]:
    """The watchable subset of config URIs: ``file:`` scheme or bare
    paths (env:/yaml:/http: providers have no local mtime to poll)."""
    out = []
    for u in uris:
        m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):(.*)$", u, re.DOTALL)
        scheme, rest = (m.group(1), m.group(2)) if m else ("file", u)
        if scheme == "file":
            out.append(rest)
    return out


def _snapshot(paths: list[str]) -> dict[str, tuple[float, int]]:
    """(mtime, size) per path; a vanished file snapshots as (-1, -1)
    so deletion registers as a change (and the eventual re-write as
    another)."""
    snap = {}
    for p in paths:
        try:
            st = os.stat(p)
            snap[p] = (st.st_mtime, st.st_size)
        except OSError:
            snap[p] = (-1.0, -1)
    return snap


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
                 on_event: Callable[[WatchEvent], None] | None = None):
        self.collector = collector
        self.interval = interval
        self.debounce = debounce
        self.on_event = on_event
        self.events: list[WatchEvent] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.paths = _file_paths(collector.config_uris)
        if not self.paths:
            raise ValueError("no file-based config URIs to watch")
        # Baseline at CONSTRUCTION, not thread start: callers build the
        # watcher next to (or before) the config resolve they want to
        # watch from; an edit landing in the construct->start gap is
        # then a detected change, not a silently absorbed baseline.
        self._base = _snapshot(self.paths)

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

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            cur = _snapshot(self.paths)
            if cur == self._base:
                continue
            # Debounce: wait until the file set has been stable for one
            # full debounce window (editors write in bursts; a reload
            # mid-burst would resolve a torn config).
            stable_since = time.monotonic()
            last = cur
            while not self._stop.wait(self.interval):
                nxt = _snapshot(self.paths)
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
