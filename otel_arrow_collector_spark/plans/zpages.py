"""zpages debug surface — the reference's in-process diagnostics pages.

Mirrors ``service/zpages.go:17-23`` (paths servicez / pipelinez /
extensionz / featurez), ``service/zpages.go:47-69`` (servicez: build info +
runtime info + component links), ``service/internal/graph/zpages.go:21-70``
(pipelinez: one row per pipeline with receivers / processors / exporters,
connectors annotated, ``pipelinenamez`` filter param) and
``service/zpages.go:71-93`` (featurez: the feature-gate registry table).

Spark-first stance: the pages are plain HTML rendered from engine-side
state (the validated :class:`~..plans.pipeline.PipelineGraph`, the
:class:`~..plans.featuregate.Registry`, obsreport counters).  They are
served by the live OTLP/HTTP receiver's GET handler
(``sources/http_receiver.py``) — one server for ingest and diagnostics,
like the reference's shared confighttp server.
"""

from __future__ import annotations

import html
import platform
import sys
import time
from dataclasses import dataclass, field

SERVICE_PATH = "/debug/servicez"
PIPELINE_PATH = "/debug/pipelinez"
EXTENSION_PATH = "/debug/extensionz"
FEATURE_PATH = "/debug/featurez"
TRACEZ_PATH = "/debug/tracez"

#: pipelinez filter param (graph/zpages.go:16 zPipelineName)
PIPELINE_NAME_PARAM = "pipelinenamez"

#: tracez span-name filter param (contrib zpages' zspanname)
SPAN_NAME_PARAM = "zspanname"

#: tracez latency bucket lower bounds in microseconds — the contrib
#: zpages defaultBoundaries (10µs, 100µs, 1ms, 10ms, 100ms, 1s, 10s,
#: 100s), bucket 0 catching everything below 10µs
TRACEZ_BOUNDS_US = (0, 10, 100, 1_000, 10_000, 100_000,
                    1_000_000, 10_000_000, 100_000_000)
_TRACEZ_LABELS = (">0us", ">10us", ">100us", ">1ms", ">10ms", ">100ms",
                  ">1s", ">10s", ">100s")


def _latency_bucket(duration_us: int) -> int:
    b = 0
    for i, lo in enumerate(TRACEZ_BOUNDS_US):
        if duration_us >= lo:
            b = i
    return b


@dataclass
class SpanSample:
    """One recorded operation (the zpagesSpanProcessor's stored span)."""

    name: str
    start_unix: float
    duration_us: int
    error: bool
    detail: str = ""


class SpanRecorder:
    """Latency-bucketed recent-operation store — the zpages span
    processor the reference registers on its tracer provider
    (extension/zpagesextension/zpagesextension.go:45-52: a
    ``zpagesSpanProcessor`` feeding ``zpages.NewTracezHandler``).

    Bounded state: per (span name, latency bucket) it keeps counts plus
    the most recent ``samples_per_bucket`` samples; errored operations
    are counted and sampled separately, like the contrib tracez
    error row.  Thread-safe; receivers record at operation boundaries
    (the obsreport instrumentation points).
    """

    def __init__(self, samples_per_bucket: int = 10):
        import threading
        self.samples_per_bucket = samples_per_bucket
        self._lock = threading.Lock()
        self._counts: dict[str, list[int]] = {}
        self._errors: dict[str, int] = {}
        self._samples: dict[tuple[str, int], list[SpanSample]] = {}
        self._error_samples: dict[str, list[SpanSample]] = {}

    def record(self, name: str, duration_us: int, *, error: bool = False,
               detail: str = "") -> None:
        s = SpanSample(name, time.time(), int(duration_us), error, detail)
        b = _latency_bucket(s.duration_us)
        with self._lock:
            counts = self._counts.setdefault(
                name, [0] * len(TRACEZ_BOUNDS_US))
            counts[b] += 1
            if error:
                self._errors[name] = self._errors.get(name, 0) + 1
                keep = self._error_samples.setdefault(name, [])
            else:
                keep = self._samples.setdefault((name, b), [])
            keep.append(s)
            del keep[:-self.samples_per_bucket]

    def snapshot(self):
        with self._lock:
            return ({k: list(v) for k, v in self._counts.items()},
                    dict(self._errors),
                    {k: list(v) for k, v in self._samples.items()},
                    {k: list(v) for k, v in self._error_samples.items()})


@dataclass
class BuildInfo:
    """component.BuildInfo analogue (service/zpages.go:96-102)."""

    command: str = "otel-arrow-collector-spark"
    description: str = "PySpark-native OTel-Arrow analytics engine"
    version: str = "dev"


@dataclass
class ZPages:
    """Renders the four debug pages from live engine state.

    ``graph`` is a validated PipelineGraph (or None), ``registry`` a
    featuregate Registry (or None), ``extensions`` the active extension
    names, ``obsreport`` an exporters.obsreport.ObsReport whose counters
    are appended to servicez (engine addition — the reference exposes
    those through the metrics pipeline instead).
    """

    build_info: BuildInfo = field(default_factory=BuildInfo)
    graph: object | None = None
    registry: object | None = None
    extensions: list[str] = field(default_factory=list)
    obsreport: object | None = None
    tracez_recorder: SpanRecorder | None = None
    #: service resource attributes (telemetry: resource, config.go:22-27;
    #: a None value SUPPRESSES the attribute, per the reference's
    #: null-YAML-value rule)
    resource: dict = field(default_factory=dict)
    start_time: float = field(default_factory=time.time)

    # -- dispatch ----------------------------------------------------------

    def handle(self, path: str, query: dict[str, str]) -> tuple[int, bytes] | None:
        """Return (status, html_body) for a /debug path, or None if the
        path is not a zpage (caller 404s)."""
        if path == SERVICE_PATH:
            return 200, self.servicez()
        if path == PIPELINE_PATH:
            return 200, self.pipelinez(query.get(PIPELINE_NAME_PARAM))
        if path == EXTENSION_PATH:
            return 200, self.extensionz()
        if path == FEATURE_PATH:
            return 200, self.featurez()
        if path == TRACEZ_PATH:
            return 200, self.tracez(query.get(SPAN_NAME_PARAM))
        return None

    # -- pages -------------------------------------------------------------

    def servicez(self) -> bytes:
        """Build info + runtime info + links (service/zpages.go:47-69)."""
        parts = [_page_header(f"Service {self.build_info.command}")]
        parts.append(_properties_table("Build Info", [
            ("Command", self.build_info.command),
            ("Description", self.build_info.description),
            ("Version", self.build_info.version),
        ]))
        parts.append(_properties_table("Runtime Info", [
            ("StartTimestamp", time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(self.start_time))),
            ("Python", sys.version.split()[0]),
            ("OS", platform.system().lower()),
            ("Arch", platform.machine()),
        ]))
        live = {k: v for k, v in self.resource.items() if v is not None}
        if live:
            parts.append(_properties_table(
                "Resource", sorted((k, str(v)) for k, v in live.items())))
        for name, endpoint in (("Pipelines", PIPELINE_PATH),
                               ("Extensions", EXTENSION_PATH),
                               ("Features", FEATURE_PATH),
                               ("Tracez", TRACEZ_PATH)):
            parts.append(
                f'<p><a href="{endpoint}">{html.escape(name)}</a></p>')
        if self.obsreport is not None:
            rows = sorted(self.obsreport.snapshot().items())
            parts.append(_properties_table(
                "ObsReport Counters",
                [("/".join(k), str(v)) for k, v in rows]))
        parts.append(_page_footer())
        return "".join(parts).encode()

    def pipelinez(self, name_filter: str | None = None) -> bytes:
        """One row per pipeline (graph/zpages.go:21-70): full name, input
        type, mutates-data, receivers / processors / exporters with
        connectors annotated; optional ``pipelinenamez`` filter."""
        parts = [_page_header("builtPipelines")]
        header = ("Full Name", "Input Type", "Mutates Data",
                  "Receivers", "Processors", "Exporters")
        rows: list[tuple[str, ...]] = []
        pipelines = getattr(self.graph, "pipelines", {}) or {}
        connectors = getattr(self.graph, "connectors", {}) or {}

        def _ann(cid: str) -> str:
            return f"{cid} (connector)" if cid in connectors else cid

        for name in sorted(pipelines):
            if name_filter and name != name_filter:
                continue
            p = pipelines[name]
            rows.append((
                name,
                name.split("/", 1)[0],
                # immutable DataFrames: no processor can mutate a shared
                # batch (SURVEY §4 clone-elision row), so the capability
                # OR (graph.go:240-242) is constant False
                "false",
                ", ".join(_ann(r) for r in p.receivers),
                ", ".join(p.processors),
                ", ".join(_ann(e) for e in p.exporters),
            ))
        parts.append(_summary_table("Pipelines", header, rows))
        parts.append(_page_footer())
        return "".join(parts).encode()

    def extensionz(self) -> bytes:
        """Extension list (extensions/extensions.go HandleZPages)."""
        parts = [_page_header("Extensions")]
        parts.append(_summary_table(
            "Extensions", ("Name",),
            [(e,) for e in sorted(self.extensions)]))
        parts.append(_page_footer())
        return "".join(parts).encode()

    def featurez(self) -> bytes:
        """Feature-gate table (service/zpages.go:78-93)."""
        parts = [_page_header("Feature Gates")]
        rows: list[tuple[str, ...]] = []
        if self.registry is not None:
            for g in self.registry.visit_all():
                rows.append((g.id, str(g.enabled).lower(), g.stage.value,
                             g.description, g.from_version, g.to_version))
        parts.append(_summary_table(
            "Feature Gates",
            ("ID", "Enabled", "Stage", "Description", "From", "To"),
            rows))
        parts.append(_page_footer())
        return "".join(parts).encode()

    def tracez(self, span_name: str | None = None) -> bytes:
        """Latency-bucketed recent operations
        (extension/zpagesextension/zpagesextension.go:52
        ``zpages.NewTracezHandler(zpe.zpagesSpanProcessor)``): a
        summary row per span name with per-bucket counts + errors;
        with ``zspanname=<name>`` also the retained samples for that
        name, newest first, errors in their own table."""
        parts = [_page_header("Tracez")]
        if self.tracez_recorder is None:
            parts.append("<p>span recording is not available</p>")
            parts.append(_page_footer())
            return "".join(parts).encode()
        counts, errors, samples, err_samples = \
            self.tracez_recorder.snapshot()
        header = ("Span Name", *_TRACEZ_LABELS, "Errors")
        rows = [(name,
                 *[str(c) for c in counts[name]],
                 str(errors.get(name, 0)))
                for name in sorted(counts)]
        parts.append(_summary_table("Spans", header, rows))
        if span_name is not None and span_name in counts:
            keep: list[SpanSample] = []
            for b in range(len(TRACEZ_BOUNDS_US)):
                keep.extend(samples.get((span_name, b), []))
            keep.sort(key=lambda s: -s.start_unix)
            srows = [(time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                    time.gmtime(s.start_unix)),
                      f"{s.duration_us}us",
                      _TRACEZ_LABELS[_latency_bucket(s.duration_us)],
                      s.detail)
                     for s in keep]
            parts.append(_summary_table(
                f"Latency samples: {span_name}",
                ("Start", "Duration", "Bucket", "Detail"), srows))
            erows = [(time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                    time.gmtime(s.start_unix)),
                      f"{s.duration_us}us", s.detail)
                     for s in sorted(err_samples.get(span_name, []),
                                     key=lambda s: -s.start_unix)]
            parts.append(_summary_table(
                f"Error samples: {span_name}",
                ("Start", "Duration", "Detail"), erows))
        parts.append(_page_footer())
        return "".join(parts).encode()


# -- HTML helpers (internal/zpages writer analogues) ------------------------

def _page_header(title: str) -> str:
    t = html.escape(title)
    return (f"<!DOCTYPE html><html><head><title>{t}</title></head>"
            f"<body><h1>{t}</h1>")


def _page_footer() -> str:
    return "</body></html>"


def _properties_table(name: str, props: list[tuple[str, str]]) -> str:
    out = [f"<h2>{html.escape(name)}</h2><table>"]
    for k, v in props:
        out.append(f"<tr><td>{html.escape(k)}</td>"
                   f"<td>{html.escape(v)}</td></tr>")
    out.append("</table>")
    return "".join(out)


def _summary_table(name: str, header: tuple[str, ...],
                   rows: list[tuple[str, ...]]) -> str:
    out = [f"<h2>{html.escape(name)}</h2><table><tr>"]
    out.extend(f"<th>{html.escape(h)}</th>" for h in header)
    out.append("</tr>")
    for row in rows:
        out.append("<tr>")
        out.extend(f"<td>{html.escape(c)}</td>" for c in row)
        out.append("</tr>")
    out.append("</table>")
    return "".join(out)
