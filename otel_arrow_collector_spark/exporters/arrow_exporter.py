"""Arrow-first egress with unary downgrade — the fork's stream-controller
semantics (exporter/otlpexporter/internal/arrow/exporter.go:120-172):
maintain ``num_streams`` Arrow paths; when an endpoint rejects the Arrow
protocol, count a stream down; when none remain, **downgrade to unary
OTLP** for the rest of the session — unless ``disable_downgrade``
(exporter/otlpexporter/config.go:36-44), in which case the send fails.

Spark-first shape: "a stream" is not a thread here — Spark supplies
write parallelism — it is a *protocol attempt budget*.  The exporter
encodes each batch via the Arrow IPC codec (sources/arrow_ipc.py, the
mapInArrow path) and hands the encoded frame to ``arrow_push``; on
``ArrowUnsupportedError`` it decrements the budget and retries the same
batch, falling back to ``unary_push`` (rows, OTLP/JSON shape) once the
budget is exhausted.  Batches are never dropped by a downgrade
(otlp.go:171-187: the unary path is tried with the same request).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..sources.arrow_ipc import encode_ipc
from .obsreport import ObsReport


class ArrowUnsupportedError(RuntimeError):
    """Endpoint does not speak the Arrow protocol (maps the reference's
    downgrade-triggering gRPC status, arrow/stream.go:164-183)."""


class DowngradeDisabledError(RuntimeError):
    """Arrow failed everywhere and downgrade is disabled."""


@dataclass
class ArrowFirstExporter:
    """``send(df)``: Arrow first, unary fallback, per-path accounting."""

    arrow_push: Callable[[DataFrame], None]   # takes encode_ipc() frames
    unary_push: Callable[[DataFrame], None]   # takes the row DataFrame
    num_streams: int = 1
    disable_downgrade: bool = False
    obsreport: ObsReport | None = None

    def __post_init__(self) -> None:
        if self.num_streams < 1:
            raise ValueError("num_streams must be >= 1")   # config.go:59-62
        self._streams_left = self.num_streams
        self.obsreport = self.obsreport or ObsReport()

    @property
    def downgraded(self) -> bool:
        return self._streams_left == 0

    def send(self, df: DataFrame, signal: str = "traces") -> str:
        """Send one batch; returns the path used ('arrow' | 'unary')."""
        while self._streams_left > 0:
            try:
                self.arrow_push(encode_ipc(df))
                self.obsreport.record("arrow_exporter", signal,
                                      "sent_arrow_batches", 1)
                return "arrow"
            except ArrowUnsupportedError:
                # exporter.go:136-172: count the stream down, try the next
                self._streams_left -= 1
        if self.disable_downgrade:
            raise DowngradeDisabledError(
                "all Arrow streams rejected and downgrade is disabled")
        self.unary_push(df)
        self.obsreport.record("arrow_exporter", signal,
                              "sent_unary_batches", 1)
        return "unary"
