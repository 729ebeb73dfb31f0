"""Retry / timeout / throttle sender — the exporterhelper egress chain
(exporter/exporterhelper/queued_retry.go:239-267 settings, :353-441 loop;
timeout common.go:18-28,183-198; throttle + status mapping
exporter/otlpexporter/otlp.go:233-303; partial success
otlphttpexporter/otlp.go:248-299).

Semantics reproduced:
- exponential backoff: initial 5s ×1.5 up to 30s, max elapsed 5m (defaults
  from the reference), optional jitter hook (randomization factor 0.5 in
  the reference; injectable here so tests are deterministic)
- permanent errors drop immediately (consumererror.IsPermanent path)
- server throttle (Retry-After / gRPC RetryInfo) OVERRIDES the computed
  backoff delay (otlp.go:267-303)
- per-attempt timeout (timeoutSender, 5s default)
- partial success: push may report rejected rows; they are counted, not
  retried (the reference logs partial successes without retrying,
  otlphttpexporter/otlp.go:260-299)
- obsreport accounting: sent / send_failed per component (§2.7)

The sender wraps any ``push(batch) -> PartialSuccess | None`` callable and
is foreachBatch-shaped: use ``foreach_batch_sink`` to mount it on a
streaming query (Spark task retry is oblivious to Retry-After — this layer
is where throttle-awareness lives, SURVEY.md §4).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FutTimeout
from dataclasses import dataclass
from typing import Any, Callable

from .obsreport import ObsReport


class TransientError(RuntimeError):
    """Retryable failure (gRPC Unavailable/DeadlineExceeded...,
    otlp.go:233-266 retryable status set)."""


class PermanentError(RuntimeError):
    """Non-retryable failure (InvalidArgument...; dropped immediately)."""


class ThrottleError(TransientError):
    """Server asked to slow down; carries the mandated delay
    (Retry-After / RetryInfo, otlp.go:267-303)."""

    def __init__(self, message: str, retry_after_s: float):
        super().__init__(message)
        self.retry_after_s = retry_after_s


@dataclass
class PartialSuccess:
    """Subset rejection without failure (partial-success response)."""
    rejected: int = 0
    message: str = ""


@dataclass
class RetryConfig:
    initial_interval_s: float = 5.0       # queued_retry.go:258-267 defaults
    multiplier: float = 1.5
    max_interval_s: float = 30.0
    max_elapsed_s: float = 300.0
    attempt_timeout_s: float = 5.0        # common.go:18-28
    enabled: bool = True
    jitter: Callable[[float], float] | None = None   # delay -> jittered delay
    sleep: Callable[[float], None] = time.sleep      # injectable for tests


class RetrySender:
    """Throttle-aware retry loop around a push function."""

    def __init__(self, push: Callable[[Any], PartialSuccess | None],
                 config: RetryConfig | None = None,
                 obsreport: ObsReport | None = None,
                 component: str = "exporter", signal: str = "traces"):
        self.push = push
        self.cfg = config or RetryConfig()
        self.obs = obsreport or ObsReport()
        self.component = component
        self.signal = signal
        self._pool = ThreadPoolExecutor(max_workers=4)

    def _attempt(self, batch, count: int):
        fut = self._pool.submit(self.push, batch)
        try:
            return fut.result(timeout=self.cfg.attempt_timeout_s)
        except FutTimeout:
            fut.cancel()
            raise TransientError(
                f"attempt timed out after {self.cfg.attempt_timeout_s}s")

    def send(self, batch, count: int | None = None) -> PartialSuccess | None:
        """Deliver one batch; raises the final error after retries are
        exhausted (the caller — queue/checkpoint — decides requeueing)."""
        n = count if count is not None else _infer_count(batch)
        cfg = self.cfg
        delay = cfg.initial_interval_s
        start = time.monotonic()
        attempt = 0
        while True:
            attempt += 1
            try:
                res = self._attempt(batch, n)
                self.obs.record(self.component, self.signal, "sent",
                                max(0, n - (res.rejected if res else 0)))
                if res and res.rejected:
                    self.obs.record(self.component, self.signal,
                                    "send_failed", res.rejected)
                return res
            except PermanentError:
                self.obs.record(self.component, self.signal, "send_failed", n)
                raise
            except TransientError as e:
                if not cfg.enabled:
                    self.obs.record(self.component, self.signal,
                                    "send_failed", n)
                    raise
                wait = delay
                if isinstance(e, ThrottleError):
                    wait = e.retry_after_s      # server hint overrides backoff
                elif cfg.jitter:
                    wait = cfg.jitter(delay)
                elapsed = time.monotonic() - start
                if elapsed + wait > cfg.max_elapsed_s:
                    self.obs.record(self.component, self.signal,
                                    "send_failed", n)
                    raise TransientError(
                        f"max elapsed time ({cfg.max_elapsed_s}s) exceeded "
                        f"after {attempt} attempts") from e
                cfg.sleep(wait)
                delay = min(delay * cfg.multiplier, cfg.max_interval_s)


def _infer_count(batch) -> int:
    if hasattr(batch, "count") and callable(batch.count):
        try:
            return batch.count()
        except TypeError:
            pass
    try:
        return len(batch)
    except TypeError:
        return 1


def foreach_batch_sink(sender: RetrySender):
    """Mount a RetrySender on writeStream.foreachBatch."""
    def sink(batch_df, batch_id: int) -> None:
        sender.send(batch_df)
    return sink
