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

import inspect
import threading
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


class CancelToken:
    """Cooperative attempt-cancellation handle (timeoutSender's context:
    common.go:183-198 cancels the in-flight RPC on deadline).  Python
    threads cannot be force-killed, so cancellation is cooperative: a push
    that accepts the token should poll ``cancelled`` / call
    ``raise_if_cancelled`` at I/O boundaries and abort its side effects."""

    def __init__(self, timeout_s: float):
        self._ev = threading.Event()
        self.deadline = time.monotonic() + timeout_s

    def cancel(self) -> None:
        self._ev.set()

    @property
    def cancelled(self) -> bool:
        return self._ev.is_set()

    def remaining(self) -> float:
        return self.deadline - time.monotonic()

    def raise_if_cancelled(self) -> None:
        if self.cancelled:
            raise TransientError("attempt cancelled (timeout)")


def _accepts_token(push: Callable) -> bool:
    try:
        params = list(inspect.signature(push).parameters.values())
    except (TypeError, ValueError):
        return False
    pos = [p for p in params
           if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
    var = any(p.kind is p.VAR_POSITIONAL for p in params)
    return len(pos) >= 2 or var


class RetrySender:
    """Throttle-aware retry loop around a push function.

    Delivery semantics: the push receives a :class:`CancelToken` as a
    second argument when its signature accepts one; a cooperative push
    aborts on cancel, giving (effectively) at-most-once per attempt.  A
    push that ignores the token may still complete AFTER its attempt timed
    out and a retry was issued — at-least-once overall; pair the sink with
    ``streaming.dedup_stream`` when the downstream is not idempotent.

    Each attempt runs on its own single-thread executor: a hung attempt
    never queues later attempts behind it (so a later attempt's timeout
    measures push time, not queue wait), and the executor is torn down as
    soon as its push returns.
    """

    def __init__(self, push: Callable[..., PartialSuccess | None],
                 config: RetryConfig | None = None,
                 obsreport: ObsReport | None = None,
                 component: str = "exporter", signal: str = "traces"):
        self.push = push
        self.cfg = config or RetryConfig()
        self.obs = obsreport or ObsReport()
        self.component = component
        self.signal = signal
        self._push_takes_token = _accepts_token(push)
        self._zombies: list = []   # timed-out, still-running attempt futures

    def close(self) -> None:
        """Cancel any timed-out attempts still running (cooperative)."""
        self._zombies = [f for f in self._zombies if not f.done()]

    def __enter__(self) -> "RetrySender":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _attempt(self, batch, count: int):
        self._zombies = [f for f in self._zombies if not f.done()]
        token = CancelToken(self.cfg.attempt_timeout_s)
        ex = ThreadPoolExecutor(max_workers=1)
        if self._push_takes_token:
            fut = ex.submit(self.push, batch, token)
        else:
            fut = ex.submit(self.push, batch)
        try:
            res = fut.result(timeout=max(0.0, token.remaining()))
        except FutTimeout:
            token.cancel()   # the reference cancels the RPC context here
            # the worker thread frees itself when the push finally returns
            fut.add_done_callback(lambda _f: ex.shutdown(wait=False))
            self._zombies.append(fut)
            raise TransientError(
                f"attempt timed out after {self.cfg.attempt_timeout_s}s")
        except BaseException:
            ex.shutdown(wait=False)
            raise
        ex.shutdown(wait=False)
        return res

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
