"""Egress chain tests: retry/backoff/throttle/timeout/partial-success +
obsreport counters (queued_retry.go, otlp.go throttle, obsmetrics)."""

from __future__ import annotations

import time

import pytest

from otel_arrow_collector_spark.exporters import (ObsReport, PartialSuccess,
                                                  PermanentError, RetryConfig,
                                                  RetrySender, ThrottleError,
                                                  TransientError)


def _sender(push, **cfg_kw):
    sleeps: list[float] = []
    cfg = RetryConfig(initial_interval_s=cfg_kw.pop("initial", 1.0),
                      sleep=sleeps.append, **cfg_kw)
    obs = ObsReport()
    return RetrySender(push, cfg, obs, component="otlp", signal="traces"), \
        sleeps, obs


def test_success_counts_sent():
    s, sleeps, obs = _sender(lambda b: None)
    s.send(["a", "b", "c"])
    assert obs.get("otlp", "traces", "sent") == 3
    assert sleeps == []


def test_transient_retries_with_exponential_backoff():
    calls = []

    def push(b):
        calls.append(1)
        if len(calls) < 4:
            raise TransientError("unavailable")
    s, sleeps, obs = _sender(push)
    s.send([1, 2])
    # 5s-style growth: initial 1.0, x1.5 capped at 30 (queued_retry defaults)
    assert sleeps == [1.0, 1.5, 2.25]
    assert obs.get("otlp", "traces", "sent") == 2
    assert obs.get("otlp", "traces", "send_failed") == 0


def test_permanent_error_drops_immediately():
    s, sleeps, obs = _sender(_raise_perm)
    with pytest.raises(PermanentError):
        s.send([1, 2, 3])
    assert sleeps == []                       # no retry
    assert obs.get("otlp", "traces", "send_failed") == 3


def _raise_perm(b):
    raise PermanentError("invalid argument")


def test_throttle_overrides_backoff():
    calls = []

    def push(b):
        calls.append(1)
        if len(calls) == 1:
            raise ThrottleError("slow down", retry_after_s=12.5)
    s, sleeps, _ = _sender(push)
    s.send([1])
    assert sleeps == [12.5]                   # server hint, not 1.0


def test_max_elapsed_gives_up():
    s, sleeps, obs = _sender(_raise_transient, max_elapsed_s=0.0)
    with pytest.raises(TransientError, match="max elapsed"):
        s.send([1])
    assert obs.get("otlp", "traces", "send_failed") == 1


def _raise_transient(b):
    raise TransientError("unavailable")


def test_attempt_timeout_is_transient():
    calls = []

    def push(b):
        calls.append(1)
        if len(calls) == 1:
            time.sleep(2.0)                   # exceeds attempt budget
    s, sleeps, _ = _sender(push, attempt_timeout_s=0.2)
    s.send([1])
    assert len(calls) == 2 and len(sleeps) == 1


def test_partial_success_counts_rejected_not_retried():
    calls = []

    def push(b):
        calls.append(1)
        return PartialSuccess(rejected=2, message="2 spans rejected")
    s, sleeps, obs = _sender(push)
    res = s.send([1, 2, 3, 4, 5])
    assert res.rejected == 2 and len(calls) == 1
    assert obs.get("otlp", "traces", "sent") == 3
    assert obs.get("otlp", "traces", "send_failed") == 2


def test_retry_disabled_fails_fast():
    s, sleeps, _ = _sender(_raise_transient, enabled=False)
    with pytest.raises(TransientError):
        s.send([1])
    assert sleeps == []


def test_obsreport_dataframe_surface(spark):
    obs = ObsReport()
    obs.record("otlp/in", "traces", "accepted", 10)
    obs.record("otlp/in", "traces", "refused", 2)
    obs.record("batch", "traces", "dropped", 1)
    df = obs.as_dataframe(spark)
    got = {(r.component, r.metric): r.value for r in df.collect()}
    assert got[("otlp/in", "accepted")] == 10
    assert got[("otlp/in", "refused")] == 2
    with pytest.raises(ValueError):
        obs.record("x", "traces", "nope")


def test_instrumented_sink_streaming_counts(spark, tmp_path):
    """Streaming foreachBatch sink records sent per micro-batch; a failing
    push records send_failed (obsreport exporter boundaries)."""
    from otel_arrow_collector_spark.exporters.obsreport import (
        ObsReport, instrumented_sink)
    from otel_arrow_collector_spark.sources import load_table
    from tests.conftest import SF_SMALL
    import shutil, tempfile
    d = tempfile.mkdtemp(prefix="obs_stream_")
    try:
        events = load_table(spark, SF_SMALL, "events") \
            .select("event_id", "user_id")
        events.repartition(2).write.mode("overwrite").parquet(d)
        obs = ObsReport()
        stream = (spark.readStream.schema("event_id bigint, user_id bigint")
                  .option("maxFilesPerTrigger", 1).parquet(d))
        q = (stream.writeStream
             .foreachBatch(instrumented_sink(obs, "exp0", "events",
                                             lambda df, bid: None))
             .option("checkpointLocation", str(tmp_path / "obs_ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert obs.get("exp0", "events", "sent") == events.count()
        assert obs.get("exp0", "events", "send_failed") == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_instrumented_ingest_refusal_counts(spark):
    from otel_arrow_collector_spark.exporters.obsreport import (
        ObsReport, instrumented_ingest)
    from otel_arrow_collector_spark.sources import load_table
    from tests.conftest import SF_SMALL
    obs = ObsReport()
    events = load_table(spark, SF_SMALL, "events").limit(10)

    ok = instrumented_ingest(obs, "recv0", "events", lambda df: df)
    assert ok(events).count() == 10
    assert obs.get("recv0", "events", "accepted") == 10

    def refuse(df):
        raise RuntimeError("over limit")
    bad = instrumented_ingest(obs, "recv0", "events", refuse)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        bad(events)
    assert obs.get("recv0", "events", "refused") == 10


def test_timeout_cancels_cooperative_push_no_duplicate():
    """A push that honors the CancelToken aborts its delivery after the
    attempt times out — no duplicate of the batch reaches the wire
    (timeoutSender context-cancel semantics, common.go:183-198)."""
    delivered, attempts = [], []

    def push(b, token):
        attempts.append(1)
        if len(attempts) == 1:
            time.sleep(0.5)                  # exceeds attempt budget
            token.raise_if_cancelled()       # cooperative abort point
        delivered.append(b)

    s, sleeps, _ = _sender(push, attempt_timeout_s=0.1)
    with s:
        s.send([1])
    time.sleep(0.6)                          # let the zombie finish
    assert len(attempts) == 2
    assert len(delivered) == 1               # zombie aborted; one delivery


def test_hung_push_does_not_queue_later_attempts():
    """A token-ignoring hung attempt must not serialize retries behind it:
    each attempt gets its own worker, so timeouts measure push time."""
    attempts = []

    def push(b):                             # ignores the token entirely
        attempts.append(1)
        if len(attempts) < 3:
            time.sleep(2.0)                  # hang past several timeouts

    s, sleeps, _ = _sender(push, attempt_timeout_s=0.1)
    t0 = time.monotonic()
    s.send([1])
    # 3 attempts x 0.1s timeout + instant sleeps; well under one hang
    assert time.monotonic() - t0 < 1.5
    assert len(attempts) == 3
    s.close()
