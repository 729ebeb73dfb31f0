"""Round-4 ADVICE regression tests: gzip-bomb streaming cap, histogram
bucket upper-inclusivity, Retry-After HTTP-date parsing, late-point state
protection, bucket-length validation."""

from __future__ import annotations

import gzip
import zlib

import pandas as pd
import pytest

from otel_arrow_collector_spark.exporters.http_exporter import \
    _parse_retry_after
from otel_arrow_collector_spark.sources.http_receiver import _gunzip_capped


class _FakeState:
    """Minimal GroupState stand-in for driving the stateful kernels
    directly (the full-stream twins live in test_streaming_temporality)."""

    hasTimedOut = False

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None


# ---------------------------------------------------------------- gzip cap

def test_gunzip_capped_roundtrip():
    raw = b"hello world" * 100
    assert _gunzip_capped(gzip.compress(raw), cap=10_000) == raw


def test_gunzip_capped_rejects_bomb_incrementally():
    # 50 MB of zeros compresses to ~50 KB; with a 1 KB cap the reject must
    # fire after at most one chunk (1 MB), never after materializing 50 MB
    bomb = gzip.compress(b"\0" * (50 << 20))
    with pytest.raises(ValueError, match="exceeds limit"):
        _gunzip_capped(bomb, cap=1024)


def test_gunzip_capped_rejects_truncated():
    data = gzip.compress(b"x" * 5000)
    with pytest.raises(ValueError, match="truncated"):
        _gunzip_capped(data[: len(data) // 2], cap=1 << 20)


def test_gunzip_capped_accepts_zlib_framing():
    # wbits=47 auto-detects zlib vs gzip, matching lenient stdlib clients
    raw = b"abc" * 50
    assert _gunzip_capped(zlib.compress(raw), cap=1000) == raw


# ------------------------------------------------------------- Retry-After

def test_parse_retry_after_delta_seconds():
    assert _parse_retry_after("2") == 2.0
    assert _parse_retry_after("0.5") == 0.5
    assert _parse_retry_after("-3") == 0.0       # clamped, not negative


def test_parse_retry_after_http_date():
    # a date far in the future -> large positive delay
    d = _parse_retry_after("Wed, 01 Jan 2120 00:00:00 GMT")
    assert d is not None and d > 3600
    # a past date -> 0 (retry immediately), not negative
    assert _parse_retry_after("Mon, 01 Jan 2001 00:00:00 GMT") == 0.0


def test_parse_retry_after_garbage_is_none():
    assert _parse_retry_after("soon") is None
    assert _parse_retry_after("") is None


# ---------------------------------------------- late points don't regress

def test_rate_kernel_late_point_leaves_state_untouched():
    from otel_arrow_collector_spark.streaming.temporality import _rate

    def batch(*rows):
        return iter([pd.DataFrame(
            rows, columns=["time_unix_nano", "value_int", "value_double"])])

    key = ("m", "|fp")
    st = _FakeState()
    list(_rate(key, batch((1_000_000_000, 10, None),
                          (2_000_000_000, 20, None)), st))
    assert st.get == (2_000_000_000, 20.0)

    # a late duplicate (ts <= last_ts) must yield NULL and NOT overwrite
    out = list(_rate(key, batch((1_500_000_000, 5, None)), st))
    assert st.get == (2_000_000_000, 20.0)       # state untouched
    assert out and out[0]["rate_per_s"].isna().all()

    # the next in-order point rates against the REAL previous point
    out = list(_rate(key, batch((3_000_000_000, 30, None)), st))
    assert out[0]["rate_per_s"].iloc[0] == pytest.approx(10.0)


def test_merge_hist_kernel_rejects_malformed_bucket_length():
    from otel_arrow_collector_spark.streaming.temporality import _merge_hist

    def batch(*rows):
        return iter([pd.DataFrame(rows, columns=[
            "time_unix_nano", "count", "sum",
            "explicit_bounds", "bucket_counts"])])

    key = ("m", "|fp")
    st = _FakeState()
    list(_merge_hist(key, batch((1, 2, 3.0, [10.0], [1, 1])), st))
    with pytest.raises(ValueError, match="bucket_counts length"):
        list(_merge_hist(key, batch((2, 1, 1.0, [10.0], [1, 1, 1])), st))


# ------------------------------------- histogram bucket upper-inclusivity

def test_span_red_metrics_upper_inclusive_buckets(spark):
    """OTLP explicit-bounds buckets are (a, b] (metrics.pb.go:1081-1091);
    a duration exactly on a bound lands in the LOWER bucket."""
    from otel_arrow_collector_spark.operators.spans import span_red_metrics
    ms = 1_000_000   # ns per ms
    rows = [("s", 0, 0, 10 * ms),        # dur = bound[1] exactly
            ("s", 0, 0, 5 * ms),         # dur = bound[0] exactly
            ("s", 0, 0, 11 * ms)]        # above last bound
    df = spark.createDataFrame(
        rows, "name string, status_code int, "
              "start_time_unix_nano long, end_time_unix_nano long")
    out = span_red_metrics(df, bounds_ms=[5.0, 10.0]).collect()
    assert len(out) == 1
    assert list(out[0]["bucket_counts"]) == [1, 1, 1]
