"""OTLP protobuf wire codec tests (ptrace/pb.go, plog/pb.go, pmetric/pb.go
marshal surface): roundtrips through real proto3 wire bytes, wire-level
golden checks, and cross-codec (pb vs JSON) agreement."""

from __future__ import annotations

import pytest

from otel_arrow_collector_spark.model import (generate_logs,
                                              generate_metrics,
                                              generate_traces)
from otel_arrow_collector_spark.sources.otlp_pb import (_dec_varint,
                                                        _enc_varint,
                                                        _unzigzag, _zigzag,
                                                        decode_request,
                                                        encode_request,
                                                        read_otlp_pb,
                                                        write_otlp_pb)
from tests.test_codecs import _canon


def test_varint_roundtrip_edges():
    for n in (0, 1, 127, 128, 300, (1 << 32) - 1, (1 << 63) - 1, -1, -5):
        enc = _enc_varint(n)
        dec, pos = _dec_varint(enc, 0)
        assert pos == len(enc)
        expect = n if n >= 0 else n + (1 << 64)
        assert dec == expect


def test_zigzag_roundtrip():
    for n in (0, -1, 1, -2, 2, -(1 << 30), 1 << 30):
        assert _unzigzag(_zigzag(n)) == n


def test_span_wire_golden():
    """Hand-check a minimal span against the proto3 wire format: field 5
    (name) tag 0x2A, field 6 (kind) tag 0x30, fixed64 timestamps."""
    row = dict(trace_id="00000000000000000000000000000001",
               span_id="0000000000000002", name="op", kind=2,
               start_time_unix_nano=1, end_time_unix_nano=2,
               resource_attributes={}, scope_name="", scope_version="")
    payload = encode_request([row], "traces")
    assert b"\x2a\x02op" in payload          # name field
    assert b"\x30\x02" in payload            # kind varint
    back = decode_request(payload, "traces")
    assert back[0]["name"] == "op" and back[0]["kind"] == 2
    assert back[0]["start_time_unix_nano"] == 1
    assert back[0]["trace_id"].endswith("01")


@pytest.mark.parametrize("gen,signal,n", [
    (generate_traces, "traces", 8),
    (generate_logs, "logs", 8),
    (generate_metrics, "metrics", 7),
])
def test_pb_file_roundtrip(spark, tmp_path, gen, signal, n):
    """df -> pb files -> df is canonical-identical for all three signals
    (the pb twin of the OTLP/JSON roundtrip tests)."""
    df = gen(spark, n)
    p = str(tmp_path / f"{signal}_pb")
    nfiles = write_otlp_pb(df, p, signal)
    assert nfiles >= 1
    back = read_otlp_pb(spark, p, signal)
    assert back.schema.simpleString() == df.schema.simpleString()
    assert _canon(back, []) == _canon(df, [])


def test_pb_agrees_with_json_codec(spark, tmp_path):
    """The pb decode of what pb encode produced equals the JSON decode of
    what JSON encode produced — one row model, two wire formats."""
    from otel_arrow_collector_spark.sources.otlp_json import (
        read_otlp_json, write_otlp_json)
    td = generate_traces(spark, 4)
    pj = str(tmp_path / "tr_json")
    pp = str(tmp_path / "tr_pb")
    write_otlp_json(td, pj, "traces")
    write_otlp_pb(td, pp, "traces")
    via_json = read_otlp_json(spark, pj, "traces")
    via_pb = read_otlp_pb(spark, pp, "traces")
    assert _canon(via_pb, []) == _canon(via_json, [])


def test_pb_unknown_signal_raises(spark, tmp_path):
    df = generate_logs(spark, 1)
    with pytest.raises(NotImplementedError, match="profiles"):
        write_otlp_pb(df, str(tmp_path / "x"), "profiles")
