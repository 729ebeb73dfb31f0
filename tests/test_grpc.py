"""Live OTLP/gRPC pair: stdlib HTTP/2 + RFC 7541 HPACK + gRPC framing,
real sockets end to end (receiver/otlpreceiver/otlp.go:93-110 service
registration; exporter/otlpexporter/otlp.go:121-176 status mapping).

The reference runs on grpc-go; this container has no grpcio, so BOTH
halves here are the repo's own wire implementation — the tests prove
protocol-level self-consistency plus spec-pinned constants (service
paths, status codes, length-prefixed message layout)."""

from __future__ import annotations

import struct

import pytest

from otel_arrow_collector_spark.exporters.grpc_exporter import (
    _PATHS, GrpcCallError, export_grpc_now, grpc_call)
from otel_arrow_collector_spark.exporters.retry import RetryConfig
from otel_arrow_collector_spark.model import generate_traces
from otel_arrow_collector_spark.sources import h2
from otel_arrow_collector_spark.sources.grpc_receiver import OtlpGrpcReceiver
from otel_arrow_collector_spark.sources.otlp_pb import (decode_request,
                                                        encode_request)

_FAST = RetryConfig(initial_interval_s=0.05, max_elapsed_s=0.3)


@pytest.fixture()
def rcv(tmp_path):
    r = OtlpGrpcReceiver(str(tmp_path / "spool"))
    r.start()
    yield r
    r.stop()


def _pb_body(spark, n=4):
    df = generate_traces(spark, n)
    rows = [r.asDict(recursive=True) for r in df.collect()]
    return encode_request(rows, "traces"), n


# ------------------------------------------------------------- wire level

def test_grpc_unary_roundtrip_and_spool(spark, rcv):
    body, n = _pb_body(spark, 4)
    resp = grpc_call(rcv.host, rcv._port, _PATHS["traces"], body)
    assert resp == b""                     # empty ExportTraceServiceResponse
    assert rcv.counters["accepted_traces"] == 1
    assert rcv.read_spool(spark, "traces").count() == n


def test_grpc_gzip_message(spark, rcv):
    body, n = _pb_body(spark, 3)
    grpc_call(rcv.host, rcv._port, _PATHS["traces"], body, compress=True)
    assert rcv.read_spool(spark, "traces").count() == n


def test_grpc_unknown_method_unimplemented(rcv):
    with pytest.raises(GrpcCallError) as ei:
        grpc_call(rcv.host, rcv._port, "/foo.Bar/Baz", b"")
    assert ei.value.status == 12           # UNIMPLEMENTED


def test_grpc_bad_payload_invalid_argument(rcv):
    with pytest.raises(GrpcCallError) as ei:
        grpc_call(rcv.host, rcv._port, _PATHS["traces"],
                  b"\xff\xff\xff not protobuf")
    assert ei.value.status == 3            # INVALID_ARGUMENT
    assert rcv.counters.get("refused_bad_payload_traces") == 1


def test_grpc_auth(spark, tmp_path):
    r = OtlpGrpcReceiver(str(tmp_path / "auth_spool"), token="sekrit")
    r.start()
    try:
        body, _ = _pb_body(spark, 1)
        with pytest.raises(GrpcCallError) as ei:
            grpc_call(r.host, r._port, _PATHS["traces"], body)
        assert ei.value.status == 16       # UNAUTHENTICATED
        grpc_call(r.host, r._port, _PATHS["traces"], body, token="sekrit")
        assert r.counters["accepted_traces"] == 1
    finally:
        r.stop()


def test_grpc_backpressure_resource_exhausted_with_pushback(spark, tmp_path):
    r = OtlpGrpcReceiver(str(tmp_path / "bp_spool"), max_pending_files=1,
                         retry_pushback_ms=250)
    r.start()
    try:
        body, _ = _pb_body(spark, 1)
        grpc_call(r.host, r._port, _PATHS["traces"], body)   # fills spool
        with pytest.raises(GrpcCallError) as ei:
            grpc_call(r.host, r._port, _PATHS["traces"], body)
        assert ei.value.status == 8        # RESOURCE_EXHAUSTED
        assert ei.value.pushback_ms == 250 # the throttle hint
        assert r.counters["refused_backpressure_traces"] == 1
    finally:
        r.stop()


def test_grpc_large_body_spans_multiple_data_frames(spark, rcv):
    """A body > SETTINGS_MAX_FRAME_SIZE must arrive intact (DATA
    fragmentation + reassembly + WINDOW_UPDATE replenishment)."""
    df = generate_traces(spark, 600)       # ~hundreds of KB encoded
    rows = [r.asDict(recursive=True) for r in df.collect()]
    body = encode_request(rows, "traces")
    assert len(body) > h2.DEFAULT_MAX_FRAME
    grpc_call(rcv.host, rcv._port, _PATHS["traces"], body)
    assert rcv.read_spool(spark, "traces").count() == 600


def test_grpc_all_three_signals(spark, rcv):
    from otel_arrow_collector_spark.model import (generate_logs,
                                                  generate_metrics)
    for signal, gen, n in (("logs", generate_logs, 5),
                           ("metrics", generate_metrics, 6)):
        df = gen(spark, n)               # metrics expand to datapoint rows
        rows = [r.asDict(recursive=True) for r in df.collect()]
        grpc_call(rcv.host, rcv._port, _PATHS[signal],
                  encode_request(rows, signal))
        assert rcv.read_spool(spark, signal).count() == len(rows)


# ------------------------------------------------------- Spark export stage

def test_grpc_exporter_mapinarrow_roundtrip(spark, rcv):
    df = generate_traces(spark, 8)
    res = export_grpc_now(df.coalesce(2), rcv.endpoint, "traces")
    assert res["rows_sent"] == 8 and res["n_tasks"] == 2
    assert rcv.read_spool(spark, "traces").count() == 8


def test_grpc_exporter_throttle_then_success(spark, tmp_path):
    """RESOURCE_EXHAUSTED + pushback -> ThrottleError -> retry succeeds
    once the spool drains (the exporterhelper throttle path)."""
    import os
    import shutil
    r = OtlpGrpcReceiver(str(tmp_path / "thr_spool"), max_pending_files=1,
                         retry_pushback_ms=100)
    r.start()
    try:
        body, _ = _pb_body(spark, 1)
        grpc_call(r.host, r._port, _PATHS["traces"], body)   # fill
        pb_dir = os.path.join(r.spool_dir, "traces_pb")

        # drain the spool shortly after, from a helper thread
        import threading

        def drain():
            # wait until the exporter has actually been throttled once,
            # then free the spool — deterministic, no sleep race
            import time
            t0 = time.time()
            while time.time() - t0 < 30:
                if r.counters.get("refused_backpressure_traces", 0) >= 1:
                    for f in os.listdir(pb_dir):
                        os.unlink(os.path.join(pb_dir, f))
                    return
                time.sleep(0.05)
        threading.Thread(target=drain, daemon=True).start()

        df = generate_traces(spark, 2)
        res = export_grpc_now(
            df.coalesce(1), r.endpoint, "traces",
            retry_config=RetryConfig(initial_interval_s=0.2,
                                     max_elapsed_s=10.0))
        assert res["rows_sent"] == 2
        assert res["n_attempts"] >= 2      # at least one throttled retry
    finally:
        r.stop()
        shutil.rmtree(str(tmp_path / "thr_spool"), ignore_errors=True)


def test_grpc_exporter_permanent_on_unauth(spark, tmp_path):
    r = OtlpGrpcReceiver(str(tmp_path / "unauth_spool"), token="x")
    r.start()
    try:
        df = generate_traces(spark, 1)
        with pytest.raises(Exception, match="grpc-status 16"):
            export_grpc_now(df.coalesce(1), r.endpoint, "traces",
                            token="wrong", retry_config=_FAST)
        assert r.counters.get("accepted_traces") is None
    finally:
        r.stop()


# ----------------------------------------------------- protocol edge cases

def test_grpc_frame_layout_is_spec_exact():
    """Length-prefixed message: 1-byte compressed flag + 4-byte BE length
    (gRPC-over-HTTP2 spec) — pinned so neither half can drift."""
    f = h2.grpc_frame(b"abc")
    assert f == b"\x00" + struct.pack(">I", 3) + b"abc"
    assert h2.parse_grpc_frames(f) == [(False, b"abc")]
    with pytest.raises(h2.H2Error):
        h2.parse_grpc_frames(f[:-1])       # truncated body is loud


def test_grpc_receiver_rejects_two_messages_on_unary(spark, rcv):
    """Two length-prefixed messages on a unary call -> INVALID_ARGUMENT
    (hand-built DATA body; the client API can't express this)."""
    import socket as _socket
    from otel_arrow_collector_spark.sources.hpack import (HpackDecoder,
                                                          HpackEncoder)
    body, _ = _pb_body(spark, 1)
    double = h2.grpc_frame(body) + h2.grpc_frame(body)
    with _socket.create_connection((rcv.host, rcv._port), timeout=10) as s:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0))
        enc, dec = HpackEncoder(), HpackDecoder()
        s.sendall(h2.pack_frame(
            h2.HEADERS, h2.FLAG_END_HEADERS, 1,
            enc.encode([(":method", "POST"), (":scheme", "http"),
                        (":path", _PATHS["traces"]),
                        (":authority", "t"),
                        ("content-type", "application/grpc"),
                        ("te", "trailers")])))
        for fr in h2.chunk_data_frames(1, double, end_stream=True):
            s.sendall(fr)
        status = None
        while status is None:
            ftype, flags, sid, payload = h2.recv_frame(s)
            if ftype == h2.SETTINGS and not flags & h2.FLAG_ACK:
                s.sendall(h2.pack_frame(h2.SETTINGS, h2.FLAG_ACK, 0))
            elif ftype == h2.HEADERS:
                hdrs = dict(dec.decode(h2.strip_padding(flags, payload)))
                status = hdrs.get("grpc-status", status)
    assert int(status) == 3                # INVALID_ARGUMENT


def test_grpc_pipeline_kinds_end_to_end(spark, tmp_path, rcv):
    """Pipeline compiler round trip: kind:grpc exporter pushes through the
    live server; kind:grpc_spool receiver reads the spool back."""
    from otel_arrow_collector_spark.plans.pipeline import PipelineGraph
    df = generate_traces(spark, 6)
    g = PipelineGraph({
        "receivers": {"mem": {"kind": "memory"}},
        "exporters": {"push": {"kind": "grpc", "endpoint": rcv.endpoint,
                               "signal": "traces",
                               "max_rows_per_request": 2}},
        "pipelines": {"traces": {"receivers": ["mem"],
                                 "exporters": ["push"]}},
    })
    stats = g.compile(spark, sources={"mem": df}).run()["traces/push"]
    assert stats["rows_sent"] == 6 and stats["n_requests"] >= 3
    g2 = PipelineGraph({
        "receivers": {"spool": {"kind": "grpc_spool",
                                "path": rcv.spool_dir,
                                "signal": "traces"}},
        "exporters": {"sink": {"kind": "null"}},
        "pipelines": {"traces": {"receivers": ["spool"],
                                 "exporters": ["sink"]}},
    })
    assert g2.compile(spark).run()["traces/sink"] == 6


# --- OTel-Arrow bidi stream service (arrow.go:251-349) ---------------------

def _ipc_fragments(batches):
    """One logical IPC stream split at batch boundaries (the reference
    producer's per-batch record fragments)."""
    import io

    import pyarrow as pa
    sink = io.BytesIO()
    w = pa.ipc.new_stream(sink, batches[0].schema)
    cuts = []
    for b in batches:
        w.write_batch(b)
        cuts.append(sink.getvalue())
    frags, prev = [], b""
    for c in cuts:
        frags.append(c[len(prev):])
        prev = c
    return frags


def test_arrow_service_codec_roundtrip():
    from otel_arrow_collector_spark.sources.arrow_service import (
        PAYLOAD_LOGS, PAYLOAD_SPANS, STATUS_UNAVAILABLE, decode_batch,
        decode_status, encode_batch, encode_status)
    b = encode_batch(7, [("s1", PAYLOAD_SPANS, b"abc"),
                         ("s2", PAYLOAD_LOGS, b"xy")], b"hdr")
    assert decode_batch(b) == {
        "batch_id": 7,
        "payloads": [("s1", PAYLOAD_SPANS, b"abc"),
                     ("s2", PAYLOAD_LOGS, b"xy")],
        "headers": b"hdr"}
    st = encode_status(9, STATUS_UNAVAILABLE, "spool full")
    assert decode_status(st) == {"batch_id": 9, "status_code": 14,
                                 "status_message": "spool full"}


def test_arrow_stream_end_to_end(spark, rcv):
    """The fork's signature RPC against the live server: cross-fragment
    IPC continuation on one schema id, a second signal on the same
    stream, a bad-framing batch that gets INVALID_ARGUMENT without
    killing the stream, per-batch acks in order, clean half-close."""
    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        ArrowStreamClient
    from otel_arrow_collector_spark.sources.arrow_service import (
        PAYLOAD_METRICS, PAYLOAD_SPANS)
    receiver = rcv
    host, port = receiver.host, receiver._port
    frags = _ipc_fragments([
        pa.record_batch({"trace_id": pa.array(["a", "b"]),
                         "n": pa.array([1, 2])}),
        pa.record_batch({"trace_id": pa.array(["c"]),
                         "n": pa.array([9])})])
    mfrag = _ipc_fragments(
        [pa.record_batch({"v": pa.array([1.5, 2.5])})])[0]
    c = ArrowStreamClient(host, port)
    assert c.send_batch(1, [("s0", PAYLOAD_SPANS, frags[0])]) \
        == {"batch_id": 1, "status_code": 0, "status_message": ""}
    st = c.send_batch(2, [("s0", PAYLOAD_SPANS, b"\xde\xad\xbe\xef")])
    assert st["batch_id"] == 2 and st["status_code"] == 3
    assert c.send_batch(3, [("s0", PAYLOAD_SPANS, frags[1]),
                            ("m0", PAYLOAD_METRICS, mfrag)]) \
        == {"batch_id": 3, "status_code": 0, "status_message": ""}
    assert c.close() == {"grpc-status": "0"}
    got = receiver.read_arrow_spool(spark, "traces")
    assert sorted((r.trace_id, r.n) for r in got.collect()) \
        == [("a", 1), ("b", 2), ("c", 9)]
    m = receiver.read_arrow_spool(spark, "metrics")
    assert sorted(r.v for r in m.collect()) == [1.5, 2.5]
    assert receiver.counters["accepted_arrow_traces"] == 2
    assert receiver.counters["refused_bad_arrow"] == 1


def test_arrow_stream_auth_and_per_batch_headers(tmp_path):
    """Token-guarded stream: wrong bearer ends the stream with
    UNAUTHENTICATED trailers; with the right token, per-batch hpack
    headers decode through the stream's stateful codec."""
    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import (
        ArrowStreamClient, GrpcCallError)
    from otel_arrow_collector_spark.sources.arrow_service import \
        PAYLOAD_SPANS
    from otel_arrow_collector_spark.sources.hpack import HpackEncoder
    r = OtlpGrpcReceiver(str(tmp_path / "spool"), token="s3cr3t")
    host, port = r.start()
    try:
        bad = ArrowStreamClient(host, port, token="wrong")
        frag = _ipc_fragments(
            [pa.record_batch({"trace_id": pa.array(["x"])})])[0]
        with pytest.raises((GrpcCallError, h2.H2Error)):
            bad.send_batch(1, [("s0", PAYLOAD_SPANS, frag)])
        hdrs = HpackEncoder().encode([("tenant", "acme")])
        ok = ArrowStreamClient(host, port, token="s3cr3t")
        st = ok.send_batch(1, [("s0", PAYLOAD_SPANS, frag)], headers=hdrs)
        assert st["status_code"] == 0
        assert ok.close()["grpc-status"] == "0"
    finally:
        r.stop()


def test_arrow_stream_zstd_payloads_and_pipeline_receiver(spark, rcv):
    """zstd-compressed IPC payloads (the reference's Arrow-stream zstd
    negotiation) decode through the stream service unchanged, and the
    spool feeds a `kind: arrow_spool` pipeline receiver."""
    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        ArrowStreamClient
    from otel_arrow_collector_spark.plans.pipeline import PipelineGraph
    from otel_arrow_collector_spark.sources.arrow_service import \
        PAYLOAD_SPANS
    receiver = rcv
    import io
    sink = io.BytesIO()
    b = pa.record_batch({"trace_id": pa.array(["z1", "z2"]),
                         "n": pa.array([5, 6])})
    w = pa.ipc.new_stream(sink, b.schema,
                          options=pa.ipc.IpcWriteOptions(
                              compression="zstd"))
    w.write_batch(b)
    c = ArrowStreamClient(receiver.host, receiver._port)
    assert c.send_batch(1, [("z", PAYLOAD_SPANS,
                             sink.getvalue())])["status_code"] == 0
    c.close()
    spec = {
        "receivers": {"in": {"kind": "arrow_spool",
                             "path": receiver.spool_dir,
                             "signal": "traces"}},
        "processors": {"f": {"kind": "filter", "where": "n > 5"}},
        "exporters": {"out": {"kind": "memory"}},
        "pipelines": {"traces": {"receivers": ["in"],
                                 "processors": ["f"],
                                 "exporters": ["out"]}},
    }
    rows = PipelineGraph(spec).compile(spark).run()["traces/out"]
    assert [(r.trace_id, r.n) for r in rows] == [("z2", 6)]


def test_otap_roundtrip_and_spark_reassembly(spark, rcv):
    """The fork's full data model end-to-end: golden spans -> OTAP
    normalized payload set (SPANS + RESOURCE/SPAN/EVENT/LINK attr
    tables) -> live bidi stream -> per-payload-type parquet spool ->
    SPARK-side reassembly (hash joins + collect_list) == the original
    rows; plus the driver-side decode_spans golden inverse."""
    import io

    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        ArrowStreamClient
    from otel_arrow_collector_spark.sources import otap
    receiver = rcv
    rows = [r.asDict(recursive=True)
            for r in generate_traces(spark, 4).collect()]
    payloads = otap.encode_spans(rows)

    # driver-side golden inverse
    back = otap.decode_spans({pt: t for _s, pt, t in payloads})
    canon = lambda rs: sorted(repr(sorted(r.items())) for r in rs)  # noqa
    assert canon(back) == canon(rows)

    # over the wire: each table as one self-contained IPC stream payload
    def ipc(t):
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        return sink.getvalue()

    c = ArrowStreamClient(receiver.host, receiver._port)
    st = c.send_batch(1, [(sid, pt, ipc(t)) for sid, pt, t in payloads])
    assert st["status_code"] == 0
    c.close()

    tables = receiver.read_arrow_payloads(spark)
    # empty satellite tables (no span attrs in the golden set) spool no
    # file; assemble_spans_df treats absence as empty
    assert otap.SPANS in tables and otap.RESOURCE_ATTRS in tables
    assert otap.SPAN_EVENTS in tables and otap.SPAN_EVENT_ATTRS in tables
    got = otap.assemble_spans_df(spark, tables)
    g = {r.id: r for r in got.collect()}
    assert len(g) == len(rows)
    for i, r in enumerate(rows):
        row = g[i].asDict()
        assert row["name"] == r["name"]
        assert row["trace_id"] == r["trace_id"]
        got_attrs = {k: v.asDict() for k, v in
                     (row.get("attributes") or {}).items()}
        assert got_attrs == (r["attributes"] or {})
        got_res = {k: v.asDict() for k, v in
                   (row.get("resource_attributes") or {}).items()}
        assert got_res == (r["resource_attributes"] or {})
        want_events = r["events"] or []
        got_events = sorted(
            [e.asDict(recursive=True) for e in row.get("events") or []],
            key=lambda e: e["time_unix_nano"])
        assert len(got_events) == len(want_events)
        for ge, we in zip(got_events,
                          sorted(want_events,
                                 key=lambda e: e["time_unix_nano"])):
            assert ge["name"] == we["name"]
            assert (ge["attributes"] or {}) == (we["attributes"] or {})
        # links re-nest too (ADVICE r5: reassembly must not drop them)
        want_links = r["links"] or []
        got_links = [x.asDict(recursive=True)
                     for x in row.get("links") or []]
        assert len(got_links) == len(want_links)
        got_link_attrs = sorted(repr(sorted((x["attributes"] or {}).items()))
                                for x in got_links)
        want_link_attrs = sorted(repr(sorted((x["attributes"] or {}).items()))
                                 for x in want_links)
        assert got_link_attrs == want_link_attrs
        for x in got_links:
            assert x["dropped_attributes_count"] == 4


def test_otap_logs_roundtrip_over_stream(spark, rcv):
    """OTAP logs: tagged body flattened to body_* columns, LOG_ATTRS +
    deduplicated RESOURCE_ATTRS; golden inverse equality, then the set
    rides the live stream into the per-payload-type spool."""
    import io

    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        ArrowStreamClient
    from otel_arrow_collector_spark.model import generate_logs
    from otel_arrow_collector_spark.sources import otap
    receiver = rcv
    rows = [r.asDict(recursive=True)
            for r in generate_logs(spark, 4).collect()]
    payloads = otap.encode_logs(rows)
    back = otap.decode_logs({pt: t for _s, pt, t in payloads})
    canon = lambda rs: sorted(repr(sorted(r.items())) for r in rs)  # noqa
    assert canon(back) == canon(rows)

    def ipc(t):
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        return sink.getvalue()

    c = ArrowStreamClient(receiver.host, receiver._port)
    assert c.send_batch(1, [(s_, pt, ipc(t))
                            for s_, pt, t in payloads])["status_code"] == 0
    c.close()
    tables = receiver.read_arrow_payloads(spark)
    assert otap.LOGS in tables and otap.LOG_ATTRS in tables
    main = tables[otap.LOGS]
    assert main.count() == len(rows)
    assert receiver.counters["accepted_arrow_logs"] == 1


def test_otap_metrics_roundtrip_over_stream(spark, rcv):
    """OTAP metrics: all five point families (number/summary/histogram/
    exp-histogram) as separate datapoint tables with attr + exemplar +
    exemplar-attr satellites, descriptor dedup on the main table;
    golden-inverse equality over the 7-kind fixture cycle, then the
    full payload set rides the live stream."""
    import io
    import json

    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        ArrowStreamClient
    from otel_arrow_collector_spark.model import generate_metrics
    from otel_arrow_collector_spark.sources import otap
    receiver = rcv
    rows = [r.asDict(recursive=True)
            for r in generate_metrics(spark, 7).collect()]
    payloads = otap.encode_metrics(rows)
    ptypes = {pt for _s, pt, _t in payloads}
    assert {otap.UNIVARIATE_METRICS, otap.NUMBER_DATA_POINTS,
            otap.SUMMARY_DATA_POINTS, otap.HISTOGRAM_DATA_POINTS,
            otap.EXP_HISTOGRAM_DATA_POINTS,
            otap.HISTOGRAM_DP_EXEMPLARS} <= ptypes
    back = otap.decode_metrics({pt: t for _s, pt, t in payloads})
    canon = lambda rs: sorted(                                    # noqa
        json.dumps(r, sort_keys=True, default=str) for r in rs)
    assert canon(back) == canon(rows)

    def ipc(t):
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        return sink.getvalue()

    c = ArrowStreamClient(receiver.host, receiver._port)
    assert c.send_batch(1, [(s_, pt, ipc(t))
                            for s_, pt, t in payloads])["status_code"] == 0
    c.close()
    tables = receiver.read_arrow_payloads(spark)
    assert tables[otap.UNIVARIATE_METRICS].count() == 7
    assert tables[otap.NUMBER_DATA_POINTS].count() == 8
    assert receiver.counters["accepted_arrow_metrics"] == 1


def test_arrow_spool_streaming_ingest(spark, rcv, tmp_path):
    """The Arrow-stream spool feeds Structured Streaming: batches acked
    over the bidi stream appear in a checkpointed streaming query."""
    import io

    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        ArrowStreamClient
    from otel_arrow_collector_spark.sources.arrow_service import \
        PAYLOAD_SPANS
    receiver = rcv

    def ship(vals, batch_id):
        sink = io.BytesIO()
        b = pa.record_batch({"trace_id": pa.array(vals),
                             "n": pa.array(list(range(len(vals))))})
        with pa.ipc.new_stream(sink, b.schema) as w:
            w.write_batch(b)
        c = ArrowStreamClient(receiver.host, receiver._port)
        assert c.send_batch(batch_id, [(f"s{batch_id}", PAYLOAD_SPANS,
                                        sink.getvalue())])["status_code"] == 0
        c.close()

    ship(["a", "b"], 1)
    ship(["c"], 2)
    stream = receiver.stream_arrow_spool(spark, "traces")
    q = (stream.groupBy("trace_id").count()
         .writeStream.format("memory").queryName("arrow_stream_ingest")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt_arrow"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.trace_id: r["count"]
           for r in spark.table("arrow_stream_ingest").collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_export_arrow_stream_from_executors(spark, rcv):
    """Executor-side Arrow-stream export: DataFrame partitions ship over
    per-partition bidi streams (schema once + record-batch
    continuations), every batch acked, and the receiver's spool holds
    exactly the exported rows."""
    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        export_arrow_stream
    receiver = rcv
    df = spark.range(0, 100).selectExpr(
        "id AS trace_id_num", "CAST(id % 7 AS LONG) AS n").repartition(4)
    audit = export_arrow_stream(
        df, f"grpc://{receiver.host}:{receiver._port}").collect()
    assert sum(r.rows_sent for r in audit) == 100
    assert all(r.all_acked for r in audit)
    got = receiver.read_arrow_spool(spark, "traces")
    assert got.count() == 100
    assert got.agg({"trace_id_num": "sum"}).first()[0] == sum(range(100))


def test_pipeline_arrow_stream_exporter(spark, rcv):
    """kind: arrow_stream closes the loop inside the DAG compiler:
    table receiver -> filter -> live Arrow-stream push -> spool."""
    from otel_arrow_collector_spark.plans.pipeline import PipelineGraph
    from tests.conftest import SF_SMALL
    receiver = rcv
    spec = {
        "receivers": {"in": {"kind": "table", "table": "events"}},
        "processors": {"f": {"kind": "filter",
                             "where": "event_type = 'error'"}},
        "exporters": {"out": {
            "kind": "arrow_stream",
            "endpoint": f"grpc://{receiver.host}:{receiver._port}"}},
        "pipelines": {"t": {"receivers": ["in"], "processors": ["f"],
                            "exporters": ["out"]}},
    }
    res = PipelineGraph(spec).compile(spark, sf_dir=SF_SMALL).run()["t/out"]
    assert res["all_acked"] and res["rows_sent"] > 0
    got = receiver.read_arrow_spool(spark, "traces")
    assert got.count() == res["rows_sent"]
    assert {r.event_type for r in got.select("event_type").collect()} \
        == {"error"}


def test_arrow_stream_backpressure_unavailable(spark, tmp_path):
    """Spool-full backpressure acks UNAVAILABLE (the transient code the
    reference maps consumer errors to, arrow.go:344) without killing
    the stream."""
    import io

    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        ArrowStreamClient
    from otel_arrow_collector_spark.sources.arrow_service import (
        PAYLOAD_SPANS, STATUS_UNAVAILABLE)
    r = OtlpGrpcReceiver(str(tmp_path / "spool"), max_pending_files=0)
    host, port = r.start()
    try:
        sink = io.BytesIO()
        b = pa.record_batch({"x": pa.array([1])})
        with pa.ipc.new_stream(sink, b.schema) as w:
            w.write_batch(b)
        c = ArrowStreamClient(host, port)
        st = c.send_batch(1, [("s", PAYLOAD_SPANS, sink.getvalue())])
        assert st["status_code"] == STATUS_UNAVAILABLE
        assert "spool full" in st["status_message"]
        # stream is still alive: half-close cleanly
        assert c.close()["grpc-status"] == "0"
        assert r.counters.get("refused_backpressure_traces") == 1
    finally:
        r.stop()


def test_otap_reassembly_plan_joins_on_ids(spark, rcv):
    """assemble_spans_df's physical plan: id-keyed equi-joins only — no
    cartesian/broadcast-nested-loop blowup from the flat-to-nested
    reconstruction."""
    import io

    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        ArrowStreamClient
    from otel_arrow_collector_spark.sources import otap
    receiver = rcv
    rows = [r.asDict(recursive=True)
            for r in generate_traces(spark, 4).collect()]

    def ipc(t):
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        return sink.getvalue()

    c = ArrowStreamClient(receiver.host, receiver._port)
    c.send_batch(1, [(s_, pt, ipc(t))
                     for s_, pt, t in otap.encode_spans(rows)])
    c.close()
    got = otap.assemble_spans_df(
        spark, receiver.read_arrow_payloads(spark))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_full_system_grpc_to_arrow_pipeline(spark, tmp_path):
    """Capstone composition: live unary gRPC ingest -> pb spool ->
    YAML pipeline (OTTL statement transform + filter) -> executor-side
    Arrow-stream egress -> a SECOND live receiver's spool.  Every hop
    is the real wire path; the final spool holds exactly the
    transformed record set."""
    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        export_grpc_now
    from otel_arrow_collector_spark.plans.pipeline import PipelineGraph
    a = OtlpGrpcReceiver(str(tmp_path / "in"))
    b = OtlpGrpcReceiver(str(tmp_path / "out"))
    a.start()
    b.start()
    try:
        src = generate_traces(spark, 6)
        res = export_grpc_now(src, a.endpoint, "traces")
        assert res["rows_sent"] == src.count()
        spec = {
            "receivers": {"in": {"kind": "grpc_spool",
                                 "path": a.spool_dir,
                                 "signal": "traces"}},
            "processors": {
                "xform": {"kind": "transform", "statements": [
                    'set(attributes["pipeline"], "edge")',
                    'drop() where name == "operationB"']},
            },
            "exporters": {"out": {
                "kind": "arrow_stream",
                "endpoint": f"grpc://{b.host}:{b._port}"}},
            "pipelines": {"t": {"receivers": ["in"],
                                "processors": ["xform"],
                                "exporters": ["out"]}},
        }
        sink = PipelineGraph(spec).compile(spark).run()["t/out"]
        assert sink["all_acked"]
        got = b.read_arrow_spool(spark, "traces")
        rows = got.collect()
        assert len(rows) == sink["rows_sent"] > 0
        assert all(r.name == "operationA" for r in rows)
        assert all(r.attributes["pipeline"].s == "edge" for r in rows)
    finally:
        a.stop()
        b.stop()


def test_arrow_per_signal_service_paths(spark, rcv):
    """All four Arrow services answer: the mixed ArrowStream plus the
    per-signal ArrowTraces/ArrowLogs/ArrowMetrics variants route to the
    same stream loop (arrow.go:251-263)."""
    import io

    import pyarrow as pa

    from otel_arrow_collector_spark.exporters.grpc_exporter import \
        ArrowStreamClient
    from otel_arrow_collector_spark.sources.arrow_service import (
        PAYLOAD_LOGS, PAYLOAD_METRICS, PAYLOAD_SPANS)
    receiver = rcv
    base = "/opentelemetry.proto.experimental.arrow.v1"
    for path, ptype in [
            (f"{base}.ArrowTracesService/ArrowTraces", PAYLOAD_SPANS),
            (f"{base}.ArrowLogsService/ArrowLogs", PAYLOAD_LOGS),
            (f"{base}.ArrowMetricsService/ArrowMetrics", PAYLOAD_METRICS)]:
        sink = io.BytesIO()
        b = pa.record_batch({"v": pa.array([1, 2])})
        with pa.ipc.new_stream(sink, b.schema) as w:
            w.write_batch(b)
        c = ArrowStreamClient(receiver.host, receiver._port, path=path)
        assert c.send_batch(1, [("s", ptype,
                                 sink.getvalue())])["status_code"] == 0
        assert c.close()["grpc-status"] == "0"
    assert receiver.counters["accepted_arrow_traces"] >= 1
    assert receiver.counters["accepted_arrow_logs"] >= 1
    assert receiver.counters["accepted_arrow_metrics"] >= 1


def test_grpc_zstd_message_and_unknown_coding(spark, rcv):
    """configgrpc's compressor registry beyond gzip (configgrpc.go:
    384-392): zstd round-trips through the live server with the capped
    frame-header decoder; an unknown grpc-encoding on a compressed
    message is INVALID_ARGUMENT, not a crash."""
    body, n = _pb_body(spark, 3)
    grpc_call(rcv.host, rcv._port, _PATHS["traces"], body, compress="zstd")
    assert rcv.read_spool(spark, "traces").count() == n
    # snappy: the reference registry's third coding (framed stream
    # format, CRC32C-verified) round-trips through the live server
    grpc_call(rcv.host, rcv._port, _PATHS["traces"], body,
              compress="snappy")
    assert rcv.read_spool(spark, "traces").count() == 2 * n
    # a corrupted snappy chunk CRC is INVALID_ARGUMENT, not a crash
    from otel_arrow_collector_spark.sources.snappy import frame_compress
    blob = bytearray(frame_compress(body))
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(GrpcCallError) as ei:
        _raw_call_with_encoding(rcv, _PATHS["traces"], bytes(blob),
                                "snappy", client_refuses=False)
    assert ei.value.status == 3          # INVALID_ARGUMENT
    import gzip as _g
    # hand-rolled call claiming an unregistered coding: refused cleanly
    with pytest.raises(GrpcCallError) as ei:
        _raw_call_with_encoding(rcv, _PATHS["traces"],
                                _g.compress(body), "br")
    assert ei.value.status == 3          # INVALID_ARGUMENT
    assert "unsupported" in ei.value.message


def _raw_call_with_encoding(rcv, path, compressed_body, coding,
                            client_refuses=True):
    """grpc_call but with an arbitrary grpc-encoding header (the client
    helper itself refuses unknown codings, which is also pinned here;
    ``client_refuses=False`` for codings the client DOES support when
    the point is sending a hand-corrupted body)."""
    from otel_arrow_collector_spark.exporters.grpc_exporter import grpc_call
    if client_refuses:
        with pytest.raises(ValueError, match="unsupported grpc compression"):
            grpc_call(rcv.host, rcv._port, path, b"", compress=coding)
    # drive the wire directly via a monkeypatched coding: simplest is the
    # low-level frame send mirroring grpc_call with the coding header
    import socket as _socket
    import struct as _struct
    from otel_arrow_collector_spark.sources import h2
    from otel_arrow_collector_spark.sources.hpack import (HpackDecoder,
                                                          HpackEncoder)
    frame = h2.grpc_frame(compressed_body, compressed=True)
    with _socket.create_connection((rcv.host, rcv._port), timeout=10) as s:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0))
        enc, dec = HpackEncoder(), HpackDecoder()
        headers = [(":method", "POST"), (":scheme", "http"),
                   (":path", path),
                   (":authority", f"{rcv.host}:{rcv._port}"),
                   ("content-type", "application/grpc"),
                   ("te", "trailers"), ("grpc-encoding", coding)]
        out = [h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 1,
                             enc.encode(headers))]
        out += h2.chunk_data_frames(1, frame, end_stream=True)
        s.sendall(b"".join(out))
        resp_headers = {}
        frag = bytearray()
        while True:
            ftype, flags, sid, payload = h2.recv_frame(s)
            if ftype == h2.SETTINGS and not flags & h2.FLAG_ACK:
                s.sendall(h2.pack_frame(h2.SETTINGS, h2.FLAG_ACK, 0))
            elif ftype in (h2.HEADERS, h2.CONTINUATION):
                body_ = payload
                if ftype == h2.HEADERS:
                    body_ = h2.strip_padding(flags, payload)
                frag += body_
                if flags & h2.FLAG_END_HEADERS:
                    resp_headers.update(dict(dec.decode(bytes(frag))))
                    frag.clear()
                if flags & h2.FLAG_END_STREAM:
                    break
            elif ftype == h2.DATA:
                if flags & h2.FLAG_END_STREAM:
                    break
    status = int(resp_headers.get("grpc-status", "2"))
    raise GrpcCallError(status, resp_headers.get("grpc-message", ""))
