"""WARC 1.0: exact record framing vectors, multi-record and
multi-gzip-member streams, HTTP body extraction, malformed guards."""

from __future__ import annotations

import zlib

import pytest

from otel_arrow_collector_spark.sources.warc import (build_warc,
                                                     extract_http_body,
                                                     http_response,
                                                     parse_warc)


def _rec(body=b"hello", uri="http://x/", status=200, rid="<urn:uuid:1>"):
    return {"type": "response", "uri": uri, "date":
            "2026-01-01T00:00:00Z", "record_id": rid,
            "payload": http_response(body, status)}


def test_exact_record_bytes():
    data = build_warc([_rec(b"ab")])
    # spec framing: version line, headers, CRLFCRLF, payload, CRLFCRLF
    assert data.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert b"\r\nContent-Length: " in data
    assert data.endswith(b"ab\r\n\r\n")
    payload = parse_warc(data)[0]["payload"]
    assert payload == http_response(b"ab")
    assert data.count(b"WARC/1.0") == 1


def test_multi_record_and_headers():
    data = build_warc([_rec(b"one", rid="<urn:uuid:1>"),
                       _rec(b"two", uri="http://y/", rid="<urn:uuid:2>")])
    recs = parse_warc(data)
    assert len(recs) == 2
    assert recs[0]["headers"]["WARC-Record-ID"] == "<urn:uuid:1>"
    assert recs[1]["headers"]["WARC-Target-URI"] == "http://y/"
    assert extract_http_body(recs[1]["payload"]) == (200, b"two")


def test_gzip_members_common_crawl_layout():
    data = build_warc([_rec(b"alpha"), _rec(b"beta", status=404)],
                      gzip_members=True)
    # two independent gzip members
    assert data.count(b"\x1f\x8b") >= 2
    recs = parse_warc(data)
    assert [extract_http_body(r["payload"]) for r in recs] == [
        (200, b"alpha"), (404, b"beta")]
    # member boundaries are real: decompressing only the first member
    # yields exactly one record
    d = zlib.decompressobj(16 + 15)
    first = d.decompress(data)
    assert parse_warc(first)[0]["payload"].endswith(b"alpha")


def test_binary_payload_roundtrip():
    body = bytes(range(256)) * 4
    data = build_warc([_rec(body)], gzip_members=True)
    st, got = extract_http_body(parse_warc(data)[0]["payload"])
    assert st == 200 and got == body


def test_malformed_guards():
    good = build_warc([_rec(b"x")])
    with pytest.raises(ValueError):
        parse_warc(b"NOPE/1.0\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc(good[:-4])                 # missing trailer
    with pytest.raises(ValueError):
        parse_warc(good[:30])                 # unterminated header
    bad = good.replace(b"Content-Length: ", b"Content-Length: x")
    with pytest.raises(ValueError):
        parse_warc(bad)
    gz = build_warc([_rec(b"x")], gzip_members=True)
    with pytest.raises(ValueError):
        parse_warc(gz[:-5])                   # truncated member
    with pytest.raises(ValueError):
        extract_http_body(b"not http")
