"""HPACK conformance — RFC 7541 Appendix C vectors, round-trip laws, and
the Arrow-transport header path (arrow.go:85-131 headerReceiver parity)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from otel_arrow_collector_spark.sources.hpack import (
    HpackDecoder, HpackEncoder, HpackError, huffman_decode, huffman_encode)


def _hx(s: str) -> bytes:
    return bytes.fromhex(s.replace(" ", ""))


# --- RFC 7541 C.4: request sequence, Huffman-coded, one stateful codec ----

C4 = [
    ("8286 8441 8cf1 e3c2 e5f2 3a6b a0ab 90f4 ff",
     [(":method", "GET"), (":scheme", "http"), (":path", "/"),
      (":authority", "www.example.com")]),
    ("8286 84be 5886 a8eb 1064 9cbf",
     [(":method", "GET"), (":scheme", "http"), (":path", "/"),
      (":authority", "www.example.com"), ("cache-control", "no-cache")]),
    ("8287 85bf 4088 25a8 49e9 5ba9 7d7f 8925 a849 e95b b8e8 b4bf",
     [(":method", "GET"), (":scheme", "https"), (":path", "/index.html"),
      (":authority", "www.example.com"), ("custom-key", "custom-value")]),
]

# --- RFC 7541 C.3: same requests without Huffman coding --------------------

C3 = [
    ("8286 8441 0f77 7777 2e65 7861 6d70 6c65 2e63 6f6d", C4[0][1]),
    ("8286 84be 5808 6e6f 2d63 6163 6865", C4[1][1]),
    ("8287 85bf 400a 6375 7374 6f6d 2d6b 6579 0c63 7573 746f 6d2d 7661 "
     "6c75 65", C4[2][1]),
]


def test_rfc_c4_decode_sequence():
    dec = HpackDecoder()
    for wire, want in C4:
        assert dec.decode(_hx(wire)) == want
    # dynamic table after 3 requests: C.4.3's documented state, 164 bytes
    assert dec.table.entries == [("custom-key", "custom-value"),
                                 ("cache-control", "no-cache"),
                                 (":authority", "www.example.com")]
    assert dec.table.size == 164


def test_rfc_c4_encode_sequence_exact_bytes():
    enc = HpackEncoder()
    for wire, want in C4:
        assert enc.encode(want).hex() == _hx(wire).hex()


def test_rfc_c3_decode_sequence_no_huffman():
    dec = HpackDecoder()
    for wire, want in C3:
        assert dec.decode(_hx(wire)) == want
    assert dec.table.size == 164


def test_rfc_c6_response_with_size_256_and_eviction():
    # C.6.1: first response, dynamic table capped at 256
    dec = HpackDecoder(max_dynamic_size=256)
    wire = _hx("4882 6402 5885 aec3 771a 4b61 96d0 7abe 9410 54d4 44a8 "
               "2005 9504 0b81 66e0 82a6 2d1b ff6e 919d 29ad 1718 63c7 "
               "8f0b 97c8 e9ae 82ae 43d3")
    assert dec.decode(wire) == [
        (":status", "302"), ("cache-control", "private"),
        ("date", "Mon, 21 Oct 2013 20:13:21 GMT"),
        ("location", "https://www.example.com")]
    assert dec.table.size == 222
    # C.6.2: ":status: 307" evicts the oldest entry (":status: 302")
    assert dec.decode(_hx("4883 640e ffc1 c0bf")) == [
        (":status", "307"), ("cache-control", "private"),
        ("date", "Mon, 21 Oct 2013 20:13:21 GMT"),
        ("location", "https://www.example.com")]
    assert dec.table.entries[0] == (":status", "307")
    assert (":status", "302") not in dec.table.entries


def test_huffman_known_vectors():
    assert huffman_encode(b"www.example.com").hex() == "f1e3c2e5f23a6ba0ab90f4ff"
    assert huffman_encode(b"no-cache").hex() == "a8eb10649cbf"
    assert huffman_encode(b"302").hex() == "6402"
    assert huffman_encode(b"private").hex() == "aec3771a4b"
    assert huffman_decode(_hx("25a8 49e9 5ba9 7d7f")) == b"custom-key"


def test_huffman_bad_padding_rejected():
    import pytest
    # a full byte of padding (0xff after a complete symbol) is illegal
    good = huffman_encode(b"a")
    with pytest.raises(HpackError):
        huffman_decode(good + b"\xff")


def test_table_size_update_instruction():
    dec = HpackDecoder()
    dec.decode(_hx("8441 0f77 7777 2e65 7861 6d70 6c65 2e63 6f6d"))
    assert dec.table.size == 57
    assert dec.decode(b"\x20") == []          # resize to 0 -> evict all
    assert dec.table.size == 0 and dec.table.entries == []


@settings(deadline=None, max_examples=60)
@given(st.lists(st.tuples(
    st.text(st.characters(min_codepoint=0x21, max_codepoint=0x7e),
            min_size=1, max_size=24).map(str.lower),
    st.text(min_size=0, max_size=48)), min_size=0, max_size=8))
def test_roundtrip_property(headers):
    enc, dec = HpackEncoder(), HpackDecoder()
    for _ in range(2):     # twice: second pass exercises the dynamic table
        assert dec.decode(enc.encode(headers)) == headers


@settings(deadline=None, max_examples=40)
@given(st.binary(min_size=0, max_size=200))
def test_huffman_roundtrip_property(data):
    assert huffman_decode(huffman_encode(data)) == data


def test_arrow_transport_headers_end_to_end(spark):
    from otel_arrow_collector_spark.sources.arrow_ipc import (
        encode_ipc, frame_headers)
    df = spark.range(0, 400, 1, 2).selectExpr(
        "id", "cast(id % 7 as string) AS k")
    meta = {"authorization": "Bearer tok", "otel-grpc-stream": "s1"}
    enc = encode_ipc(df, headers=meta)
    rows = frame_headers(enc).collect()
    assert rows and all(r.headers == meta for r in rows)
    # later frames in a partition must use the compact indexed form:
    # every header block decodes, and repeated blocks shrink
    blocks = [r.headers for r in enc.select("headers").collect()]
    sizes = sorted(len(b) for b in blocks)
    assert sizes[0] <= sizes[-1]
