"""Request-body compression encoders shared by the push exporters —
the client half of configcompression (config/configcompression/
compressionType.go): a named coding or bool sugar (True = gzip, the
reference's default).  The capped DECODERS live in http_receiver.py;
this module is the encode direction only.
"""

from __future__ import annotations

import gzip
import zlib

#: what confighttp clients may send (compressor.go registry)
HTTP_CODINGS = frozenset({"gzip", "zstd", "zlib", "deflate"})
#: what configgrpc clients may send (configgrpc.go:384-392; snappy is
#: the receiver's documented cut, so the client refuses it too)
GRPC_CODINGS = frozenset({"gzip", "zstd"})


def encode_body(compress, body: bytes,
                allowed: frozenset) -> tuple[str, bytes]:
    """Compress ``body`` with the requested coding (``True`` means
    gzip); returns (coding, compressed).  Unknown/unallowed codings
    raise ValueError — callers map that onto their permanent-error
    type."""
    coding = "gzip" if compress is True else str(compress).lower()
    if coding not in allowed:
        raise ValueError(f"unsupported compression: {coding}")
    if coding == "gzip":
        return coding, gzip.compress(body)
    if coding == "zstd":
        import pyarrow as pa
        return coding, bytes(pa.Codec("zstd").compress(body))
    return coding, zlib.compress(body)        # zlib / deflate


def encode_response(accept_encoding: str | None, body: bytes,
                    min_size: int = 256) -> tuple[str | None, bytes]:
    """Server-side response compression — the OTHER half of confighttp
    (compressor.go wraps the ResponseWriter when the request advertises
    a supported coding): pick the FIRST supported coding in the
    client's Accept-Encoding list (gzip or zstd; Prometheus scrapers
    send gzip by default), leave small bodies uncompressed.  Returns
    (coding-or-None, payload)."""
    if not accept_encoding or len(body) < min_size:
        return None, body
    for token in accept_encoding.split(","):
        coding = token.split(";", 1)[0].strip().lower()
        if coding == "gzip":
            return "gzip", gzip.compress(body)
        if coding == "zstd":
            import pyarrow as pa
            return "zstd", bytes(pa.Codec("zstd").compress(body))
    return None, body
