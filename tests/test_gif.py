"""GIF codec (operators/gif.py): LZW both directions, palette layout,
interlace, guards — plus the Spark decode path consuming GIF payloads."""

import numpy as np
import pytest

from otel_arrow_collector_spark.operators.gif import (decode_gif,
                                                      encode_gif,
                                                      lzw_decode,
                                                      lzw_encode)


def _random_image(rng, w, h, ncol):
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, w * h)
    return pal[idx].reshape(-1).tobytes()


def test_roundtrip_shapes_and_palettes():
    rng = np.random.default_rng(7)
    for w, h, ncol in [(8, 8, 4), (16, 9, 256), (1, 1, 1), (255, 7, 250),
                       (3, 100, 2)]:
        pix = _random_image(rng, w, h, ncol)
        w2, h2, rgb = decode_gif(encode_gif(pix, w, h))
        assert (w2, h2) == (w, h)
        assert rgb == pix


def test_interlaced_roundtrip_matches_progressive():
    rng = np.random.default_rng(11)
    for w, h, ncol in [(13, 21, 7), (16, 16, 256), (2, 3, 2), (8, 8, 64)]:
        pix = _random_image(rng, w, h, ncol)
        plain = encode_gif(pix, w, h)
        inter = encode_gif(pix, w, h, interlace=True)
        assert inter != plain                  # really interlaced
        assert decode_gif(inter) == decode_gif(plain) == (w, h, pix)


def test_lzw_code_width_growth_and_clear():
    """100k symbols forces the table through every width to the 12-bit
    cap and across at least one mid-stream CLEAR reset."""
    data = bytes((i * i // 7) % 17 for i in range(100_000))
    assert lzw_decode(lzw_encode(data, 5), 5) == data
    solid = b"\x03" * 50_000                   # maximal-match path
    assert lzw_decode(lzw_encode(solid, 2), 2) == solid


def test_lzw_kwkwk_case():
    # abababab... hits the code==len(table) (KwKwK) branch immediately
    data = b"\x00\x01" * 500
    assert lzw_decode(lzw_encode(data, 2), 2) == data


def test_palette_overflow_refused():
    cols = np.array([[i // 256, i % 256, 7] for i in range(300)],
                    dtype=np.uint8)
    with pytest.raises(ValueError, match="palette"):
        encode_gif(cols.reshape(-1).tobytes(), 300, 1)


def test_bad_magic_and_truncation_loud():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    rng = np.random.default_rng(3)
    g = encode_gif(_random_image(rng, 8, 8, 16), 8, 8)
    with pytest.raises(ValueError):
        decode_gif(g[:20])                     # cut inside the image data


def test_gif87a_signature_accepted():
    rng = np.random.default_rng(5)
    pix = _random_image(rng, 8, 8, 16)
    g = bytearray(encode_gif(pix, 8, 8))
    g[:6] = b"GIF87a"
    assert decode_gif(bytes(g)) == (8, 8, pix)


def test_spark_decode_and_thumbnail_path(spark):
    """GIF payloads flow through decode_media and resize_images like
    every other image format."""
    from otel_arrow_collector_spark.operators.multimodal import (
        decode_media, resize_images, synthesize_gifs)
    from otel_arrow_collector_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL
    docs = (load_table(spark, SF_SMALL, "documents")
            .orderBy("doc_id").limit(20))
    media = synthesize_gifs(docs)
    feats = decode_media(media).collect()
    assert len(feats) == 20
    assert all(r.format == "image/gif" and r.width == 8 and r.height == 8
               for r in feats)
    thumbs = resize_images(media, width=4, height=4).collect()
    assert all(len(t.thumbnail) == 3 * 4 * 4 for t in thumbs)
