"""ustar tar: interop with Python's tarfile (third-party pin), block
layout vectors, gzip stream, malformed guards."""

from __future__ import annotations

import io
import tarfile

import pytest

from otel_arrow_collector_spark.sources.archive import tar_pack, tar_unpack


def test_tarfile_reads_our_archives():
    """CPython's tarfile must accept our output byte-for-byte — a real
    third-party interop pin, not a self round-trip."""
    members = [("a.txt", b"hello"), ("dir.name.txt", bytes(range(200)))]
    blob = tar_pack(members)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members
    gz = tar_pack(members, gzip_stream=True)
    with tarfile.open(fileobj=io.BytesIO(gz), mode="r:gz") as tf:
        assert [(m.name, tf.extractfile(m).read())
                for m in tf.getmembers()] == members


def test_we_read_tarfile_archives():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, body in [("x", b"1234"), ("y", b"")]:
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    got = tar_unpack(buf.getvalue())
    assert got == [("x", b"1234"), ("y", b"")]


def test_block_layout():
    blob = tar_pack([("f", b"abc")])
    assert len(blob) % 512 == 0
    assert blob[257:263] == b"ustar\x00" and blob[263:265] == b"00"
    assert blob[124:136].rstrip(b"\x00 ") == b"00000000003"
    assert blob[-1024:] == b"\x00" * 1024          # end blocks
    # payload padded to one block
    assert blob[512:515] == b"abc" and blob[515:1024] == b"\x00" * 509


def test_malformed_guards():
    blob = tar_pack([("f", b"abc")])
    with pytest.raises(ValueError):
        tar_unpack(blob[:500])                     # truncated header
    bad = bytearray(blob)
    bad[0] ^= 0xFF                                 # breaks checksum
    with pytest.raises(ValueError, match="checksum"):
        tar_unpack(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        tar_unpack(b"A" * 1024)
    with pytest.raises(ValueError):
        tar_pack([("x" * 101, b"")])               # name too long
    gz = tar_pack([("f", b"abc")], gzip_stream=True)
    with pytest.raises(ValueError):
        tar_unpack(gz[:-4])


def test_long_path_prefix_field():
    """CPython tarfile splits >100-char paths into the ustar prefix
    field (bytes 345..500); tar_unpack must rejoin prefix + '/' + name
    instead of silently truncating (r6 ADVICE)."""
    long_name = "/".join(["d" * 40] * 3) + "/leaf.txt"   # 131 chars
    assert len(long_name) > 100
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo(long_name)
        info.size = 4
        tf.addfile(info, io.BytesIO(b"body"))
    got = tar_unpack(buf.getvalue())
    assert got == [(long_name, b"body")]


def test_pack_long_path_prefix_split_tarfile_interop():
    """tar_pack splits >100-char paths into prefix+name like CPython's
    tarfile; the archive round-trips through BOTH readers."""
    long_name = "/".join(["d" * 40] * 3) + "/leaf.txt"
    blob = tar_pack([(long_name, b"body")])
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == [(long_name, b"body")]
    assert tar_unpack(blob) == [(long_name, b"body")]
    # a path with no split point that fits still errors loudly
    with pytest.raises(ValueError, match="too long"):
        tar_pack([("x" * 160 + "/" + "y" * 120, b"")])

def test_pack_split_prefers_earlier_slash_when_late_slash_past_155():
    """A slash may sit past byte 155 while an EARLIER slash satisfies
    both the <=155 prefix and <=100 name limits — tar_pack must find it
    (the search window is bounded at the prefix limit, like tarfile)."""
    # slashes at index 150 and 160; total 250 chars: split must use 150
    name = "a" * 150 + "/" + "b" * 9 + "/" + "c" * 89
    assert len(name) == 250
    blob = tar_pack([(name, b"body")])
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == [(name, b"body")]
    assert tar_unpack(blob) == [(name, b"body")]
    # and tarfile itself agrees this path is packable
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo(name)
        info.size = 4
        tf.addfile(info, io.BytesIO(b"body"))
    assert tar_unpack(buf.getvalue()) == [(name, b"body")]
