"""Storage extension contract (extension/experimental/storage/
storage.go semantics): golang-map behavior, in-place Batch gets,
per-scope isolation, persistence across reopen, nop client."""

from __future__ import annotations

import os

import pytest

from otel_arrow_collector_spark.plans.storage import (
    FileStorageClient, FileStorageExtension, NopStorageClient,
    Operation, delete_op, get_op, set_op)


def test_map_semantics(tmp_path):
    c = FileStorageClient(str(tmp_path / "s.kv"))
    assert c.get("missing") is None          # not-found is not an error
    c.set("k", b"v1")
    c.set("k", b"v2")                        # overwrite, no error
    assert c.get("k") == b"v2"
    c.delete("nope")                         # no-op, no error
    c.delete("k")
    assert c.get("k") is None


def test_batch_in_place_and_validation(tmp_path):
    c = FileStorageClient(str(tmp_path / "b.kv"))
    c.set("a", b"1")
    g1, g2 = get_op("a"), get_op("zz")
    c.batch(set_op("b", b"\x00\xff"), g1, g2, delete_op("a"))
    assert g1.value == b"1"                  # result put in-place
    assert g2.value is None
    assert c.get("a") is None and c.get("b") == b"\x00\xff"
    with pytest.raises(ValueError, match="without a value"):
        c.batch(set_op("x", None))           # type: ignore[arg-type]


def test_persistence_across_reopen(tmp_path):
    p = str(tmp_path / "p.kv")
    c = FileStorageClient(p)
    c.set("bin", bytes(range(256)))
    c.set("empty", b"")
    c.set("uni", "clé".encode("utf-8"))
    del c
    c2 = FileStorageClient(p)
    assert c2.get("bin") == bytes(range(256))
    assert c2.get("empty") == b""
    assert c2.get("uni") == "clé".encode("utf-8")
    with pytest.raises(ValueError, match="not a storage file"):
        bad = str(tmp_path / "bad.kv")
        open(bad, "wb").write(b"garbage")
        FileStorageClient(bad)


def test_extension_scoping(tmp_path):
    ext = FileStorageExtension(str(tmp_path / "store"))
    a = ext.get_client("exporter", "otlp/http", "traces")
    b = ext.get_client("exporter", "otlp/http", "logs")
    c = ext.get_client("receiver", "otlp/http", "traces")
    a.set("k", b"A")
    b.set("k", b"B")
    assert a.get("k") == b"A" and b.get("k") == b"B"
    assert c.get("k") is None                # scopes never collide
    assert ext.get_client("exporter", "otlp/http", "traces") is a
    # one file per WRITTEN scope on disk (empty scopes persist nothing)
    assert len(os.listdir(str(tmp_path / "store"))) == 2
    # reopen the extension: state is still there per scope
    ext2 = FileStorageExtension(str(tmp_path / "store"))
    assert ext2.get_client("exporter", "otlp/http", "logs").get("k") == b"B"


def test_nop_client():
    n = NopStorageClient()
    n.set("k", b"v")
    assert n.get("k") is None
    n.delete("k")
    g = get_op("k")
    n.batch(set_op("k", b"v"), g)
    assert g.value is None


def test_batch_is_one_atomic_flush(tmp_path, monkeypatch):
    """FileStorageClient.batch rewrites the scope file exactly once
    (one storage round-trip, no torn intermediate state)."""
    c = FileStorageClient(str(tmp_path / "a.kv"))
    flushes = []
    orig = FileStorageClient._flush

    def counting(self):
        flushes.append(1)
        orig(self)

    monkeypatch.setattr(FileStorageClient, "_flush", counting)
    c.batch(set_op("a", b"1"), set_op("b", b"2"), delete_op("a"),
            get_op("b"))
    assert len(flushes) == 1
    assert c.get("b") == b"2" and c.get("a") is None
    # a read-only batch flushes nothing
    flushes.clear()
    g = get_op("b")
    c.batch(g)
    assert g.value == b"2" and flushes == []


def test_storage_format_roundtrip_property(tmp_path):
    """Hypothesis-style sweep: random key/value maps (unicode keys,
    arbitrary bytes incl. empties) survive the length-prefixed file
    format across reopen, deterministically."""
    import random
    for seed in (3, 31, 314):
        rng = random.Random(seed)
        data = {}
        for _ in range(rng.randint(1, 40)):
            key = "".join(chr(rng.randint(32, 0x2FF))
                          for _ in range(rng.randint(0, 24)))
            val = bytes(rng.randint(0, 255)
                        for _ in range(rng.randint(0, 200)))
            data[key] = val
        p = str(tmp_path / f"prop-{seed}.kv")
        c = FileStorageClient(p)
        c.batch(*[set_op(k, v) for k, v in data.items()])
        c2 = FileStorageClient(p)
        assert {k: c2.get(k) for k in data} == data

def test_scope_filenames_never_collide_after_sanitizing(tmp_path):
    """_safe() maps '/' and '_' to the same char; the digest suffix
    keeps the scopes 'otlp/http' and 'otlp_http' on distinct files."""
    ext = FileStorageExtension(str(tmp_path / "store"))
    a = ext.get_client("exporter", "otlp/http", "traces")
    b = ext.get_client("exporter", "otlp_http", "traces")
    a.set("k", b"slash")
    b.set("k", b"under")
    # reopen from disk: both survive independently (no last-writer-wins)
    ext2 = FileStorageExtension(str(tmp_path / "store"))
    assert ext2.get_client("exporter", "otlp/http", "traces").get("k") == b"slash"
    assert ext2.get_client("exporter", "otlp_http", "traces").get("k") == b"under"
    assert len(os.listdir(str(tmp_path / "store"))) == 2


def test_bad_batch_applies_nothing(tmp_path):
    """Validation runs before ANY mutation: a bad trailing op leaves
    memory AND disk untouched (no half-applied batch)."""
    p = str(tmp_path / "v.kv")
    c = FileStorageClient(p)
    c.set("keep", b"1")
    with pytest.raises(ValueError, match="without a value"):
        c.batch(set_op("x", b"2"), delete_op("keep"), set_op("y", None))
    with pytest.raises(ValueError, match="unknown op"):
        c.batch(set_op("x", b"2"), Operation("swap", "k"))
    assert c.get("x") is None and c.get("keep") == b"1"
    assert FileStorageClient(p).get("keep") == b"1"   # disk agrees
    # base-class batch path (NopStorageClient) validates too
    with pytest.raises(ValueError, match="unknown op"):
        NopStorageClient().batch(Operation("swap", "k"))
