"""Z-order layout: the multi-dimensional skipping property, proven from
the written files' parquet footer statistics."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from otel_arrow_collector_spark.sources.tables import load_table
from otel_arrow_collector_spark.sources.zorder import (file_envelopes,
                                                       z_value, zorder_write)
from tests.conftest import SF_SMALL


def test_z_value_interleaves_bits(spark):
    """Golden Morton codes: bit i of b1 -> 2i, bit i of b2 -> 2i+1."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 0), (0, 3), (3, 3), (5, 6)],
        "b1 long, b2 long")
    got = [r.z for r in df.select(
        z_value(F.col("b1"), F.col("b2"), bits=4).alias("z")).collect()]
    assert got == [0, 1, 2, 5, 10, 15, 57]   # 5=101,6=110 -> 111001


def _coverage(envs, col, lo, hi):
    """Mean fraction of the global [lo, hi] range each file spans."""
    spans = [(e[col][1] - e[col][0]) / max(hi - lo, 1e-12)
             for e in envs if e[col]]
    return sum(spans) / len(spans)


def test_zorder_files_are_tight_on_both_dims(spark):
    """Z-ordered layout: every file's footer min/max envelope is narrow
    on BOTH clustering columns, while a single-column sort layout leaves
    the other column's envelope at ~full range (unskippable).  This is
    the property a stats-based planner prunes with."""
    ev = load_table(spark, SF_SMALL, "events") \
        .select("event_id", "user_id", "value")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"),
        F.min("value"), F.max("value")).first()
    zdir = tempfile.mkdtemp(prefix="zorder_")
    sdir = tempfile.mkdtemp(prefix="sorted_")
    try:
        zorder_write(ev, zdir, "user_id", "value", n_files=8)
        # contrast layout: range-sorted by value only
        (ev.repartitionByRange(8, "value").sortWithinPartitions("value")
           .write.mode("overwrite").parquet(sdir))
        zenv = file_envelopes(zdir, "user_id", "value")
        senv = file_envelopes(sdir, "user_id", "value")
        assert len(zenv) == 8 and len(senv) == 8
        # z-order: tight on both dimensions
        assert _coverage(zenv, "user_id", lo_u, hi_u) < 0.6
        assert _coverage(zenv, "value", lo_v, hi_v) < 0.6
        # value-sorted: tight on value, but user_id spans ~everything
        assert _coverage(senv, "value", lo_v, hi_v) < 0.3
        assert _coverage(senv, "user_id", lo_u, hi_u) > 0.9
        # row preservation
        got = spark.read.parquet(zdir)
        assert got.count() == ev.count()
        assert got.agg(F.sum("event_id")).first()[0] \
            == ev.agg(F.sum("event_id")).first()[0]
    finally:
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(sdir, ignore_errors=True)
