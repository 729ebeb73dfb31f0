"""OTTL-lite map-column ops vs the reference's pcommon.Map semantics
(pdata/pcommon/map.go: Get/Put upsert last-write-wins, Remove, RemoveIf)."""

from __future__ import annotations

from pyspark.sql import functions as F

from otel_arrow_collector_spark.functions import (keep_keys, map_delete,
                                                  map_put, truncate_all)


def _attrs_df(spark):
    return spark.createDataFrame(
        [(1, {"a": "1", "http.target": "/x", "drop.me": "y"})],
        "id int, attrs map<string,string>")


def test_map_put_upserts_last_write_wins(spark):
    df = _attrs_df(spark).select(
        map_put(F.col("attrs"), "a", F.lit("2")).alias("attrs"))
    m = df.first().attrs
    assert m["a"] == "2" and m["http.target"] == "/x"


def test_map_put_inserts_new_key(spark):
    m = _attrs_df(spark).select(
        map_put(F.col("attrs"), "new", F.lit("v")).alias("a")).first().a
    assert m["new"] == "v" and len(m) == 4


def test_map_delete(spark):
    m = _attrs_df(spark).select(
        map_delete(F.col("attrs"), "drop.me", "missing").alias("a")).first().a
    assert set(m) == {"a", "http.target"}


def test_keep_keys(spark):
    m = _attrs_df(spark).select(
        keep_keys(F.col("attrs"), "http.target").alias("a")).first().a
    assert set(m) == {"http.target"}


def test_truncate_all(spark):
    m = _attrs_df(spark).select(
        truncate_all(F.col("attrs"), 1).alias("a")).first().a
    assert m == {"a": "1", "http.target": "/", "drop.me": "y"}
