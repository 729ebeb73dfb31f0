"""Salting operators: result-equivalence with the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from otel_arrow_collector_spark.operators.skew import (salted_distinct_count,
                                                       salted_join)
from otel_arrow_collector_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_SMALL, "orders") \
        .select(F.col("o_custkey").alias("k"), "o_orderkey", "o_totalprice")
    c = load_table(spark, SF_SMALL, "customer") \
        .select(F.col("c_custkey").alias("k"), "c_mktsegment")
    want = o.join(c, "k").agg(
        F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2)).first()
    got = salted_join(o, c, "k", salt_from="o_orderkey", n_salts=8).agg(
        F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2)).first()
    assert tuple(got) == tuple(want)


def test_salted_left_join_keeps_unmatched(spark):
    c = load_table(spark, SF_SMALL, "customer") \
        .select(F.col("c_custkey").alias("k"))
    o = load_table(spark, SF_SMALL, "orders") \
        .select(F.col("o_custkey").alias("k"), "o_orderkey")
    want = c.join(o, "k", "left").count()
    got = salted_join(c, o.dropDuplicates(["k"]), "k",
                      salt_from="k", n_salts=4, how="left").count()
    # left join vs deduped right: every customer appears exactly once
    assert got == c.count() and want >= got


def test_salted_distinct_count_exact(spark):
    e = load_table(spark, SF_SMALL, "events")
    want = {r.event_type: r.n for r in
            e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    got = {r.event_type: r.n_distinct for r in
           salted_distinct_count(e, "event_type", "user_id", 8).collect()}
    assert got == want
