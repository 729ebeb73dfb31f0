"""Stream-stream interval join must converge to the batch Q18 answer and
must reject unwatermarked inputs (unbounded state)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from otel_arrow_collector_spark.sources import load_table
from otel_arrow_collector_spark.streaming.joins import interval_join_stream
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def event_stream_dir(spark):
    d = tempfile.mkdtemp(prefix="events_join_stream_")
    (load_table(spark, SF_SMALL, "events")
     .select("event_id", "ts", "user_id", "event_type")
     .repartition(3).write.mode("overwrite").parquet(d))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _stream(spark, d):
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d))


def test_streaming_interval_join_matches_batch_q18(spark, event_stream_dir,
                                                   tmp_path):
    ev = _stream(spark, event_stream_dir)
    joined = interval_join_stream(
        ev.filter("event_type = 'signup'"),
        ev.filter("event_type = 'purchase'"),
        key="user_id", interval="1 hour", watermark="30 days")
    q = (joined.writeStream.format("memory").queryName("ij")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.table("ij").count()

    e = load_table(spark, SF_SMALL, "events")
    want = (e.alias("e1").filter("e1.event_type = 'signup'")
            .join(e.alias("e2").filter("e2.event_type = 'purchase'"),
                  (F.col("e1.user_id") == F.col("e2.user_id"))
                  & (F.col("e2.ts") > F.col("e1.ts"))
                  & (F.col("e2.ts") <= F.col("e1.ts")
                     + F.expr("INTERVAL 1 HOUR"))).count())
    assert got == want and got > 0


def test_operator_always_bounds_state_with_watermarks(spark,
                                                      event_stream_dir):
    """Spark permits an unwatermarked inner stream-stream join (state then
    grows forever); the engine operator must never produce that plan —
    both inputs carry EventTimeWatermark and the condition carries the
    upper time bound, so join state is evictable."""
    ev = _stream(spark, event_stream_dir)
    joined = interval_join_stream(
        ev.filter("event_type = 'signup'"),
        ev.filter("event_type = 'purchase'"),
        key="user_id", interval="1 hour", watermark="2 hours")
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2   # both sides bounded
    assert joined.isStreaming


def test_stream_static_enrichment(spark, event_stream_dir, tmp_path):
    """Stream-static broadcast enrichment: every streamed event carries
    its dimension row; unknown keys survive (left join)."""
    from otel_arrow_collector_spark.streaming.joins import enrich_stream
    ev = _stream(spark, event_stream_dir)
    dim = (load_table(spark, SF_SMALL, "events")
           .select("user_id").distinct()
           .withColumn("segment",
                       (F.col("user_id") % 3).cast("string")))
    # drop some keys from the dim to exercise missing-dimension tolerance
    dim_partial = dim.filter(F.col("user_id") % 5 != 0)
    out = enrich_stream(ev, dim_partial, "user_id")
    q = (out.writeStream.format("memory").queryName("enriched")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.table("enriched")
    total = load_table(spark, SF_SMALL, "events").count()
    assert got.count() == total                      # nothing dropped
    assert got.filter("segment IS NULL").count() == \
        load_table(spark, SF_SMALL, "events") \
        .filter("user_id % 5 = 0").count()           # unknowns null-padded
