"""Streaming delta->cumulative: cross-micro-batch state continuity must
reproduce the batch converter's per-series totals (SURVEY.md §4 item (e))."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from otel_arrow_collector_spark.operators.metrics import delta_to_cumulative
from otel_arrow_collector_spark.streaming.temporality import (
    POINT_SCHEMA, delta_to_cumulative_stream, with_series_fp)


@pytest.fixture(scope="module")
def delta_points(spark):
    """Two int series + one double series of delta points, written as 3
    time-ordered files so the stream sees 3 micro-batches."""
    rows = []
    for k in range(9):
        rows.append(("requests", "|a", 1000 + k * 10, 1000, 2 + k, None, 1))
        rows.append(("requests", "|b", 1000 + k * 10, 1000, 100, None, 1))
        rows.append(("latency", "|a", 1000 + k * 10, 1000, None, 0.5 * k, 1))
    df = spark.createDataFrame(rows, POINT_SCHEMA)
    d = tempfile.mkdtemp(prefix="delta_points_")
    for i in range(3):   # file i = ticks [3i, 3i+3) -> arrival == time order
        (df.filter(F.expr(
            f"CAST((time_unix_nano - 1000) / 10 AS INT) DIV 3 = {i}"))
         .coalesce(1).write.mode("append").parquet(d))
    yield df, d
    shutil.rmtree(d, ignore_errors=True)


def _drain(spark, src, tmp_path, name):
    stream = (spark.readStream.schema(POINT_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (delta_to_cumulative_stream(stream)
         .writeStream.format("memory").queryName(name).outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.table(name)


def test_stream_matches_batch_totals(spark, delta_points, tmp_path):
    df, src = delta_points
    got = _drain(spark, src, tmp_path, "cum_stream")
    assert got.count() == df.count()
    assert got.select("aggregation_temporality").distinct().first()[0] == 2

    # final cumulative value per series == batch converter's final value
    final = {(r.metric_name, r.series_fp):
             (r.value_int, r.value_double) for r in
             got.withColumn("rn", F.row_number().over(
                 __import__("pyspark.sql.window", fromlist=["Window"])
                 .Window.partitionBy("metric_name", "series_fp")
                 .orderBy(F.col("time_unix_nano").desc())))
                .filter("rn = 1").collect()}
    assert final[("requests", "|a")][0] == sum(2 + k for k in range(9))
    assert final[("requests", "|b")][0] == 900
    assert final[("latency", "|a")][1] == pytest.approx(
        sum(0.5 * k for k in range(9)))


def test_stream_matches_batch_converter_pointwise(spark, delta_points,
                                                  tmp_path):
    """Files arrive in time order -> every emitted point must equal the
    batch (window-based) conversion, not just the totals."""
    df, src = delta_points
    got = _drain(spark, src, tmp_path, "cum_stream_pw")

    from otel_arrow_collector_spark.model.telemetry import METRIC_POINT_SCHEMA
    pad = df.select(
        "metric_name",
        F.lit("").alias("description"), F.lit("").alias("unit"),
        F.lit(2).alias("metric_type"), "aggregation_temporality",
        F.lit(True).alias("is_monotonic"), "start_time_unix_nano",
        "time_unix_nano",
        F.expr("map('fp', named_struct('s', series_fp, 'i', CAST(NULL AS BIGINT),"
               "'d', CAST(NULL AS DOUBLE), 'b', CAST(NULL AS BOOLEAN),"
               "'json', CAST(NULL AS STRING)))").alias("attributes"),
        "value_int", "value_double",
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in METRIC_POINT_SCHEMA.fields
          if f.name not in {
              "metric_name", "description", "unit", "metric_type",
              "aggregation_temporality", "is_monotonic",
              "start_time_unix_nano", "time_unix_nano", "attributes",
              "value_int", "value_double", "resource_attributes",
              "scope_name", "scope_version"}],
        F.expr("map()").cast(METRIC_POINT_SCHEMA["resource_attributes"].dataType)
         .alias("resource_attributes"),
        F.lit("").alias("scope_name"), F.lit("").alias("scope_version"),
    ).to(METRIC_POINT_SCHEMA)

    batch = with_series_fp(delta_to_cumulative(pad))
    key = ["metric_name", "time_unix_nano", "value_int", "value_double"]
    got_set = {tuple(r) for r in got.select(*key).collect()}
    batch_set = {tuple(r) for r in batch.select(*key).collect()}
    assert got_set == batch_set
