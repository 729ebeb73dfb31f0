"""Loader tests: schema normalization, events ns-timestamp recipe."""

from __future__ import annotations

from pyspark.sql.types import LongType, TimestampType

from otel_arrow_collector_spark.sources import load_table, load_tables
from tests.conftest import SF_SMALL


def test_all_tables_load(spark):
    tables = load_tables(spark, SF_SMALL)
    assert set(tables) == {"region", "nation", "customer", "supplier", "part",
                           "orders", "lineitem", "events", "documents",
                           "embeddings"}
    for name, df in tables.items():
        assert df.limit(1).count() == 1, name


def test_events_ts_recipe(spark):
    """ts is µs TimestampType derived from the ns long kept in ts_ns
    (pdata Timestamp is uint64 ns, pdata/pcommon/timestamp.go:15)."""
    ev = load_table(spark, SF_SMALL, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    assert isinstance(ev.schema["ts_ns"].dataType, LongType)
    row = ev.select("ts", "ts_ns").orderBy("event_id").first()
    # µs timestamp == ns//1000
    import calendar
    us = calendar.timegm(row.ts.timetuple()) * 1_000_000 + row.ts.microsecond
    assert us == row.ts_ns // 1000
    # data starts 2024-01-01 (FIXTURES.md)
    assert row.ts.year == 2024


def test_events_ts_ordered_by_event_id(spark):
    ev = load_table(spark, SF_SMALL, "events")
    rows = ev.orderBy("event_id").select("ts_ns").limit(100).collect()
    assert all(rows[i].ts_ns <= rows[i + 1].ts_ns for i in range(len(rows) - 1))
