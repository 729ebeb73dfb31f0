"""Relational table loader for the driver's synthetic star schema.

The tables (TESTDATA.md / FIXTURES.md §A) are plain parquet; the only
special case is ``events.ts`` — parquet ``timestamp[ns]``.  The reference's
time type is uint64 nanoseconds (pdata/pcommon/timestamp.go:15); Spark's
TimestampType is microseconds.  Verified recipe (SURVEY.md §2.8 note): read
nanos as longs (``spark.sql.legacy.parquet.nanosAsLong=true``, set by
``session.get_spark``) and derive the µs timestamp with
``timestamp_micros(cast(ts/1000 as long))``; keep the ns long as the source
of truth in ``ts_ns``.

Scale note: at 100 TB these reads are partitioned parquet scans; every
declared query selects specific columns and filters early so Catalyst pushes
predicates/projection into the scan (verify with ``PushedFilters`` /
``ReadSchema`` in ``.explain``).  No ``.collect()`` anywhere in the load
path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing types to the engine schema.

    The built DataFrame (a logical plan, not data) is memoized per
    (session, dir, table) so repeated operator calls skip file listing +
    footer schema reads — pure plan-build overhead, not a data cache.
    """
    cache = getattr(spark, "_oacs_tables", None)
    if cache is None:
        cache = {}
        spark._oacs_tables = cache
    key = (os.path.abspath(sf_dir), name)
    if key in cache:
        return cache[key]
    df = _load_table_uncached(spark, sf_dir, name)
    cache[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Without this (runtime-settable) conf, Spark refuses parquet
        # timestamp[ns] outright (PARQUET_TYPE_ILLEGAL) — repair any
        # caller-provided session before the read.  The UTC session tz is
        # equally load-bearing: the NTZ->timestamp cast in
        # _normalize_events is an identity only under UTC, so repair that
        # too instead of trusting the caller's session.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events(df)
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    """events.ts: ns-long (via nanosAsLong) -> TimestampType µs + ts_ns long.

    If the column already arrived as a timestamp (a future Spark reading
    nanos natively), keep it and derive ts_ns from it instead.
    """
    ts_field = df.schema["ts"]
    if isinstance(ts_field.dataType, LongType):
        return (
            df.withColumn("ts_ns", F.col("ts"))
              .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
    if isinstance(ts_field.dataType, TimestampNTZType):
        # parquet timestamp[us] without tz adjustment arrives as NTZ; the
        # session tz is UTC, so the cast is an identity reinterpretation.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df.withColumn("ts_ns", (F.unix_micros(F.col("ts")) * 1000).cast("long"))


def parallel_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_table`` + a fan-out repartition when the parquet file is too
    small to split across the session's cores.

    Why: a single-row-group parquet file yields ONE scan task no matter
    the config, so any compute-dense projection in the scan stage (md5
    signatures, shingle explosions, per-row hashes feeding a partial
    agg) serializes on one core (guide §2.5 input skew / §6 split
    sizing).  Scale-adaptive: when the file already yields at least
    defaultParallelism/2 splits under spark.sql.files.maxPartitionBytes
    (every real-scale table), this is a no-op — no extra shuffle is ever
    added on a big scan.  The repartition is deterministic-output-safe
    for the hash-agg/window consumers here (pinned by the determinism
    sweep across shuffle-partition settings)."""
    df = load_table(spark, sf_dir, name)
    try:
        size = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
    except OSError:
        return df
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes",
                             "134217728"))
    digits = "".join(ch for ch in raw if ch.isdigit()) or "134217728"
    n = spark.sparkContext.defaultParallelism
    if size / int(digits) >= n / 2:
        return df
    return df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register each table as a temp view (for spark.sql access)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
