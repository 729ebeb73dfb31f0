"""Metric-semantics operators over the datapoint row model — the
aggregation semantics the reference's data model mandates (SURVEY.md §2.7):
Delta <-> Cumulative temporality conversion
(pdata/pmetric/aggregation_temporality.go:14-21), monotonic-sum roll-ups,
histogram merges (bucket-wise addition with identical bounds), and
min/max/sum/count roll-ups (§1.3).

All operators take/return METRIC_POINT_SCHEMA-shaped DataFrames (one row
per datapoint) and are pure DataFrame ops:

- temporality: order-sensitive per-series window arithmetic (the batch
  twin of the stateful streaming conversion; series key = metric name +
  attribute set + resource)
- histogram merge: element-wise array addition via ``zip_with`` after
  grouping on identical ``explicit_bounds`` — merging across *different*
  bounds is rejected (the reference's merge precondition)

Scale: series keys are (name, attrs-fingerprint) — high cardinality is the
partitioning dimension, windows never span series; merges are ordinary
hash aggregations with array columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Series identity: metric + dimension set + resource (the reference keys
#: stream state the same way conceptually: §2.7 dimensioned counters).
SERIES_KEY = ["metric_name", "__attrs_fp", "__res_fp"]


def _with_series_key(df: DataFrame) -> DataFrame:
    # to_json(..) of a NULL map is NULL, and NULL keys never match in an
    # equi-join — the merge plans join sub-aggregations back on SERIES_KEY,
    # so a NULL fingerprint would silently drop NULL-attribute series.
    # Coalesce to a sentinel that cannot collide with a real fingerprint
    # (real to_json output always starts with '['); groupBy semantics are
    # unchanged (NULLs already formed a single group).
    return (df.withColumn("__attrs_fp", F.coalesce(F.expr(
                "to_json(array_sort(map_entries(attributes)))"),
                F.lit("<null>")))
              .withColumn("__res_fp", F.coalesce(F.expr(
                "to_json(array_sort(map_entries(resource_attributes)))"),
                F.lit("<null>"))))


def delta_to_cumulative(points: DataFrame) -> DataFrame:
    """Delta -> Cumulative: running sum per series ordered by time.

    Mirrors AggregationTemporality semantics: the cumulative value at T is
    the sum of all deltas with time <= T; start_time becomes the series'
    first start_time (aggregation_temporality.go:14-21 definitions).
    """
    w = (Window.partitionBy(*SERIES_KEY)
               .orderBy("time_unix_nano")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    first_w = Window.partitionBy(*SERIES_KEY).orderBy("time_unix_nano")
    return (_with_series_key(points)
            .withColumn("value_int", F.sum("value_int").over(w))
            .withColumn("value_double", F.sum("value_double").over(w))
            .withColumn("start_time_unix_nano",
                        F.first("start_time_unix_nano").over(first_w))
            .withColumn("aggregation_temporality", F.lit(2))
            .drop("__attrs_fp", "__res_fp"))


def cumulative_to_delta(points: DataFrame) -> DataFrame:
    """Cumulative -> Delta: successive differences per series.

    The first point of a series has no predecessor -> its delta is the
    value itself (reset-detection: a cumulative DROP means the source
    restarted; the post-reset value is emitted as-is, matching standard
    OTel delta-conversion semantics)."""
    w = Window.partitionBy(*SERIES_KEY).orderBy("time_unix_nano")
    prev_i = F.lag("value_int").over(w)
    prev_d = F.lag("value_double").over(w)
    prev_t = F.lag("time_unix_nano").over(w)

    def delta(cur, prev):
        return (F.when(prev.isNull(), cur)                # first point
                 .when(cur < prev, cur)                   # reset detected
                 .otherwise(cur - prev))

    return (_with_series_key(points)
            .withColumn("__di", delta(F.col("value_int"), prev_i))
            .withColumn("__dd", delta(F.col("value_double"), prev_d))
            .withColumn("start_time_unix_nano",
                        F.coalesce(prev_t, F.col("start_time_unix_nano")))
            .withColumn("value_int", F.col("__di"))
            .withColumn("value_double", F.col("__dd"))
            .withColumn("aggregation_temporality", F.lit(1))
            .drop("__di", "__dd", "__attrs_fp", "__res_fp"))


class BoundsMismatchError(ValueError):
    """Histogram merge across differing explicit_bounds is undefined."""


def merge_histograms(points: DataFrame,
                     check_bounds: bool = True) -> DataFrame:
    """Roll up histogram datapoints per series: bucket-wise addition with
    identical bounds + min/max/sum/count merge
    (HistogramDataPoint semantics, generated_histogramdatapoint.go:102-107).

    Plan shape (100 TB stance, r13): bucket addition runs as
    posexplode -> SUM per (series, bucket-index) — a PARTIAL-AGGREGABLE
    hash agg, so mappers pre-combine and the shuffle carries per-mapper
    partial sums bounded by |series| x |buckets|, never the point rows.
    (The previous collect_list-of-arrays form pushed every point's array
    through the exchange: ObjectHashAggregate partials concatenate, they
    don't reduce.)  Scalars merge in their own combinable agg; the two
    halves join back on the series key.
    """
    df = _with_series_key(points).filter(F.col("metric_type") == 3)
    if check_bounds:
        n_bounds = (df.groupBy(*SERIES_KEY)
                      .agg(F.countDistinct(F.to_json("explicit_bounds"))
                            .alias("nb"))
                      .filter(F.col("nb") > 1).count())
        if n_bounds:
            raise BoundsMismatchError(
                f"{n_bounds} series mix differing explicit_bounds; "
                f"re-bucket before merging")
    scalars = (df.groupBy(*SERIES_KEY)
               .agg(F.first("attributes").alias("attributes"),
                    F.first("resource_attributes").alias("resource_attributes"),
                    F.min("start_time_unix_nano").alias("start_time_unix_nano"),
                    F.max("time_unix_nano").alias("time_unix_nano"),
                    F.sum("count").alias("count"),
                    F.sum("sum").alias("sum"),
                    F.min("min").alias("min"),
                    F.max("max").alias("max"),
                    F.first("explicit_bounds").alias("explicit_bounds")))
    buckets = (df.select(*SERIES_KEY,
                         F.posexplode("bucket_counts").alias("i", "c"))
               .groupBy(*SERIES_KEY, "i").agg(F.sum("c").alias("c"))
               .groupBy(*SERIES_KEY)
               .agg(F.expr("transform(array_sort(collect_list(struct(i, c))),"
                           " e -> e.c)").alias("bucket_counts")))
    merged = (scalars.join(buckets, SERIES_KEY, "left")
              .withColumn("bucket_counts",
                          F.coalesce("bucket_counts",
                                     F.expr("CAST(array() AS ARRAY<BIGINT>)"))))
    return merged.drop("__attrs_fp", "__res_fp")


def _downscale_sql(off: str, counts: str, shift: str) -> str:
    """SQL for base-2 downscale of one exponential bucket set by ``shift``
    levels: value in bucket index i lands in index i >> shift (arithmetic
    shift = floor division, correct for negative indexes; the reference's
    downscale does idx >> shift the same way,
    generated_exponentialhistogramdatapointbuckets.go:46-56).
    Returns struct<off:int, counts:array<bigint>>."""
    return f"""
    CASE WHEN size({counts}) = 0 OR {shift} = 0
         THEN named_struct('off', {off}, 'counts', {counts})
         ELSE named_struct(
           'off', shiftright({off}, {shift}),
           'counts', transform(
              sequence(shiftright({off}, {shift}),
                       shiftright({off} + size({counts}) - 1, {shift})),
              j -> aggregate(sequence(0, size({counts}) - 1),
                             CAST(0 AS BIGINT),
                             (a2, k) -> a2 + IF(shiftright({off} + k, {shift}) = j,
                                                element_at({counts}, k + 1),
                                                CAST(0 AS BIGINT)))))
    END"""


def merge_exp_histograms(points: DataFrame) -> DataFrame:
    """Roll up exponential-histogram datapoints (metric_type == 4) per
    series with base-2 scale renegotiation
    (generated_exponentialhistogramdatapoint.go:105-125): the merged scale
    is the COARSEST scale in the series; finer points are downscaled
    bucket-wise (index >> shift) before offset-aligned addition; zero
    counts and count/sum/min/max accumulate.

    Plan shape (100 TB stance, r13): target scale = combinable groupBy
    joined back (no window over the series key); each point downscaled
    exactly once in a narrow projection; bucket addition = posexplode ->
    partial-aggregable SUM per (series, absolute index), so every shuffle
    carries pre-combined partials, never point-level arrays; everything
    whole-stage-codegen SQL.
    """
    df = _with_series_key(points).filter(F.col("metric_type") == 4)
    # Target scale per series = COARSEST scale.  Computed as a partial-
    # aggregable groupBy joined back, NOT a window over the series key: a
    # window needs a full-data exchange + sort on the series key and
    # cannot split a partition, so low-cardinality series (e.g. 5 metric
    # names over 100 TB of points) would serialize onto 5 tasks.  The agg
    # side is one narrow row per series (== merge output cardinality);
    # AQE broadcasts it at runtime, so the big side never shuffles here.
    targets = (df.groupBy(*SERIES_KEY)
                 .agg(F.min("scale").alias("__ts")))
    empty = "CAST(array() AS ARRAY<BIGINT>)"
    df = (df.join(targets, SERIES_KEY)
            .withColumn("__shift", F.col("scale") - F.col("__ts"))
            .withColumn("__pos", F.expr(_downscale_sql(
                "coalesce(positive_offset, 0)",
                f"coalesce(positive_bucket_counts, {empty})", "__shift")))
            .withColumn("__neg", F.expr(_downscale_sql(
                "coalesce(negative_offset, 0)",
                f"coalesce(negative_bucket_counts, {empty})", "__shift"))))
    scalars = (df.groupBy(*SERIES_KEY)
               .agg(F.first("attributes").alias("attributes"),
                    F.first("resource_attributes").alias("resource_attributes"),
                    F.min("start_time_unix_nano").alias("start_time_unix_nano"),
                    F.max("time_unix_nano").alias("time_unix_nano"),
                    F.first("__ts").alias("scale"),
                    F.sum("zero_count").alias("zero_count"),
                    F.sum("count").alias("count"),
                    F.sum("sum").alias("sum"),
                    F.min("min").alias("min"),
                    F.max("max").alias("max")))

    # Offset-aligned bucket addition as posexplode -> SUM per
    # (series, absolute index): partial-aggregable, so the shuffle is
    # per-mapper partials bounded by |series| x bucket-span — the
    # previous collect_list of per-point structs shipped every point.
    # Zero-valued entries INSIDE a point's array still explode to rows,
    # so the merged span (min..max exploded index) matches the pairwise
    # fold's least(off)..greatest(end) exactly.
    def _side(col: str):
        rows = (df.select(*SERIES_KEY,
                          F.col(f"{col}.off").alias("o"),
                          F.posexplode(f"{col}.counts").alias("i", "c"))
                .select(*SERIES_KEY, (F.col("o") + F.col("i")).alias("idx"),
                        "c"))
        per_idx = (rows.groupBy(*SERIES_KEY, "idx")
                   .agg(F.sum("c").alias("c")))
        return (per_idx.groupBy(*SERIES_KEY)
                .agg(F.min("idx").alias(f"{col}_off"),
                     F.max("idx").alias(f"{col}_mx"),
                     F.map_from_entries(
                         F.collect_list(F.struct("idx", "c")))
                      .alias(f"{col}_m"))
                .withColumn(
                    f"{col}_counts",
                    F.expr(f"transform(sequence({col}_off, {col}_mx), "
                           f"j -> coalesce(element_at({col}_m, j), "
                           f"CAST(0 AS BIGINT)))"))
                .drop(f"{col}_mx", f"{col}_m"))

    empty = "CAST(array() AS ARRAY<BIGINT>)"
    merged = (scalars
              .join(_side("__pos"), SERIES_KEY, "left")
              .join(_side("__neg"), SERIES_KEY, "left"))
    return (merged.select(
        "metric_name", "attributes", "resource_attributes",
        "start_time_unix_nano", "time_unix_nano", "scale", "zero_count",
        "count", "sum", "min", "max",
        F.coalesce("__pos_off", F.lit(0)).alias("positive_offset"),
        F.coalesce("__pos_counts", F.expr(empty))
         .alias("positive_bucket_counts"),
        F.coalesce("__neg_off", F.lit(0)).alias("negative_offset"),
        F.coalesce("__neg_counts", F.expr(empty))
         .alias("negative_bucket_counts")))


def explode_exemplars(points: DataFrame) -> DataFrame:
    """One row per exemplar, with datapoint context — the trace↔metric
    correlation surface (Exemplar: filtered_attributes, timestamp, value,
    span_id, trace_id; generated_exemplar.go:96-101)."""
    return (points
            .filter(F.col("exemplars").isNotNull())
            .select("metric_name", "metric_type", "time_unix_nano",
                    "attributes",
                    F.posexplode("exemplars").alias("exemplar_idx", "x"))
            .select("metric_name", "metric_type",
                    F.col("time_unix_nano").alias("point_time_unix_nano"),
                    "attributes", "exemplar_idx",
                    F.col("x.time_unix_nano").alias("exemplar_time_unix_nano"),
                    F.col("x.value_double").alias("value_double"),
                    F.col("x.value_int").alias("value_int"),
                    F.col("x.span_id").alias("span_id"),
                    F.col("x.trace_id").alias("trace_id"),
                    F.col("x.filtered_attributes").alias("filtered_attributes")))


def sum_rollup(points: DataFrame) -> DataFrame:
    """Monotonic-sum roll-up per series (obsreport counter semantics §2.7):
    cumulative series take the LAST value per series; delta series add."""
    df = _with_series_key(points).filter(F.col("metric_type") == 2)
    w = Window.partitionBy(*SERIES_KEY).orderBy(F.col("time_unix_nano").desc())
    cumulative = (df.filter(F.col("aggregation_temporality") == 2)
                    .withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .groupBy("metric_name", "__attrs_fp")
                    .agg(F.sum(F.coalesce(F.col("value_int"),
                                          F.col("value_double").cast("long")))
                          .alias("total")))
    delta = (df.filter(F.col("aggregation_temporality") == 1)
               .groupBy("metric_name", "__attrs_fp")
               .agg(F.sum(F.coalesce(F.col("value_int"),
                                     F.col("value_double").cast("long")))
                     .alias("total")))
    return cumulative.unionByName(delta).drop("__attrs_fp")


def histogram_quantile_col(q: float, counts: str, bounds: str):
    """Generic PromQL ``histogram_quantile`` as a pure Column expression
    over ANY explicit-bounds histogram (``counts`` array<bigint> of
    len(bounds)+1, ``bounds`` array<double>): linear interpolation inside
    the bucket containing rank q*total; the unbounded last bucket returns
    its lower bound (SummaryDataPoint quantiles computed from buckets,
    generated_summarydatapoint.go:91).

    All higher-order-function SQL — no UDF, stays in codegen, usable on
    batch AND streaming DataFrames (it is the read-side companion of
    ``merge_histograms`` / ``histogram_merge_stream``).
    """
    # cumulative counts as doubles: cum[i] = counts[0] + .. + counts[i]
    # IF-guard instead of element_at(acc, -1) on the empty seed: ANSI mode
    # (Spark 4 default) raises on out-of-bounds array indexes
    cum = (f"aggregate({counts}, CAST(array() AS ARRAY<DOUBLE>), "
           f"(acc, x) -> array_append(acc, "
           f"IF(size(acc) = 0, CAST(0 AS DOUBLE), element_at(acc, -1)) + x))")
    rank = f"({q} * aggregate({counts}, CAST(0 AS BIGINT), (a, x) -> a + x))"
    i = f"size(filter({cum}, x -> x < {rank}))"
    lower = f"IF({i} = 0, CAST(0 AS DOUBLE), element_at({bounds}, {i}))"
    prev = f"IF({i} = 0, CAST(0 AS DOUBLE), element_at({cum}, {i}))"
    cnt = f"CAST(element_at({counts}, {i} + 1) AS DOUBLE)"
    upper_exists = f"{i} < size({bounds})"
    interp = (f"{lower} + (element_at({bounds}, {i} + 1) - {lower}) "
              f"* ({rank} - {prev}) / {cnt}")
    return F.expr(
        f"CASE WHEN aggregate({counts}, CAST(0 AS BIGINT), (a, x) -> a + x)"
        f" = 0 THEN NULL "
        f"WHEN {upper_exists} AND {cnt} > 0 THEN {interp} "
        f"ELSE {lower} END")
