"""OTLP/JSON codec: flattened telemetry rows <-> OTLP/JSON export requests
(the reference's JSON wire dialect, pdata/ptrace/json.go:18-27 /
pdata/plog/json.go — protobuf JSON mapping: camelCase fields, uint64 nanos
as strings, attribute values as ``{"key": k, "value": {"stringValue": ...}}``
tagged objects).

Both directions are pure Column expressions (from_json / to_json +
higher-order array ops) — the codec runs inside codegen, one pass per
direction, no Python in the loop.  Files are JSON-lines: one export request
object per line (one resource+scope group per request on the write side —
any grouping is valid OTLP; readers must merge, and ours does).

Supported signals: traces, logs, metrics (the full 5-way datapoint oneof:
gauge / sum / histogram / exponentialHistogram / summary, incl. exemplars
and quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.telemetry import LOG_SCHEMA, SPAN_SCHEMA

# ---------------------------------------------------------------------------
# shared attribute-codec expressions
# ---------------------------------------------------------------------------

#: OTLP AnyValue as read from JSON.  Scalar arms are native; structured
#: (Map/Slice) values ride in ``kvlistValue`` as a single ``__raw_json``
#: string entry — structurally valid OTLP (a kvlist of one string value)
#: with bounded schema depth, so ``from_json``/``to_json`` stay symmetric
#: without recursive schemas.  Documented divergence: a foreign OTLP
#: writer's deeply-nested kvlists are not decoded beyond this convention.
_OTLP_SCALAR = ("struct<stringValue:string, intValue:string, "
                "doubleValue:double, boolValue:boolean>")
_OTLP_VALUE = ("struct<stringValue:string, intValue:string, "
               "doubleValue:double, boolValue:boolean, "
               f"kvlistValue:struct<values:array<struct<key:string, value:{_OTLP_SCALAR}>>>>")
_OTLP_ATTRS = f"array<struct<key:string, value:{_OTLP_VALUE}>>"

#: writer: tagged variant {s,i,d,b,json} -> OTLP AnyValue struct
_VAL_TO_OTLP = """named_struct(
    'stringValue', {v}.s,
    'intValue', CAST({v}.i AS STRING),
    'doubleValue', {v}.d,
    'boolValue', {v}.b,
    'kvlistValue', CASE WHEN {v}.json IS NOT NULL THEN named_struct(
        'values', array(named_struct(
            'key', '__raw_json',
            'value', named_struct(
                'stringValue', {v}.json,
                'intValue', CAST(NULL AS STRING),
                'doubleValue', CAST(NULL AS DOUBLE),
                'boolValue', CAST(NULL AS BOOLEAN))))) END)"""

#: reader: OTLP AnyValue struct -> tagged variant
_VAL_FROM_OTLP = """named_struct(
    's', {v}.stringValue,
    'i', CAST({v}.intValue AS BIGINT),
    'd', {v}.doubleValue,
    'b', {v}.boolValue,
    'json', CASE WHEN {v}.kvlistValue IS NOT NULL
                  AND size({v}.kvlistValue.values) = 1
                  AND {v}.kvlistValue.values[0].key = '__raw_json'
                 THEN {v}.kvlistValue.values[0].value.stringValue END)"""


def _attrs_to_otlp(col: str) -> str:
    """map<k, {s,i,d,b,json}> -> OTLP attribute list (sorted by key for
    deterministic output)."""
    val = _VAL_TO_OTLP.format(v="e.value")
    return f"""
    transform(array_sort(map_entries({col}), (a, b) ->
                  CASE WHEN a.key < b.key THEN -1
                       WHEN a.key > b.key THEN 1 ELSE 0 END),
              e -> named_struct('key', e.key, 'value', {val}))
    """


def _attrs_from_otlp(col: str) -> str:
    """OTLP attribute list -> tagged variant map."""
    val = _VAL_FROM_OTLP.format(v="a.value")
    return f"""
    map_from_entries(transform(coalesce({col}, array()),
        a -> struct(a.key, {val})))
    """


def _ns_str(col: str) -> str:
    return f"CAST({col} AS STRING)"   # uint64 nanos -> JSON string


# ---------------------------------------------------------------------------
# traces
# ---------------------------------------------------------------------------

_SPAN_TO_OTLP = f"""
named_struct(
  'traceId', trace_id, 'spanId', span_id,
  'parentSpanId', parent_span_id, 'traceState', trace_state,
  'name', name, 'kind', kind,
  'startTimeUnixNano', {_ns_str('start_time_unix_nano')},
  'endTimeUnixNano', {_ns_str('end_time_unix_nano')},
  'attributes', {_attrs_to_otlp('attributes')},
  'droppedAttributesCount', dropped_attributes_count,
  'events', transform(events, ev -> named_struct(
      'timeUnixNano', CAST(ev.time_unix_nano AS STRING),
      'name', ev.name,
      'attributes', {_attrs_to_otlp('ev.attributes')},
      'droppedAttributesCount', ev.dropped_attributes_count)),
  'droppedEventsCount', dropped_events_count,
  'links', transform(links, ln -> named_struct(
      'traceId', ln.trace_id, 'spanId', ln.span_id,
      'traceState', ln.trace_state,
      'attributes', {_attrs_to_otlp('ln.attributes')},
      'droppedAttributesCount', ln.dropped_attributes_count)),
  'droppedLinksCount', dropped_links_count,
  'status', named_struct('code', status_code, 'message', status_message))
"""

_OTLP_SPAN_SCHEMA = f"""
array<struct<
  resource: struct<attributes: {_OTLP_ATTRS}>,
  scopeSpans: array<struct<
    scope: struct<name: string, version: string>,
    spans: array<struct<
      traceId: string, spanId: string, parentSpanId: string,
      traceState: string, name: string, kind: int,
      startTimeUnixNano: string, endTimeUnixNano: string,
      attributes: {_OTLP_ATTRS}, droppedAttributesCount: int,
      events: array<struct<timeUnixNano: string, name: string,
                           attributes: {_OTLP_ATTRS},
                           droppedAttributesCount: int>>,
      droppedEventsCount: int,
      links: array<struct<traceId: string, spanId: string,
                          traceState: string, attributes: {_OTLP_ATTRS},
                          droppedAttributesCount: int>>,
      droppedLinksCount: int,
      status: struct<code: int, message: string>>>>>>>
"""


def spans_to_otlp_json(spans: DataFrame) -> DataFrame:
    """Span rows -> one OTLP/JSON export-request line per resource+scope
    group (marshal direction of ptrace/json.go:18)."""
    grouped = (spans
               .withColumn("__res_key", F.expr(
                   "to_json(array_sort(map_entries(resource_attributes)))"))
               .withColumn("__span", F.expr(_SPAN_TO_OTLP))
               .groupBy("__res_key", "scope_name", "scope_version")
               .agg(F.first("resource_attributes").alias("resource_attributes"),
                    F.collect_list("__span").alias("spans")))
    req = F.expr(f"""
    named_struct('resourceSpans', array(named_struct(
        'resource', named_struct('attributes',
                                 {_attrs_to_otlp('resource_attributes')}),
        'scopeSpans', array(named_struct(
            'scope', named_struct('name', scope_name,
                                  'version', scope_version),
            'spans', spans)))))
    """)
    return grouped.select(F.to_json(req).alias("json"))


def spans_from_otlp_json(df: DataFrame) -> DataFrame:
    """OTLP/JSON lines -> span rows (unmarshal, ptrace/json.go:22-27)."""
    parsed = df.select(
        F.from_json("json", f"struct<resourceSpans: {_OTLP_SPAN_SCHEMA}>")
         .alias("r"))
    rs = parsed.select(F.explode("r.resourceSpans").alias("rs"))
    ss = rs.select(
        F.expr(_attrs_from_otlp("rs.resource.attributes"))
         .alias("resource_attributes"),
        F.explode("rs.scopeSpans").alias("ss"))
    sp = ss.select(
        "resource_attributes",
        F.coalesce(F.col("ss.scope.name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("ss.scope.version"), F.lit("")).alias("scope_version"),
        F.explode("ss.spans").alias("sp"))
    flat = sp.selectExpr(
        "sp.traceId AS trace_id", "sp.spanId AS span_id",
        "sp.parentSpanId AS parent_span_id",
        "coalesce(sp.traceState, '') AS trace_state",
        "sp.name AS name", "coalesce(sp.kind, 0) AS kind",
        "CAST(sp.startTimeUnixNano AS BIGINT) AS start_time_unix_nano",
        "CAST(sp.endTimeUnixNano AS BIGINT) AS end_time_unix_nano",
        _attrs_from_otlp("sp.attributes") + " AS attributes",
        "coalesce(sp.droppedAttributesCount, 0) AS dropped_attributes_count",
        f"""CASE WHEN size(sp.events) > 0 THEN
            transform(sp.events, ev -> named_struct(
            'time_unix_nano', CAST(ev.timeUnixNano AS BIGINT),
            'name', ev.name,
            'attributes', {_attrs_from_otlp('ev.attributes')},
            'dropped_attributes_count',
            coalesce(ev.droppedAttributesCount, 0))) END AS events""",
        "coalesce(sp.droppedEventsCount, 0) AS dropped_events_count",
        f"""CASE WHEN size(sp.links) > 0 THEN
            transform(sp.links, ln -> named_struct(
            'trace_id', ln.traceId, 'span_id', ln.spanId,
            'trace_state', coalesce(ln.traceState, ''),
            'attributes', {_attrs_from_otlp('ln.attributes')},
            'dropped_attributes_count',
            coalesce(ln.droppedAttributesCount, 0))) END AS links""",
        "coalesce(sp.droppedLinksCount, 0) AS dropped_links_count",
        "coalesce(sp.status.code, 0) AS status_code",
        "coalesce(sp.status.message, '') AS status_message",
        "resource_attributes", "scope_name", "scope_version",
    )
    return flat.to(SPAN_SCHEMA)   # normalize nullability to the contract


# ---------------------------------------------------------------------------
# logs
# ---------------------------------------------------------------------------

_OTLP_LOG_SCHEMA = f"""
array<struct<
  resource: struct<attributes: {_OTLP_ATTRS}>,
  scopeLogs: array<struct<
    scope: struct<name: string, version: string>,
    logRecords: array<struct<
      timeUnixNano: string, observedTimeUnixNano: string,
      traceId: string, spanId: string, flags: int,
      severityNumber: int, severityText: string,
      body: {_OTLP_VALUE},
      attributes: {_OTLP_ATTRS}, droppedAttributesCount: int>>>>>>
"""

_LOG_TO_OTLP = f"""
named_struct(
  'timeUnixNano', {_ns_str('time_unix_nano')},
  'observedTimeUnixNano', {_ns_str('observed_time_unix_nano')},
  'traceId', trace_id, 'spanId', span_id, 'flags', flags,
  'severityNumber', severity_number, 'severityText', severity_text,
  'body', {_VAL_TO_OTLP.format(v='body')},
  'attributes', {_attrs_to_otlp('attributes')},
  'droppedAttributesCount', dropped_attributes_count)
"""


def logs_to_otlp_json(logs: DataFrame) -> DataFrame:
    grouped = (logs
               .withColumn("__res_key", F.expr(
                   "to_json(array_sort(map_entries(resource_attributes)))"))
               .withColumn("__lr", F.expr(_LOG_TO_OTLP))
               .groupBy("__res_key", "scope_name", "scope_version")
               .agg(F.first("resource_attributes").alias("resource_attributes"),
                    F.collect_list("__lr").alias("logRecords")))
    req = F.expr(f"""
    named_struct('resourceLogs', array(named_struct(
        'resource', named_struct('attributes',
                                 {_attrs_to_otlp('resource_attributes')}),
        'scopeLogs', array(named_struct(
            'scope', named_struct('name', scope_name,
                                  'version', scope_version),
            'logRecords', logRecords)))))
    """)
    return grouped.select(F.to_json(req).alias("json"))


def logs_from_otlp_json(df: DataFrame) -> DataFrame:
    parsed = df.select(
        F.from_json("json", f"struct<resourceLogs: {_OTLP_LOG_SCHEMA}>")
         .alias("r"))
    rl = parsed.select(F.explode("r.resourceLogs").alias("rl"))
    sl = rl.select(
        F.expr(_attrs_from_otlp("rl.resource.attributes"))
         .alias("resource_attributes"),
        F.explode("rl.scopeLogs").alias("sl"))
    lr = sl.select(
        "resource_attributes",
        F.coalesce(F.col("sl.scope.name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("sl.scope.version"), F.lit("")).alias("scope_version"),
        F.explode("sl.logRecords").alias("lr"))
    flat = lr.selectExpr(
        "CAST(lr.timeUnixNano AS BIGINT) AS time_unix_nano",
        "coalesce(CAST(lr.observedTimeUnixNano AS BIGINT), 0) AS observed_time_unix_nano",
        "lr.traceId AS trace_id", "lr.spanId AS span_id",
        "coalesce(lr.flags, 0) AS flags",
        "coalesce(lr.severityNumber, 0) AS severity_number",
        "coalesce(lr.severityText, '') AS severity_text",
        _VAL_FROM_OTLP.format(v="lr.body") + " AS body",
        _attrs_from_otlp("lr.attributes") + " AS attributes",
        "coalesce(lr.droppedAttributesCount, 0) AS dropped_attributes_count",
        "resource_attributes", "scope_name", "scope_version",
    )
    return flat.to(LOG_SCHEMA)   # normalize nullability to the contract


# ---------------------------------------------------------------------------
# file-level API (used by the pipeline compiler's kind: json receiver)
# ---------------------------------------------------------------------------

_READERS = {"traces": spans_from_otlp_json, "logs": logs_from_otlp_json}
_WRITERS = {"traces": spans_to_otlp_json, "logs": logs_to_otlp_json}


def read_otlp_json(spark: SparkSession, path: str,
                   signal: str = "logs") -> DataFrame:
    if signal not in _READERS:
        raise NotImplementedError(
            f"OTLP/JSON for signal {signal!r} not wired "
            f"(supported: {sorted(_READERS)})")
    raw = spark.read.text(path).withColumnRenamed("value", "json")
    return _READERS[signal](raw)


def write_otlp_json(df: DataFrame, path: str, signal: str) -> None:
    if signal not in _WRITERS:
        raise NotImplementedError(
            f"OTLP/JSON for signal {signal!r} not wired "
            f"(supported: {sorted(_WRITERS)})")
    _WRITERS[signal](df).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# metrics (the 5-way datapoint oneof, pmetric/json.go dialect)
# ---------------------------------------------------------------------------

_OTLP_EXEMPLAR = (f"array<struct<filteredAttributes: {_OTLP_ATTRS}, "
                  "timeUnixNano: string, asDouble: double, asInt: string, "
                  "spanId: string, traceId: string>>")

_OTLP_NUM_DP = (f"array<struct<attributes: {_OTLP_ATTRS}, "
                "startTimeUnixNano: string, timeUnixNano: string, "
                "asInt: string, asDouble: double, flags: int, "
                f"exemplars: {_OTLP_EXEMPLAR}>>")

_OTLP_HIST_DP = (f"array<struct<attributes: {_OTLP_ATTRS}, "
                 "startTimeUnixNano: string, timeUnixNano: string, "
                 "count: string, sum: double, min: double, max: double, "
                 "bucketCounts: array<string>, explicitBounds: array<double>, "
                 f"flags: int, exemplars: {_OTLP_EXEMPLAR}>>")

_OTLP_EXPO_DP = (f"array<struct<attributes: {_OTLP_ATTRS}, "
                 "startTimeUnixNano: string, timeUnixNano: string, "
                 "count: string, sum: double, min: double, max: double, "
                 "scale: int, zeroCount: string, "
                 "positive: struct<offset: int, bucketCounts: array<string>>, "
                 "negative: struct<offset: int, bucketCounts: array<string>>, "
                 f"flags: int, exemplars: {_OTLP_EXEMPLAR}>>")

_OTLP_SUMM_DP = (f"array<struct<attributes: {_OTLP_ATTRS}, "
                 "startTimeUnixNano: string, timeUnixNano: string, "
                 "count: string, sum: double, "
                 "quantileValues: array<struct<quantile: double, value: double>>, "
                 "flags: int>>")

_OTLP_METRIC_SCHEMA = f"""
array<struct<
  resource: struct<attributes: {_OTLP_ATTRS}>,
  scopeMetrics: array<struct<
    scope: struct<name: string, version: string>,
    metrics: array<struct<
      name: string, description: string, unit: string,
      gauge: struct<dataPoints: {_OTLP_NUM_DP}>,
      sum: struct<dataPoints: {_OTLP_NUM_DP},
                  aggregationTemporality: int, isMonotonic: boolean>,
      histogram: struct<dataPoints: {_OTLP_HIST_DP},
                        aggregationTemporality: int>,
      exponentialHistogram: struct<dataPoints: {_OTLP_EXPO_DP},
                                   aggregationTemporality: int>,
      summary: struct<dataPoints: {_OTLP_SUMM_DP}>>>>>>>
"""

_EXEMPLARS_TO_OTLP = f"""
transform(coalesce(exemplars, array()), x -> named_struct(
    'filteredAttributes', {_attrs_to_otlp('x.filtered_attributes')},
    'timeUnixNano', CAST(x.time_unix_nano AS STRING),
    'asDouble', x.value_double, 'asInt', CAST(x.value_int AS STRING),
    'spanId', x.span_id, 'traceId', x.trace_id))
"""

#: Per-type datapoint object (write side).  Shared numeric fields inline.
_DP_COMMON = f"""
    'attributes', {_attrs_to_otlp('attributes')},
    'startTimeUnixNano', CAST(start_time_unix_nano AS STRING),
    'timeUnixNano', CAST(time_unix_nano AS STRING)
"""

_NUM_DP_TO_OTLP = f"""named_struct({_DP_COMMON},
    'asInt', CAST(value_int AS STRING), 'asDouble', value_double,
    'flags', flags, 'exemplars', {_EXEMPLARS_TO_OTLP})"""

_HIST_DP_TO_OTLP = f"""named_struct({_DP_COMMON},
    'count', CAST(count AS STRING), 'sum', sum, 'min', min, 'max', max,
    'bucketCounts', transform(coalesce(bucket_counts, array()),
                              x -> CAST(x AS STRING)),
    'explicitBounds', explicit_bounds,
    'flags', flags, 'exemplars', {_EXEMPLARS_TO_OTLP})"""

_EXPO_DP_TO_OTLP = f"""named_struct({_DP_COMMON},
    'count', CAST(count AS STRING), 'sum', sum, 'min', min, 'max', max,
    'scale', scale, 'zeroCount', CAST(zero_count AS STRING),
    'positive', named_struct('offset', positive_offset,
        'bucketCounts', transform(coalesce(positive_bucket_counts, array()),
                                  x -> CAST(x AS STRING))),
    'negative', named_struct('offset', negative_offset,
        'bucketCounts', transform(coalesce(negative_bucket_counts, array()),
                                  x -> CAST(x AS STRING))),
    'flags', flags, 'exemplars', {_EXEMPLARS_TO_OTLP})"""

_SUMM_DP_TO_OTLP = f"""named_struct({_DP_COMMON},
    'count', CAST(count AS STRING), 'sum', sum,
    'quantileValues', quantile_values, 'flags', flags)"""


def metrics_to_otlp_json(points: DataFrame) -> DataFrame:
    """Metric datapoint rows -> OTLP/JSON export-request lines.

    Two-level grouping: datapoints -> metric objects (identity = name +
    type + temporality + monotonicity + description + unit), metrics ->
    resource/scope requests.  The 5-way oneof is emitted as exactly one
    non-null arm per metric (to_json drops the null arms)."""
    t = F.col("metric_type")
    dp = (F.when(t == 3, F.expr(_HIST_DP_TO_OTLP).cast("string"))
           .when(t == 4, F.expr(_EXPO_DP_TO_OTLP).cast("string")))
    grouped = (points
               .withColumn("__res_key", F.expr(
                   "to_json(array_sort(map_entries(resource_attributes)))"))
               .withColumn("__num_dp", F.expr(_NUM_DP_TO_OTLP))
               .withColumn("__hist_dp", F.expr(_HIST_DP_TO_OTLP))
               .withColumn("__expo_dp", F.expr(_EXPO_DP_TO_OTLP))
               .withColumn("__summ_dp", F.expr(_SUMM_DP_TO_OTLP))
               .groupBy("__res_key", "scope_name", "scope_version",
                        "metric_name", "metric_type",
                        "aggregation_temporality", "is_monotonic",
                        "description", "unit")
               .agg(F.first("resource_attributes").alias("resource_attributes"),
                    F.collect_list("__num_dp").alias("num_dps"),
                    F.collect_list("__hist_dp").alias("hist_dps"),
                    F.collect_list("__expo_dp").alias("expo_dps"),
                    F.collect_list("__summ_dp").alias("summ_dps")))
    metric_obj = F.expr("""
    named_struct(
      'name', metric_name, 'description', description, 'unit', unit,
      'gauge', CASE WHEN metric_type = 1
                    THEN named_struct('dataPoints', num_dps) END,
      'sum', CASE WHEN metric_type = 2 THEN named_struct(
                 'dataPoints', num_dps,
                 'aggregationTemporality', aggregation_temporality,
                 'isMonotonic', is_monotonic) END,
      'histogram', CASE WHEN metric_type = 3 THEN named_struct(
                 'dataPoints', hist_dps,
                 'aggregationTemporality', aggregation_temporality) END,
      'exponentialHistogram', CASE WHEN metric_type = 4 THEN named_struct(
                 'dataPoints', expo_dps,
                 'aggregationTemporality', aggregation_temporality) END,
      'summary', CASE WHEN metric_type = 5
                      THEN named_struct('dataPoints', summ_dps) END)
    """)
    by_resource = (grouped
                   .withColumn("__metric", metric_obj)
                   .groupBy("__res_key", "scope_name", "scope_version")
                   .agg(F.first("resource_attributes")
                         .alias("resource_attributes"),
                        F.collect_list("__metric").alias("metrics")))
    req = F.expr(f"""
    named_struct('resourceMetrics', array(named_struct(
        'resource', named_struct('attributes',
                                 {_attrs_to_otlp('resource_attributes')}),
        'scopeMetrics', array(named_struct(
            'scope', named_struct('name', scope_name,
                                  'version', scope_version),
            'metrics', metrics)))))
    """)
    return by_resource.select(F.to_json(req).alias("json"))


def _nullif_empty(expr: str) -> str:
    """Canonicalize absent/empty repeated fields to NULL (protobuf JSON
    cannot distinguish them; NULL is the row-model canonical form)."""
    return f"CASE WHEN size({expr}) > 0 THEN {expr} END"


def _exemplars_from_otlp(col: str) -> str:
    return _nullif_empty(f"""
    transform({col}, x -> named_struct(
        'filtered_attributes', {_attrs_from_otlp('x.filteredAttributes')},
        'time_unix_nano', CAST(x.timeUnixNano AS BIGINT),
        'value_double', x.asDouble, 'value_int', CAST(x.asInt AS BIGINT),
        'span_id', x.spanId, 'trace_id', x.traceId))
    """)


def metrics_from_otlp_json(df: DataFrame) -> DataFrame:
    """OTLP/JSON lines -> metric datapoint rows (all 5 metric types)."""
    from ..model.telemetry import METRIC_POINT_SCHEMA
    parsed = df.select(
        F.from_json("json", f"struct<resourceMetrics: {_OTLP_METRIC_SCHEMA}>")
         .alias("r"))
    sm = (parsed.select(F.explode("r.resourceMetrics").alias("rm"))
          .select(F.expr(_attrs_from_otlp("rm.resource.attributes"))
                   .alias("resource_attributes"),
                  F.explode("rm.scopeMetrics").alias("sm")))
    m = sm.select(
        "resource_attributes",
        F.coalesce(F.col("sm.scope.name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("sm.scope.version"), F.lit("")).alias("scope_version"),
        F.explode("sm.metrics").alias("m"))

    def _common(mtype: str, temporality: str, monotonic: str):
        return [
            "m.name AS metric_name",
            "coalesce(m.description, '') AS description",
            "coalesce(m.unit, '') AS unit",
            f"{mtype} AS metric_type",
            f"coalesce({temporality}, 0) AS aggregation_temporality",
            f"{monotonic} AS is_monotonic",
            "CAST(dp.startTimeUnixNano AS BIGINT) AS start_time_unix_nano",
            "CAST(dp.timeUnixNano AS BIGINT) AS time_unix_nano",
            _attrs_from_otlp("dp.attributes") + " AS attributes",
            "coalesce(dp.flags, 0) AS flags",
            "resource_attributes", "scope_name", "scope_version",
        ]

    gauge = (m.filter("m.gauge IS NOT NULL")
             .select("resource_attributes", "scope_name", "scope_version", "m",
                     F.explode("m.gauge.dataPoints").alias("dp"))
             .selectExpr(*_common("1", "NULL", "CAST(NULL AS BOOLEAN)"),
                         "CAST(dp.asInt AS BIGINT) AS value_int",
                         "dp.asDouble AS value_double",
                         _exemplars_from_otlp("dp.exemplars") + " AS exemplars"))
    sum_ = (m.filter("m.sum IS NOT NULL")
            .select("resource_attributes", "scope_name", "scope_version", "m",
                    F.explode("m.sum.dataPoints").alias("dp"))
            .selectExpr(*_common("2", "m.sum.aggregationTemporality",
                                 "m.sum.isMonotonic"),
                        "CAST(dp.asInt AS BIGINT) AS value_int",
                        "dp.asDouble AS value_double",
                        _exemplars_from_otlp("dp.exemplars") + " AS exemplars"))
    hist = (m.filter("m.histogram IS NOT NULL")
            .select("resource_attributes", "scope_name", "scope_version", "m",
                    F.explode("m.histogram.dataPoints").alias("dp"))
            .selectExpr(*_common("3", "m.histogram.aggregationTemporality",
                                 "CAST(NULL AS BOOLEAN)"),
                        "CAST(dp.count AS BIGINT) AS count",
                        "dp.sum AS sum", "dp.min AS min", "dp.max AS max",
                        "CASE WHEN size(transform(dp.bucketCounts, x -> CAST(x AS BIGINT))) > 0 THEN transform(dp.bucketCounts, x -> CAST(x AS BIGINT)) END AS bucket_counts",
                        "CASE WHEN size(dp.explicitBounds) > 0 THEN dp.explicitBounds END AS explicit_bounds",
                        _exemplars_from_otlp("dp.exemplars") + " AS exemplars"))
    expo = (m.filter("m.exponentialHistogram IS NOT NULL")
            .select("resource_attributes", "scope_name", "scope_version", "m",
                    F.explode("m.exponentialHistogram.dataPoints").alias("dp"))
            .selectExpr(*_common("4",
                                 "m.exponentialHistogram.aggregationTemporality",
                                 "CAST(NULL AS BOOLEAN)"),
                        "CAST(dp.count AS BIGINT) AS count",
                        "dp.sum AS sum", "dp.min AS min", "dp.max AS max",
                        "dp.scale AS scale",
                        "CAST(dp.zeroCount AS BIGINT) AS zero_count",
                        "dp.positive.offset AS positive_offset",
                        "CASE WHEN size(transform(dp.positive.bucketCounts, x -> CAST(x AS BIGINT))) > 0 THEN transform(dp.positive.bucketCounts, x -> CAST(x AS BIGINT)) END AS positive_bucket_counts",
                        "dp.negative.offset AS negative_offset",
                        "CASE WHEN size(transform(dp.negative.bucketCounts, x -> CAST(x AS BIGINT))) > 0 THEN transform(dp.negative.bucketCounts, x -> CAST(x AS BIGINT)) END AS negative_bucket_counts",
                        _exemplars_from_otlp("dp.exemplars") + " AS exemplars"))
    summ = (m.filter("m.summary IS NOT NULL")
            .select("resource_attributes", "scope_name", "scope_version", "m",
                    F.explode("m.summary.dataPoints").alias("dp"))
            .selectExpr(*_common("5", "NULL", "CAST(NULL AS BOOLEAN)"),
                        "CAST(dp.count AS BIGINT) AS count",
                        "dp.sum AS sum",
                        "CASE WHEN size(dp.quantileValues) > 0 THEN dp.quantileValues END AS quantile_values"))

    def pad(df_: DataFrame) -> DataFrame:
        """Add every missing METRIC_POINT_SCHEMA column as typed NULL."""
        have = set(df_.columns)
        cols = []
        for f_ in METRIC_POINT_SCHEMA.fields:
            if f_.name in have:
                cols.append(F.col(f_.name))
            else:
                cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        return df_.select(*cols)

    out = pad(gauge)
    for part in (sum_, hist, expo, summ):
        out = out.unionByName(pad(part))
    return out.to(METRIC_POINT_SCHEMA)


_READERS["metrics"] = metrics_from_otlp_json
_WRITERS["metrics"] = metrics_to_otlp_json
