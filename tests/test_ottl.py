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


def test_path_compiler_attribute_set_get_delete(spark):
    """OTTL field paths (processing.md:147-165): set/read/delete on
    attribute maps and resource attributes by path."""
    from otel_arrow_collector_spark.functions.ottl import (PathError,
                                                           delete_path,
                                                           get_path,
                                                           set_path)
    from otel_arrow_collector_spark.model import generate_traces
    import pytest as _pytest
    td = generate_traces(spark, 4)

    out = set_path(td, 'attributes["http.target"]', F.lit("/api/v1"))
    assert out.select(get_path('attributes["http.target"]'))\
              .first()[0] == "/api/v1"
    # enrichment copy: resource attr -> record attr (processing.md:210-214)
    out2 = set_path(td, 'attributes["res.copy"]',
                    get_path('resource.attributes["resource-attr"]'))
    assert out2.select(get_path('attributes["res.copy"]'))\
               .first()[0] == "resource-attr-val-1"
    gone = delete_path(out, 'attributes["http.target"]')
    assert gone.select(get_path('attributes["http.target"]'))\
               .first()[0] is None
    # dotted structural fields map to flat columns
    assert out.select(get_path("status.message")).distinct().count() >= 1
    with _pytest.raises(PathError):
        set_path(td, 'attributes[unquoted]', F.lit("x"))


def test_apply_ottl_with_paths(spark):
    from otel_arrow_collector_spark.functions.ottl import apply_ottl, get_path
    from otel_arrow_collector_spark.model import generate_traces
    td = generate_traces(spark, 4)
    out = apply_ottl(td, {
        "set_path": {'attributes["env"]': "'prod'"},
        "delete_path": ['resource.attributes["resource-attr"]'],
    })
    assert out.select(get_path('attributes["env"]')).first()[0] == "prod"
    assert out.select(get_path('resource.attributes["resource-attr"]'))\
              .first()[0] is None


def test_explode_attributes_typed_rows(spark):
    """Map.Range analogue: every attribute entry becomes a typed row."""
    from otel_arrow_collector_spark.functions.ottl import (explode_attributes,
                                                           map_put)
    from otel_arrow_collector_spark.model import generate_logs
    from otel_arrow_collector_spark.model.telemetry import attr
    ld = generate_logs(spark, 2)
    enriched = ld.withColumn(
        "attributes",
        map_put(F.col("attributes"), "retries",
                F.expr("named_struct('s', CAST(NULL AS STRING), 'i', 3L, "
                       "'d', CAST(NULL AS DOUBLE), 'b', CAST(NULL AS BOOLEAN),"
                       "'json', CAST(NULL AS STRING))")))
    rows = explode_attributes(enriched, keep=["time_unix_nano"]).collect()
    assert all(r.time_unix_nano is not None for r in rows)
    tags = {(r.key, r.value_type) for r in rows}
    assert ("retries", "int") in tags
    assert any(t == "str" for _, t in tags)
    ints = [r for r in rows if r.key == "retries"]
    assert all(r.i == 3 and r.s is None for r in ints)


def test_map_ops_laws(spark):
    """Map op laws (pdata/pcommon/map.go semantics): put-get identity,
    last-write-wins, delete removes, keep_keys intersects."""
    from otel_arrow_collector_spark.functions.ottl import (keep_keys,
                                                           map_delete,
                                                           map_put)
    from otel_arrow_collector_spark.model import generate_logs
    ld = generate_logs(spark, 1).select("attributes")

    def val(s):
        return F.expr(f"named_struct('s', '{s}', 'i', CAST(NULL AS BIGINT), "
                      "'d', CAST(NULL AS DOUBLE), 'b', CAST(NULL AS BOOLEAN), "
                      "'json', CAST(NULL AS STRING))")

    a = F.col("attributes")
    put_twice = map_put(map_put(a, "k", val("v1")), "k", val("v2"))
    row = ld.select(
        map_put(a, "k", val("v1"))["k"]["s"].alias("put_get"),
        put_twice["k"]["s"].alias("lww"),
        map_delete(map_put(a, "k", val("v1")), "k")["k"].alias("del_get"),
        F.map_keys(keep_keys(map_put(a, "k", val("v1")), "k")).alias("kept"),
        F.size(F.map_keys(keep_keys(a, "definitely-absent"))).alias("none_kept"),
    ).first()
    assert row.put_get == "v1"
    assert row.lww == "v2"              # last-write-wins (map.go:98-186)
    assert row.del_get is None
    assert list(row.kept) == ["k"]
    assert row.none_kept == 0


def test_map_put_on_null_map_creates_entry(spark):
    """Put on a NULL map creates the entry (zero-value Map semantics,
    pdata/pcommon/map.go:98-186) — a null-attributes record must not
    silently drop an OTTL set()."""
    df = spark.createDataFrame([(1, None), (2, {"a": "1"})],
                               "id int, attrs map<string,string>")
    out = {r.id: r.a for r in df.select(
        "id", map_put(F.col("attrs"), "k", F.lit("v")).alias("a")).collect()}
    assert out[1] == {"k": "v"}
    assert out[2] == {"a": "1", "k": "v"}


def test_set_path_on_null_attributes_creates_entry(spark):
    from otel_arrow_collector_spark.functions.ottl import set_path
    df = spark.createDataFrame(
        [(1, None)],
        "id int, attributes map<string,struct<s:string,i:bigint,d:double,"
        "b:boolean,json:string>>")
    row = set_path(df, 'attributes["svc"]', F.lit("api")).first()
    assert row.attributes["svc"]["s"] == "api"


# --- W3C tracestate ops (pdata/pcommon/trace_state.go:17-44 + W3C list
# mutation semantics) -------------------------------------------------------

def _ts_df(spark):
    from otel_arrow_collector_spark.functions import (trace_state_delete,
                                                      trace_state_get,
                                                      trace_state_put)
    df = spark.createDataFrame(
        [(1, "congo=t61rcWkgMzE,rojo=00f067aa0ba902b7"),
         (2, ""), (3, None)], "id int, ts string")
    return df, trace_state_get, trace_state_put, trace_state_delete


def test_trace_state_get(spark):
    df, get, _, _ = _ts_df(spark)
    out = {r.id: r.v for r in df.select(
        "id", get(F.col("ts"), "rojo").alias("v")).collect()}
    assert out[1] == "00f067aa0ba902b7"
    assert out[2] is None and out[3] is None


def test_trace_state_put_moves_member_to_front(spark):
    df, _, put, _ = _ts_df(spark)
    v = df.filter("id = 1").select(
        put(F.col("ts"), "rojo", "new").alias("v")).first().v
    assert v == "rojo=new,congo=t61rcWkgMzE"    # W3C: updated member first


def test_trace_state_put_creates_on_empty_and_null(spark):
    df, _, put, _ = _ts_df(spark)
    out = {r.id: r.v for r in df.select(
        "id", put(F.col("ts"), "k", "v").alias("v")).collect()}
    assert out[2] == "k=v" and out[3] == "k=v"


def test_trace_state_delete_preserves_others(spark):
    df, _, _, delete = _ts_df(spark)
    out = {r.id: r.v for r in df.select(
        "id", delete(F.col("ts"), "congo").alias("v")).collect()}
    assert out[1] == "rojo=00f067aa0ba902b7"
    assert out[2] == "" and out[3] == ""


def test_trace_state_put_get_roundtrip_law(spark):
    df, get, put, _ = _ts_df(spark)
    v = df.select(get(put(F.col("ts"), "k", "xyz"), "k").alias("v")).collect()
    assert all(r.v == "xyz" for r in v)


def test_limit_attributes_caps_with_priority_keys(spark):
    """OTTL limit(): priority keys always survive, the rest fill up to
    max in lexicographic order — deterministic, unlike map iteration."""
    from otel_arrow_collector_spark.functions.ottl import limit_attributes
    df = spark.createDataFrame(
        [({"z": "1", "a": "2", "m": "3", "http.method": "GET",
           "b": "4"},)], "attrs map<string,string>")
    out = df.select(limit_attributes(
        F.col("attrs"), 3, ("http.method",)).alias("a")).first().a
    assert out == {"http.method": "GET", "a": "2", "b": "4"}
    # cap larger than the map: identity
    full = df.select(limit_attributes(
        F.col("attrs"), 99).alias("a")).first().a
    assert full == {"z": "1", "a": "2", "m": "3",
                    "http.method": "GET", "b": "4"}


def test_apply_ottl_truncate_all_and_limit(spark):
    from otel_arrow_collector_spark.functions.ottl import apply_ottl
    df = spark.createDataFrame(
        [(1, {"k1": "abcdefgh", "k2": "xy", "k3": "longvalue"})],
        "id long, attributes map<string,string>")
    out = apply_ottl(df, {
        "truncate_all": {"attributes": 4},
        "limit": [{"column": "attributes", "max": 2, "keep": ["k3"]}],
    }).first().attributes
    assert out == {"k3": "long", "k1": "abcd"}
