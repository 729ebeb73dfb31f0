"""OTAP — the OTel-Arrow normalized multi-payload span encoding.

The fork's defining data model: instead of one nested OTLP batch, a
span batch travels as a SET of flat Arrow tables related by parent ids
(the otel-arrow adapter's normalized schema; payload types from the
public arrow/v1 proto — SPANS=40, SPAN_ATTRS=41, SPAN_EVENTS=42,
SPAN_LINKS=43, SPAN_EVENT_ATTRS=44, SPAN_LINK_ATTRS=45, plus
RESOURCE_ATTRS=1 keyed by a resource id carried on the main table).
Flat columnar tables dictionary-encode and compress far better than
nested structs — the fork's compression win — and they are ALSO the
natural Spark shape: reassembly is a handful of joins + collect_list,
not a custom decoder.

- :func:`encode_spans` — engine SPAN_SCHEMA rows -> [(schema_id,
  payload_type, pyarrow Table)] with uint32 parent ids.
- :func:`decode_spans` — the inverse (driver-side, golden tests).
- :func:`assemble_spans_df` — SPARK-side reassembly of the spooled
  payload tables back into SPAN_SCHEMA-shaped rows: one hash join per
  satellite table, each keyed by parent id.

Attribute rows mirror the engine's tagged attr struct: (parent_id, key,
s, i, d, b, json) — one row per map entry, NULLs off-arm.

Reference: receiver/otlpreceiver/internal/arrow/arrow.go:361-430
(processRecords consuming the payload set per signal).
"""

from __future__ import annotations

import pyarrow as pa

#: Payload type ids (public otel-arrow arrow/v1 proto).
RESOURCE_ATTRS = 1
SPANS = 40
SPAN_ATTRS = 41
SPAN_EVENTS = 42
SPAN_LINKS = 43
SPAN_EVENT_ATTRS = 44
SPAN_LINK_ATTRS = 45

_MAIN_COLS = [
    "id", "resource_id", "trace_id", "span_id", "parent_span_id",
    "trace_state", "name", "kind", "start_time_unix_nano",
    "end_time_unix_nano", "dropped_attributes_count",
    "dropped_events_count", "dropped_links_count", "status_code",
    "status_message", "scope_name", "scope_version",
]


def _attr_rows(parent_id: int, attrs: dict | None, out: list) -> None:
    for key, v in (attrs or {}).items():
        v = v or {}
        out.append({"parent_id": parent_id, "key": key,
                    "s": v.get("s"), "i": v.get("i"), "d": v.get("d"),
                    "b": v.get("b"), "json": v.get("json")})


_ATTR_SCHEMA = pa.schema([
    ("parent_id", pa.uint32()), ("key", pa.string()), ("s", pa.string()),
    ("i", pa.int64()), ("d", pa.float64()), ("b", pa.bool_()),
    ("json", pa.string())])


def _attr_table(rows: list) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=_ATTR_SCHEMA)


def encode_spans(rows: list[dict]) -> list[tuple[str, int, pa.Table]]:
    """Engine span rows (SPAN_SCHEMA ``asDict(recursive=True)``) -> the
    OTAP payload set.  Resource attribute sets are deduplicated into
    RESOURCE_ATTRS keyed by ``resource_id``."""
    main, sattrs, events, eattrs, links, lattrs, rattrs = \
        [], [], [], [], [], [], []
    res_ids: dict[str, int] = {}
    ev_id = ln_id = 0
    for i, r in enumerate(rows):
        rkey = repr(sorted((r.get("resource_attributes") or {}).items()))
        if rkey not in res_ids:
            res_ids[rkey] = len(res_ids)
            _attr_rows(res_ids[rkey], r.get("resource_attributes"), rattrs)
        main.append({
            "id": i, "resource_id": res_ids[rkey],
            **{k: r.get(k) for k in _MAIN_COLS[2:]}})
        _attr_rows(i, r.get("attributes"), sattrs)
        for ev in r.get("events") or []:
            events.append({"id": ev_id, "parent_id": i,
                           "time_unix_nano": ev.get("time_unix_nano"),
                           "name": ev.get("name"),
                           "dropped_attributes_count":
                               ev.get("dropped_attributes_count")})
            _attr_rows(ev_id, ev.get("attributes"), eattrs)
            ev_id += 1
        for lk in r.get("links") or []:
            links.append({"id": ln_id, "parent_id": i,
                          "trace_id": lk.get("trace_id"),
                          "span_id": lk.get("span_id"),
                          "trace_state": lk.get("trace_state"),
                          "dropped_attributes_count":
                              lk.get("dropped_attributes_count")})
            _attr_rows(ln_id, lk.get("attributes"), lattrs)
            ln_id += 1
    out = [("spans", SPANS, pa.Table.from_pylist(main)),
           ("resource-attrs", RESOURCE_ATTRS, _attr_table(rattrs)),
           ("span-attrs", SPAN_ATTRS, _attr_table(sattrs))]
    if events:
        out.append(("span-events", SPAN_EVENTS,
                    pa.Table.from_pylist(events)))
        out.append(("span-event-attrs", SPAN_EVENT_ATTRS,
                    _attr_table(eattrs)))
    if links:
        out.append(("span-links", SPAN_LINKS, pa.Table.from_pylist(links)))
        out.append(("span-link-attrs", SPAN_LINK_ATTRS,
                    _attr_table(lattrs)))
    return out


def _attrs_of(table: pa.Table | None, parent_id: int) -> dict:
    if table is None:
        return {}
    out = {}
    for r in table.to_pylist():
        if r["parent_id"] == parent_id:
            out[r["key"]] = {"s": r["s"], "i": r["i"], "d": r["d"],
                             "b": r["b"], "json": r["json"]}
    return out


def decode_spans(payloads: dict[int, pa.Table]) -> list[dict]:
    """OTAP payload set -> engine span rows (driver-side inverse,
    used by the golden round-trip tests)."""
    main = payloads[SPANS].to_pylist()
    events = (payloads.get(SPAN_EVENTS).to_pylist()
              if SPAN_EVENTS in payloads else [])
    links = (payloads.get(SPAN_LINKS).to_pylist()
             if SPAN_LINKS in payloads else [])
    rows = []
    for m in main:
        i = m["id"]
        row = {k: m.get(k) for k in _MAIN_COLS[2:]}
        row["attributes"] = _attrs_of(payloads.get(SPAN_ATTRS), i)
        row["resource_attributes"] = _attrs_of(
            payloads.get(RESOURCE_ATTRS), m["resource_id"])
        evs = [
            {"time_unix_nano": e["time_unix_nano"], "name": e["name"],
             "attributes": _attrs_of(payloads.get(SPAN_EVENT_ATTRS),
                                     e["id"]),
             "dropped_attributes_count": e["dropped_attributes_count"]}
            for e in events if e["parent_id"] == i]
        lks = [
            {"trace_id": x["trace_id"], "span_id": x["span_id"],
             "trace_state": x["trace_state"],
             "attributes": _attrs_of(payloads.get(SPAN_LINK_ATTRS),
                                     x["id"]),
             "dropped_attributes_count": x["dropped_attributes_count"]}
            for x in links if x["parent_id"] == i]
        # proto3 repeated fields make empty == absent on the wire, so
        # decoding normalizes no-children to None (pdata-faithful)
        row["events"] = evs or None
        row["links"] = lks or None
        rows.append(row)
    return rows


def assemble_spans_df(spark, tables: dict[int, "object"]):
    """SPARK-side OTAP reassembly: the payload DataFrames join back into
    nested SPAN-shaped rows.  Each satellite is ONE hash join on its
    parent id + a collect_list aggregation — flat-to-nested is exactly
    the shape Catalyst optimizes, which is why OTAP is the natural wire
    format for a Spark engine.

    ``tables`` maps payload type -> DataFrame (e.g. read from the Arrow
    stream spool).  Returns a DataFrame with attributes/resource
    attributes as maps of the engine's tagged struct and events/links
    re-nested.
    """
    from pyspark.sql import functions as F

    def as_map(df):
        entry = F.struct(F.col("s"), F.col("i"), F.col("d"), F.col("b"),
                         F.col("json"))
        return (df.groupBy("parent_id")
                  .agg(F.map_from_entries(
                      F.collect_list(F.struct(F.col("key"), entry)))
                      .alias("m")))

    main = tables[SPANS]
    out = main
    sa = tables.get(SPAN_ATTRS)
    if sa is not None:
        out = (out.join(as_map(sa).withColumnRenamed("parent_id", "id"),
                        "id", "left")
                  .withColumnRenamed("m", "attributes"))
    ra = tables.get(RESOURCE_ATTRS)
    if ra is not None:
        rmap = as_map(ra).withColumnRenamed("parent_id", "resource_id")
        out = (out.join(rmap, "resource_id", "left")
                  .withColumnRenamed("m", "resource_attributes"))
    ev = tables.get(SPAN_EVENTS)
    if ev is not None:
        ea = tables.get(SPAN_EVENT_ATTRS)
        if ea is not None:
            ev = (ev.join(as_map(ea).withColumnRenamed("parent_id", "id"),
                          "id", "left")
                    .withColumnRenamed("m", "attributes"))
        nested = (ev.groupBy("parent_id")
                    .agg(F.collect_list(F.struct(
                        "time_unix_nano", "name", "attributes",
                        "dropped_attributes_count")).alias("events"))
                    .withColumnRenamed("parent_id", "id"))
        out = out.join(nested, "id", "left")
    lk = tables.get(SPAN_LINKS)
    if lk is not None:
        la = tables.get(SPAN_LINK_ATTRS)
        if la is not None:
            lk = (lk.join(as_map(la).withColumnRenamed("parent_id", "id"),
                          "id", "left")
                    .withColumnRenamed("m", "attributes"))
        nested_lk = (lk.groupBy("parent_id")
                       .agg(F.collect_list(F.struct(
                           "trace_id", "span_id", "trace_state",
                           "attributes",
                           "dropped_attributes_count")).alias("links"))
                       .withColumnRenamed("parent_id", "id"))
        out = out.join(nested_lk, "id", "left")
    return out


# ---------------------------------------------------------------------------
# logs (LOGS=30 / LOG_ATTRS=31; same parent-id pattern as spans)
# ---------------------------------------------------------------------------

LOGS = 30
LOG_ATTRS = 31

_LOG_COLS = [
    "time_unix_nano", "observed_time_unix_nano", "trace_id", "span_id",
    "flags", "severity_number", "severity_text",
    "dropped_attributes_count", "scope_name", "scope_version",
]


def encode_logs(rows: list[dict]) -> list[tuple[str, int, pa.Table]]:
    """Engine log rows -> OTAP payload set: main table (tagged body
    flattened to body_* columns), LOG_ATTRS + deduplicated
    RESOURCE_ATTRS keyed by parent ids."""
    main, lattrs, rattrs = [], [], []
    res_ids: dict[str, int] = {}
    for i, r in enumerate(rows):
        rkey = repr(sorted((r.get("resource_attributes") or {}).items()))
        if rkey not in res_ids:
            res_ids[rkey] = len(res_ids)
            _attr_rows(res_ids[rkey], r.get("resource_attributes"), rattrs)
        body = r.get("body") or {}
        main.append({"id": i, "resource_id": res_ids[rkey],
                     **{k: r.get(k) for k in _LOG_COLS},
                     **{f"body_{a}": body.get(a)
                        for a in ("s", "i", "d", "b", "json")}})
        _attr_rows(i, r.get("attributes"), lattrs)
    return [("logs", LOGS, pa.Table.from_pylist(main)),
            ("resource-attrs", RESOURCE_ATTRS, _attr_table(rattrs)),
            ("log-attrs", LOG_ATTRS, _attr_table(lattrs))]


def decode_logs(payloads: dict[int, pa.Table]) -> list[dict]:
    """OTAP payload set -> engine log rows (golden inverse)."""
    rows = []
    for m in payloads[LOGS].to_pylist():
        i = m["id"]
        row = {k: m.get(k) for k in _LOG_COLS}
        row["body"] = {a: m.get(f"body_{a}")
                       for a in ("s", "i", "d", "b", "json")}
        row["attributes"] = _attrs_of(payloads.get(LOG_ATTRS), i)
        row["resource_attributes"] = _attrs_of(
            payloads.get(RESOURCE_ATTRS), m["resource_id"])
        rows.append(row)
    return rows


# ---------------------------------------------------------------------------
# metrics (UNIVARIATE_METRICS=10 + per-type datapoint/attr/exemplar tables)
# ---------------------------------------------------------------------------

UNIVARIATE_METRICS = 10
NUMBER_DATA_POINTS = 11
SUMMARY_DATA_POINTS = 12
HISTOGRAM_DATA_POINTS = 13
EXP_HISTOGRAM_DATA_POINTS = 14
NUMBER_DP_ATTRS = 15
SUMMARY_DP_ATTRS = 16
HISTOGRAM_DP_ATTRS = 17
EXP_HISTOGRAM_DP_ATTRS = 18
NUMBER_DP_EXEMPLARS = 19
HISTOGRAM_DP_EXEMPLARS = 20
EXP_HISTOGRAM_DP_EXEMPLARS = 21
NUMBER_DP_EXEMPLAR_ATTRS = 22
HISTOGRAM_DP_EXEMPLAR_ATTRS = 23
EXP_HISTOGRAM_DP_EXEMPLAR_ATTRS = 24

#: metric_type (pmetric/metric_type.go) -> datapoint/attr/exemplar
#: payload-type triple; gauge(1) and sum(2) share NumberDataPoint.
_DP_FAMILY = {
    1: (NUMBER_DATA_POINTS, NUMBER_DP_ATTRS, NUMBER_DP_EXEMPLARS),
    2: (NUMBER_DATA_POINTS, NUMBER_DP_ATTRS, NUMBER_DP_EXEMPLARS),
    3: (HISTOGRAM_DATA_POINTS, HISTOGRAM_DP_ATTRS,
        HISTOGRAM_DP_EXEMPLARS),
    4: (EXP_HISTOGRAM_DATA_POINTS, EXP_HISTOGRAM_DP_ATTRS,
        EXP_HISTOGRAM_DP_EXEMPLARS),
    5: (SUMMARY_DATA_POINTS, SUMMARY_DP_ATTRS, None),
}
_EX_ATTRS = {NUMBER_DP_EXEMPLARS: NUMBER_DP_EXEMPLAR_ATTRS,
             HISTOGRAM_DP_EXEMPLARS: HISTOGRAM_DP_EXEMPLAR_ATTRS,
             EXP_HISTOGRAM_DP_EXEMPLARS: EXP_HISTOGRAM_DP_EXEMPLAR_ATTRS}

_DESC_COLS = ("metric_name", "description", "unit", "metric_type",
              "aggregation_temporality", "is_monotonic",
              "scope_name", "scope_version")
_DP_COLS = {
    NUMBER_DATA_POINTS: ("start_time_unix_nano", "time_unix_nano",
                         "value_int", "value_double", "flags"),
    SUMMARY_DATA_POINTS: ("start_time_unix_nano", "time_unix_nano",
                          "count", "sum", "quantile_values", "flags"),
    HISTOGRAM_DATA_POINTS: ("start_time_unix_nano", "time_unix_nano",
                            "count", "sum", "min", "max",
                            "bucket_counts", "explicit_bounds", "flags"),
    EXP_HISTOGRAM_DATA_POINTS: (
        "start_time_unix_nano", "time_unix_nano", "count", "sum", "min",
        "max", "scale", "zero_count", "positive_offset",
        "positive_bucket_counts", "negative_offset",
        "negative_bucket_counts", "flags"),
}


def encode_metrics(rows: list[dict]) -> list[tuple[str, int, pa.Table]]:
    """Engine metric datapoint rows -> the OTAP metric payload set: a
    deduplicated metric-descriptor main table, one datapoint table per
    point family (number/summary/histogram/exp-histogram), attr tables
    keyed by datapoint id, exemplar tables + their filtered-attr tables
    keyed by exemplar id, and deduplicated RESOURCE_ATTRS."""
    descs: dict[tuple, int] = {}
    res_ids: dict[str, int] = {}
    main, rattrs = [], []
    dps: dict[int, list] = {}
    dattrs: dict[int, list] = {}
    exemplars: dict[int, list] = {}
    exattrs: dict[int, list] = {}
    dp_seq = ex_seq = 0
    for r in rows:
        mtype = r["metric_type"]
        if mtype not in _DP_FAMILY:
            raise ValueError(f"metric_type {mtype} not encodable")
        rkey = repr(sorted((r.get("resource_attributes") or {}).items()))
        if rkey not in res_ids:
            res_ids[rkey] = len(res_ids)
            _attr_rows(res_ids[rkey], r.get("resource_attributes"), rattrs)
        dkey = tuple(r.get(c) for c in _DESC_COLS) + (res_ids[rkey],)
        if dkey not in descs:
            descs[dkey] = len(descs)
            main.append({"id": descs[dkey],
                         "resource_id": res_ids[rkey],
                         **{c: r.get(c) for c in _DESC_COLS}})
        dpt, dat, ext = _DP_FAMILY[mtype]
        dp_id = dp_seq
        dp_seq += 1
        dps.setdefault(dpt, []).append(
            {"id": dp_id, "parent_id": descs[dkey],
             **{c: r.get(c) for c in _DP_COLS[dpt]}})
        _attr_rows(dp_id, r.get("attributes"), dattrs.setdefault(dat, []))
        for ex in (r.get("exemplars") or []) if ext is not None else []:
            exemplars.setdefault(ext, []).append(
                {"id": ex_seq, "parent_id": dp_id,
                 "time_unix_nano": ex.get("time_unix_nano"),
                 "value_int": ex.get("value_int"),
                 "value_double": ex.get("value_double"),
                 "span_id": ex.get("span_id"),
                 "trace_id": ex.get("trace_id")})
            _attr_rows(ex_seq, ex.get("filtered_attributes"),
                       exattrs.setdefault(_EX_ATTRS[ext], []))
            ex_seq += 1
    out = [("metrics", UNIVARIATE_METRICS, pa.Table.from_pylist(main)),
           ("resource-attrs", RESOURCE_ATTRS, _attr_table(rattrs))]
    for dpt, lst in sorted(dps.items()):
        out.append((f"dp-{dpt}", dpt, pa.Table.from_pylist(lst)))
    for dat, lst in sorted(dattrs.items()):
        out.append((f"dp-attrs-{dat}", dat, _attr_table(lst)))
    for ext, lst in sorted(exemplars.items()):
        out.append((f"exemplars-{ext}", ext, pa.Table.from_pylist(lst)))
    for eat, lst in sorted(exattrs.items()):
        out.append((f"exemplar-attrs-{eat}", eat, _attr_table(lst)))
    return out


def decode_metrics(payloads: dict[int, pa.Table]) -> list[dict]:
    """OTAP metric payload set -> engine datapoint rows (golden
    inverse; absent columns decode as None, absent children as None —
    the proto3 empty==absent normalization)."""
    descs = {m["id"]: m for m in payloads[UNIVARIATE_METRICS].to_pylist()}
    ex_by_dp: dict[int, dict[int, list]] = {}
    for ext, eat in _EX_ATTRS.items():
        if ext not in payloads:
            continue
        for ex in payloads[ext].to_pylist():
            exd = {"filtered_attributes":
                       _attrs_of(payloads.get(eat), ex["id"]),
                   "time_unix_nano": ex["time_unix_nano"],
                   "value_int": ex["value_int"],
                   "value_double": ex["value_double"],
                   "span_id": ex["span_id"], "trace_id": ex["trace_id"]}
            ex_by_dp.setdefault(ext, {}).setdefault(
                ex["parent_id"], []).append(exd)
    all_cols = set().union(*(set(c) for c in _DP_COLS.values()))
    rows = []
    for dpt, dat, ext in set(_DP_FAMILY.values()):
        if dpt not in payloads:
            continue
        for dp in payloads[dpt].to_pylist():
            m = descs[dp["parent_id"]]
            row = {c: m.get(c) for c in _DESC_COLS}
            row["resource_attributes"] = _attrs_of(
                payloads.get(RESOURCE_ATTRS), m["resource_id"])
            row.update({c: None for c in all_cols})
            row.update({c: dp.get(c) for c in _DP_COLS[dpt]})
            row["attributes"] = _attrs_of(payloads.get(dat), dp["id"])
            exs = (ex_by_dp.get(ext, {}).get(dp["id"])
                   if ext is not None else None)
            row["exemplars"] = exs or None
            rows.append(row)
    return rows
