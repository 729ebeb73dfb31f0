"""OTTL-lite: the reference's planned transform language surface
(docs/processing.md:147-214 — field paths like ``attributes["http.target"]``
and ops ``set``, ``delete``, ``keep_keys``, ``replace_match``,
``truncate_all``, ``drop() where <predicate>``) re-expressed as Spark
Column operations.

Two layers:
- map-column helpers (``map_put`` / ``map_delete`` / ``keep_keys`` / ...)
  for the attribute maps of the telemetry data model
  (pdata/pcommon/map.go:53-186 Get/Put*/Remove/RemoveIf);
- ``apply_ottl(df, cfg)`` — a declarative statement block used by the
  pipeline compiler's ``transform`` processor.

Everything is built-in-function composition (map_filter / map_concat /
transform_values / regexp_replace) — no Python UDFs, so transforms stay in
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------- map-column helpers ---------------------------

def map_put(attrs: Column, key: str, value: Column) -> Column:
    """Upsert one key (last-write-wins, Map.PutStr/PutInt...,
    pdata/pcommon/map.go:98-186).

    A NULL map behaves like the reference's zero-value Map: Put creates
    the entry (map_filter/map_concat would otherwise propagate NULL and
    silently drop the write)."""
    entry = F.create_map(F.lit(key), value)
    return F.when(attrs.isNull(), entry).otherwise(
        F.map_concat(F.map_filter(attrs, lambda k, _: k != F.lit(key)),
                     entry))


def map_delete(attrs: Column, *keys: str) -> Column:
    """Remove keys (Map.Remove / RemoveIf, pdata/pcommon/map.go:65-96)."""
    arr = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(attrs, lambda k, _: ~F.array_contains(arr, k))


def keep_keys(attrs: Column, *keys: str) -> Column:
    """Keep only the named keys (OTTL keep_keys, processing.md:200)."""
    arr = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(attrs, lambda k, _: F.array_contains(arr, k))


def replace_match(col: Column, pattern: str, replacement: str) -> Column:
    """Regex value rewrite (OTTL replace_match, processing.md:171-176)."""
    return F.regexp_replace(col, pattern, replacement)


def truncate_all(attrs: Column, limit: int) -> Column:
    """Truncate every string value in a map to ``limit`` chars
    (OTTL truncate_all)."""
    return F.transform_values(attrs, lambda _, v: F.substring(v, 1, limit))


def limit_attributes(attrs: Column, max_entries: int,
                     priority: tuple = ()) -> Column:
    """OTTL ``limit()``: cap a map at ``max_entries`` entries, always
    keeping the ``priority`` keys, then the lexicographically smallest
    remaining keys.  The reference's limit() keeps whatever its map
    iteration order yields first (ottlfuncs limit); a total order makes
    the cap DETERMINISTIC — required for the oracle/equivalence gates.
    """
    pri = (F.array(*[F.lit(k) for k in priority]) if priority
           else F.expr("CAST(array() AS ARRAY<STRING>)"))

    def rank(e):
        return F.when(F.array_contains(pri, e["key"]), 0).otherwise(1)

    def cmp(l, r):  # noqa: E741
        return (F.when(rank(l) < rank(r), -1)
                 .when(rank(l) > rank(r), 1)
                 .when(l["key"] < r["key"], -1)
                 .when(l["key"] > r["key"], 1)
                 .otherwise(0))

    entries = F.array_sort(F.map_entries(attrs), cmp)
    return F.map_from_entries(F.slice(entries, 1, max_entries))


def explode_attributes(df: DataFrame, col: str = "attributes",
                       keep: list[str] | None = None) -> DataFrame:
    """Map.Range analogue (pdata/pcommon/map.go:199-207): one row per
    attribute entry with its type tag — the queryable form of the dynamic
    attribute surface (``SELECT ... WHERE key='http.status' AND i >= 500``).

    ``keep`` names identity columns to carry along (default: none).
    """
    keep = keep or []
    typed = F.expr(
        "CASE WHEN e.value.s IS NOT NULL THEN 'str' "
        "WHEN e.value.i IS NOT NULL THEN 'int' "
        "WHEN e.value.d IS NOT NULL THEN 'double' "
        "WHEN e.value.b IS NOT NULL THEN 'bool' "
        "WHEN e.value.json IS NOT NULL THEN 'json' ELSE 'empty' END")
    return (df.select(*keep, F.explode(F.map_entries(F.col(col))).alias("e"))
              .select(*keep,
                      F.col("e.key").alias("key"), typed.alias("value_type"),
                      F.col("e.value.s").alias("s"),
                      F.col("e.value.i").alias("i"),
                      F.col("e.value.d").alias("d"),
                      F.col("e.value.b").alias("b"),
                      F.col("e.value.json").alias("json")))


# --------------------------- W3C tracestate -------------------------------
#
# The reference stores tracestate as an opaque string with raw get/set
# (pdata/pcommon/trace_state.go:17-44); these helpers add W3C list-member
# operations (https://www.w3.org/TR/trace-context/#tracestate-header):
# comma-separated `key=value` members, most-recently-updated first.

def _ts_members(ts: Column) -> Column:
    """tracestate -> array of trimmed non-empty `key=value` members."""
    return F.filter(F.transform(F.split(ts, ","), lambda m: F.trim(m)),
                    lambda m: m != "")


def trace_state_get(ts: Column, key: str) -> Column:
    """Value of a tracestate member, NULL when absent (W3C lookup)."""
    entry = F.element_at(
        F.filter(_ts_members(ts), lambda m: m.startswith(key + "=")), 1)
    return F.substring(entry, len(key) + 2, 2147483647)


def trace_state_put(ts: Column, key: str, value) -> Column:
    """Upsert a member: W3C mutation semantics — the updated member moves
    to the FRONT of the list; other members keep relative order.  Works on
    NULL/empty tracestate (creates the list)."""
    val = F.lit(value) if isinstance(value, str) else value
    others = F.filter(_ts_members(ts), lambda m: ~m.startswith(key + "="))
    return F.array_join(
        F.concat(F.array(F.concat(F.lit(key + "="), val)),
                 F.coalesce(others, F.array().cast("array<string>"))),
        ",")


def trace_state_delete(ts: Column, key: str) -> Column:
    """Remove a member; remaining members keep order.  Empty result is the
    empty string (an absent tracestate header)."""
    return F.coalesce(
        F.array_join(
            F.filter(_ts_members(ts), lambda m: ~m.startswith(key + "=")),
            ","),
        F.lit(""))


# --------------------------- path compiler --------------------------------
#
# OTTL field paths (processing.md:147-165) against the flattened row model:
#   attributes["http.target"]          -> attributes map entry
#   resource.attributes["host.name"]   -> resource_attributes map entry
#   status.code / status.message       -> status_code / status_message cols
#   scope.name / scope.version         -> scope_name / scope_version cols
#   name, kind, trace_id, ...          -> plain columns

import re as _re

_ATTR_PATH = _re.compile(
    r'^(?:(resource)\.)?attributes\["((?:[^"\\]|\\.)*)"\]$')
_DOTTED = {"status.code": "status_code", "status.message": "status_message",
           "scope.name": "scope_name", "scope.version": "scope_version"}


class PathError(ValueError):
    """Unparseable OTTL field path."""


def _parse_path(path: str) -> tuple[str, str, str | None]:
    """-> (kind, column, map_key): kind 'attr' or 'column'."""
    m = _ATTR_PATH.match(path.strip())
    if m:
        col = "resource_attributes" if m.group(1) else "attributes"
        return "attr", col, m.group(2).replace('\\"', '"')
    p = path.strip()
    if p in _DOTTED:
        return "column", _DOTTED[p], None
    if _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", p):
        return "column", p, None
    raise PathError(f"cannot parse OTTL path {path!r}")


def get_path(path: str) -> Column:
    """Read a field path as a Column.  Attribute entries resolve to their
    string arm (`.s`) — the common OTTL comparison/assignment type; use
    the raw map column directly for typed access."""
    kind, col, key = _parse_path(path)
    if kind == "column":
        return F.col(col)
    return F.col(col)[key]["s"]


def _attr_struct(value: Column) -> Column:
    """Wrap a string-valued Column as the engine's tagged attr struct."""
    return F.struct(
        value.cast("string").alias("s"),
        F.lit(None).cast("bigint").alias("i"),
        F.lit(None).cast("double").alias("d"),
        F.lit(None).cast("boolean").alias("b"),
        F.lit(None).cast("string").alias("json"))


def set_path(df: DataFrame, path: str, value) -> DataFrame:
    """OTTL ``set(path, value)``: value is a Column or SQL expr string.
    Attribute-map targets upsert (last-write-wins, map.go:98-186)."""
    v = F.expr(value) if isinstance(value, str) else value
    kind, col, key = _parse_path(path)
    if kind == "column":
        return df.withColumn(col, v)
    return df.withColumn(col, map_put(F.col(col), key, _attr_struct(v)))


def delete_path(df: DataFrame, path: str) -> DataFrame:
    """OTTL ``delete(path)`` for attribute entries; whole columns are
    dropped."""
    kind, col, key = _parse_path(path)
    if kind == "column":
        return df.drop(col)
    return df.withColumn(col, map_delete(F.col(col), key))


# --------------------------- statement block ------------------------------

def apply_ottl(df: DataFrame, cfg: dict) -> DataFrame:
    """Apply a declarative OTTL-lite statement block to a DataFrame.

    Supported keys (applied in this order, mirroring a statement list):
    - ``where``:   str — pre-filter, ``drop() where NOT (...)`` dual
    - ``set``:     {column: sql_expr} — OTTL set()
    - ``rename``:  {old: new}
    - ``delete``:  [column, ...] — OTTL delete()
    - ``keep``:    [column, ...] — OTTL keep_keys() at record level
    - ``replace_match``: [{column, pattern, replacement}, ...]
    - ``truncate``: {column: max_len}
    - ``truncate_all``: {map_column: max_len} — OTTL truncate_all() on
      every value of an attribute map
    - ``limit``: [{column, max, keep: [priority keys]}, ...] — OTTL
      limit() with a deterministic total order
    """
    if "where" in cfg:
        df = df.filter(cfg["where"])
    for col, expr in (cfg.get("set") or {}).items():
        df = df.withColumn(col, F.expr(expr))
    for path, expr in (cfg.get("set_path") or {}).items():
        df = set_path(df, path, expr)      # OTTL set() on field paths
    for path in cfg.get("delete_path") or []:
        df = delete_path(df, path)         # OTTL delete() on field paths
    for old, new in (cfg.get("rename") or {}).items():
        df = df.withColumnRenamed(old, new)
    if cfg.get("delete"):
        df = df.drop(*cfg["delete"])
    if cfg.get("keep"):
        df = df.select(*cfg["keep"])
    for rm in cfg.get("replace_match") or []:
        df = df.withColumn(rm["column"],
                           replace_match(F.col(rm["column"]),
                                         rm["pattern"], rm["replacement"]))
    for col, limit in (cfg.get("truncate") or {}).items():
        df = df.withColumn(col, F.substring(F.col(col), 1, int(limit)))
    for col, limit in (cfg.get("truncate_all") or {}).items():
        df = df.withColumn(col, truncate_all(F.col(col), int(limit)))
    for lm in cfg.get("limit") or []:
        df = df.withColumn(lm["column"],
                           limit_attributes(F.col(lm["column"]),
                                            int(lm["max"]),
                                            tuple(lm.get("keep") or ())))
    return df
