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
    pdata/pcommon/map.go:98-186)."""
    return F.map_concat(
        F.map_filter(attrs, lambda k, _: k != F.lit(key)),
        F.create_map(F.lit(key), value))


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
    """
    if "where" in cfg:
        df = df.filter(cfg["where"])
    for col, expr in (cfg.get("set") or {}).items():
        df = df.withColumn(col, F.expr(expr))
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
    return df
