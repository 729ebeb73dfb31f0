"""Oracle-comparison utilities (driver correctness-gate replica).

The driver compares each engine query against its DuckDB oracle by
row-count + column names + order-insensitive value multiset with columns
sorted by name.  These helpers implement that comparison for local tests
(tools/check_parity.py and tests/).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os


def norm_value(v) -> str:
    """Normalize one cell to a TYPE-TAGGED comparison string.

    The driver's value-hash is type/representation-sensitive: in r15 a
    query publishing decimal(38,0) in both engines failed the driver
    hash while this function's untagged stringification (int 12, float
    12.0 and Decimal('12') all -> "12") declared 271/271 parity — the
    laxness masked exactly the class it was built to catch.  Every
    value is therefore tagged with its Python type family so a
    cross-engine numeric-flavor divergence fails LOUDLY locally:

    - int (Spark LONG / DuckDB BIGINT, HUGEINT) -> ``i:``
    - float (DOUBLE/REAL)                       -> ``f:``
    - decimal.Decimal (DECIMAL of either engine)-> ``d:`` with the raw
      str() so exponent/trailing-zero representation differences also
      diverge, as the driver hash demonstrated they do
    - everything else gets a family prefix as below

    A query can only pass the driver's hash when both engines return
    the same types, so the tags cannot false-fail a driver-green query
    as long as both clients (pyspark collect, duckdb fetchall) map SQL
    types to Python the same way here as in the driver — they do, both
    gates use the same two client libraries.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "b:true" if v else "b:false"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"  # 12.0 == 12.00: scale-free within float
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{v.hex()}"
    return f"s:{v}"


#: integer widths are compared EXACTLY (the driver's value-hash is
#: width-sensitive there — DuckDB HUGEINT vs Spark LONG broke q34 in r01);
#: non-integer types collapse to a family so float/decimal/timestamp
#: flavor differences that the driver tolerates don't false-fail locally.
_INT_WIDTHS = {
    # Spark simpleString names
    "tinyint": "int8", "smallint": "int16", "int": "int32",
    "integer": "int32", "bigint": "int64",
    # DuckDB DESCRIBE names
    "utinyint": "uint8", "usmallint": "uint16", "uinteger": "uint32",
    "ubigint": "uint64", "hugeint": "int128", "uhugeint": "uint128",
}


def canon_type(t: str) -> str:
    """Canonicalize a Spark dtype / DuckDB column_type string.

    Integer widths stay distinct; everything else becomes a coarse
    family tag (float, decimal, str, ...)."""
    s = t.strip().lower()
    if s in _INT_WIDTHS:
        return _INT_WIDTHS[s]
    if s.startswith(("array<", "list<")) or s.endswith("[]"):
        return "list"
    if s.startswith(("struct", "row", "map")):
        return "nested"
    if s.startswith("decimal"):
        return "decimal"
    if s in ("float", "real", "float4"):
        return "float"
    if s in ("double", "float8"):
        return "float"
    if s in ("varchar", "string", "text"):
        return "str"
    if s.startswith("timestamp"):
        return "timestamp"
    if s in ("blob", "binary", "bytea", "varbinary"):
        return "bytes"
    if s in ("boolean", "bool"):
        return "bool"
    return s


def dtype_report(spark_df, con, oracle: str) -> dict:
    """Per-column canonical-type comparison between engine and oracle."""
    stypes = {name: canon_type(t) for name, t in spark_df.dtypes}
    dtypes = {}
    try:
        for row in con.execute(f"DESCRIBE {oracle}").fetchall():
            dtypes[row[0]] = canon_type(row[1])
    except Exception:  # DESCRIBE unsupported for this statement shape
        return {"dtype_match": True, "dtype_diff": {}}
    diff = {c: (stypes.get(c), dtypes.get(c))
            for c in set(stypes) | set(dtypes)
            if stypes.get(c) != dtypes.get(c)}
    return {"dtype_match": not diff, "dtype_diff": diff}


def norm_rows(cols: list[str], rows) -> list[tuple[str, ...]]:
    """Sort columns by name, stringify values, sort rows -> comparable form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_value(r[i]) for i in order) for r in rows)


def register_duckdb_views(con, sf_dir: str) -> None:
    """Mirror the driver's pre-registered DuckDB views over the sf tables."""
    from .sources.tables import TABLE_NAMES
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def compare(spark_df, con, oracle: str) -> dict:
    """Run one engine DataFrame vs one DuckDB oracle; return match report."""
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    cur = con.execute(oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    rep = {
        "cols_match": sorted(scols) == sorted(dcols),
        "rowcount_match": len(srows) == len(drows),
        "values_match": norm_rows(scols, srows) == norm_rows(dcols, drows),
        "spark_rows": len(srows),
        "duck_rows": len(drows),
        "spark_cols": sorted(scols),
        "duck_cols": sorted(dcols),
    }
    rep.update(dtype_report(spark_df, con, oracle))
    return rep
