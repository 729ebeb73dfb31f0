"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry through Spark and its
``oracle_sql()`` twin through DuckDB on the same sf dir, then compares
row-count + column names + order-insensitive value multiset (columns sorted
by name, values stringified).  Usage:

    python tools/check_parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 12.0 -> "12" so float/decimal widths agree
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_value(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from otel_arrow_collector_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"  WEAK  {name}: rows={len(srows)} (no oracle)")
            n_weak += 1
            continue
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        s_norm, d_norm = norm_rows(scols, srows), norm_rows(dcols, drows)
        ok_rows = len(srows) == len(drows)
        ok_vals = s_norm == d_norm
        if ok_cols and ok_rows and ok_vals:
            print(f"  PASS  {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  FAIL  {name}: cols={ok_cols} rowcount={ok_rows} "
                  f"({len(srows)} vs {len(drows)}) values={ok_vals}")
            if not ok_cols:
                print(f"        spark cols: {sorted(scols)}")
                print(f"        duck  cols: {sorted(dcols)}")
            if ok_cols and not ok_vals:
                diff_s = [r for r in s_norm if r not in set(d_norm)][:3]
                diff_d = [r for r in d_norm if r not in set(s_norm)][:3]
                print(f"        spark-only: {diff_s}")
                print(f"        duck-only : {diff_d}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_weak} weak ({sf_dir})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
