"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry through Spark and its
``oracle_sql()`` twin through DuckDB on the same sf dir, then compares
row-count + column names + order-insensitive value multiset (columns sorted
by name, values stringified).  Usage:

    python tools/check_parity.py [--ansi] [sf_dir] [query_name ...]

``--ansi`` runs the raw query registry under ``spark.sql.ansi.enabled=true``
(the PySpark 4.x default the driver session starts with before ``_prepare``
flips it off).  Non-ANSI mode silently WRAPS integer overflow; ANSI mode
throws — so this sweep turns any silent-wrong-arithmetic divergence into a
loud local failure (the round-9 theta-hash bug class).  It bypasses the
``queries()`` wrapper because ``_prepare`` pins ansi=false.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")


def main() -> int:
    argv = list(sys.argv[1:])
    ansi = "--ansi" in argv
    if ansi:
        argv.remove("--ansi")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e
    from otel_arrow_collector_spark.oracle import compare, register_duckdb_views
    from otel_arrow_collector_spark.session import get_spark

    spark = get_spark("parity-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)

    if ansi:
        from otel_arrow_collector_spark.operators import collect_registry
        raw, oracles = collect_registry()
        qs = dict(raw)
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("== ANSI sweep: spark.sql.ansi.enabled=true ==")
    else:
        qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        if name not in oracles:
            print(f"  WEAK  {name}: rows={sdf.count()} (no oracle)")
            n_weak += 1
            continue
        r = compare(sdf, con, oracles[name])
        if (r["cols_match"] and r["rowcount_match"] and r["values_match"]
                and r["dtype_match"]):
            print(f"  PASS  {name} ({r['spark_rows']} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  FAIL  {name}: cols={r['cols_match']} "
                  f"rowcount={r['rowcount_match']} "
                  f"({r['spark_rows']} vs {r['duck_rows']}) "
                  f"values={r['values_match']} dtypes={r['dtype_match']}")
            if not r["cols_match"]:
                print(f"        spark cols: {r['spark_cols']}")
                print(f"        duck  cols: {r['duck_cols']}")
            if not r["dtype_match"]:
                print(f"        dtype diff (spark, duck): {r['dtype_diff']}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_weak} weak ({sf_dir})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
