"""Dump .explain("formatted") for named queries into a directory.

    python tools/dump_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: the
round's optimization target set when no names given).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    from otel_arrow_collector_spark.operators import collect_registry
    from otel_arrow_collector_spark.session import get_spark
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect_registry()
    if not names:
        names = sorted(queries)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        lines = plan.splitlines(keepends=True)
        if len(lines) > 2400:
            # a 100k-line plan IS the finding; keep an excerpt plus the
            # full size so the file stays reviewable and committable
            plan = "".join(
                lines[:2000]
                + [f"\n... EXCERPT: {len(lines)} total lines "
                   f"({sum(map(len, lines))} bytes) — middle elided ...\n\n"]
                + lines[-400:])
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name)


if __name__ == "__main__":
    main()
