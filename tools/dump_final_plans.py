"""Dump the EXECUTED (post-AQE) plan for named queries.

    python tools/dump_final_plans.py <out_dir> <suffix> [query ...]

Unlike dump_plans.py (pre-execution explain), this runs each query once
and prints the AdaptiveSparkPlan's FINAL plan — the only place runtime
stage reuse (ReusedExchange / shared QueryStage ids) and AQE join
rewrites are visible, which is what the r16 duplicate-subtree claims
are about.
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
    spark = get_spark("dump-final-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect_registry()
    for name in names:
        df = queries[name](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        lines = plan.splitlines(keepends=True)
        if len(lines) > 2400:
            plan = "".join(lines[:2000]
                           + [f"\n... EXCERPT: {len(lines)} total lines "
                              f"— middle elided ...\n\n"] + lines[-400:])
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name)


if __name__ == "__main__":
    main()
