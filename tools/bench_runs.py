"""Two-run per-query timing with BOTH runs recorded (bench.py times
min-of-2; this tool keeps run1 and run2 separately so memo-build cost
and steady-state cost are distinguishable — guide §1 "measure first").

    python tools/bench_runs.py [out.json] [query ...]

Defaults to every registered query at $SPARK_GRAFT_SF_DIR (sf0.1).
Writes {"name": [run1_sec, run2_sec], ...} plus totals.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_runs.json"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from otel_arrow_collector_spark.operators import collect_registry
    from otel_arrow_collector_spark.session import get_spark
    spark = get_spark("bench-runs", extra_conf={
        "spark.driver.extraJavaOptions": "-Xlog:disable"})
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect_registry()
    if not names:
        names = sorted(queries)
    spark.range(1).count()
    queries["q05_groupby"](spark, sf_dir).collect()

    timings: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        runs = []
        for _ in range(2):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = runs
    total_min = round(sum(min(v) for v in timings.values()), 3)
    rec = {"queries": timings, "total_min_of_2": total_min,
           "total_run2": round(sum(v[1] for v in timings.values()), 3),
           "sf_dir": sf_dir}
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"total_min_of_2": total_min,
                      "n": len(timings), "out": out_path}))


if __name__ == "__main__":
    main()
