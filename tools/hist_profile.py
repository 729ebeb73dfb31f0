"""HIST_PROFILE adjudication (verdict r12 ask #1): two independent
processes, each timing the q36/q41/q42/q48 histogram family at sf0.1
(min-of-2 per query, same discipline as bench.py) in ISOLATION — i.e.
not adjacent to 259 other queries, so a host-noise window cannot hit
the whole family at once the way the full-suite sorted sweep allows.

Usage: python tools/hist_profile.py   -> prints one JSON line per run
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = ["q36_exp_histogram_merge", "q41_histogram_merge",
          "q42_histogram_quantile", "q48_exp_histogram_quantile"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from otel_arrow_collector_spark.operators import collect_registry
    from otel_arrow_collector_spark.session import get_spark
    spark = get_spark("hist-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect_registry()
    # warm-up outside the timed region (bench.py discipline)
    spark.range(1).count()
    queries["q05_groupby"](spark, sf_dir).collect()
    timings = {}
    for name in FAMILY:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
