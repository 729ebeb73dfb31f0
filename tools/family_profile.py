"""Generic two-run family adjudication tool (the bench-noise protocol:
HIST_PROFILE_r13 / PB_PROFILE_r12 discipline, generalized).  Times the
named queries at sf0.1 (min-of-2 per query, bench.py discipline) in
ISOLATION — not adjacent to 260 other queries, so a host-noise window
cannot hit a whole alphabetically-adjacent family at once the way the
full-suite sorted sweep allows.

Usage: python tools/family_profile.py q110_corr_screen q112_...
       -> prints one JSON line {name: best_sec, ...}
Run it TWICE in independent processes a few seconds apart; only a
slowdown present in BOTH runs is real.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: family_profile.py <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from otel_arrow_collector_spark.operators import collect_registry
    from otel_arrow_collector_spark.session import get_spark
    spark = get_spark("family-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect_registry()
    # warm-up outside the timed region (bench.py discipline)
    spark.range(1).count()
    queries["q05_groupby"](spark, sf_dir).collect()
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
