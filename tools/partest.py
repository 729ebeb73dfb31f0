"""Parallel test runner — pytest-xdist substitute for this container.

Shards the test files across N worker subprocesses (each worker gets its
own JVM-backed SparkSession, so workers never contend on the single
per-process session that ``tests/conftest.py`` maintains).  Files are
assigned greedily largest-expected-first onto the least-loaded worker,
using the measured per-file wall times baked in below (re-measure with
``--durations``-style timing and update when the suite shifts; unknown
files fall back to a size-based estimate).

Usage::

    python tools/partest.py            # 4 workers
    python tools/partest.py -j 6       # 6 workers
    python tools/partest.py -j 1       # serial (same as plain pytest)

Exit code is non-zero if any shard fails; each shard's tail is printed.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# measured wall seconds (round 5, 8-way concurrent runs — relative
# weights are what matters for balancing, not absolute values)
KNOWN_COSTS = {
    "test_declared_parity.py": 162,
    "test_llm_ops.py": 148,
    "test_streaming_temporality.py": 134,
    "test_codec_properties.py": 122,
    "test_scraper_and_arrow_egress.py": 116,
    "test_streaming_joins.py": 98,
    "test_http_receiver.py": 58,
    "test_streaming.py": 56,
    "test_tls.py": 40,
    "test_grpc.py": 38,
    "test_pipeline_graph.py": 35,
    "test_metric_semantics.py": 30,
    "test_loader.py": 25,
    "test_codecs.py": 25,
    "test_pb_codec.py": 25,
    "test_advice_r4.py": 23,
    "test_egress.py": 23,
    "test_collector_lifecycle.py": 21,
    "test_plan_quality.py": 20,
}


def shard(files: list[str], n: int) -> list[list[str]]:
    def cost(f: str) -> float:
        base = os.path.basename(f)
        if base in KNOWN_COSTS:
            return KNOWN_COSTS[base]
        return max(1.0, os.path.getsize(f) / 2000.0)

    buckets: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in sorted(files, key=cost, reverse=True):
        i = min(range(n), key=lambda k: buckets[k][0])
        buckets[i] = (buckets[i][0] + cost(f), buckets[i][1] + [f])
    return [b[1] for b in buckets if b[1]]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", "--jobs", type=int, default=4)
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    shards = shard(files, max(1, args.jobs))
    t0 = time.time()
    procs = []
    for i, fs in enumerate(shards):
        env = dict(os.environ)
        # one Spark UI/driver per worker; distinct derby dirs avoid lock
        # collisions between concurrent JVMs
        env["SPARK_LOCAL_DIRS"] = f"/tmp/partest-{os.getpid()}-{i}"
        cmd = [sys.executable, "-m", "pytest", "-q", *args.pytest_args, *fs]
        procs.append((i, fs, subprocess.Popen(
            cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)))

    failed = False
    for i, fs, p in procs:
        out = p.communicate()[0].decode(errors="replace")
        tail = "\n".join(out.strip().splitlines()[-3:])
        status = "ok" if p.returncode == 0 else f"FAIL rc={p.returncode}"
        print(f"-- shard {i} ({len(fs)} files): {status}\n{tail}\n")
        if p.returncode != 0:
            failed = True
            print(out)
    print(f"== total wall {time.time() - t0:.0f}s over {len(shards)} shards")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
