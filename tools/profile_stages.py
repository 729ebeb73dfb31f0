"""Per-stage empirical profile for named queries (guide §1 "empirical").

    python tools/profile_stages.py [query ...]

Runs each query twice (run2 = steady state, the number bench.py's
min-of-2 reports) with the Spark event log enabled, then maps jobs ->
stages and prints, per query run, each stage's wall time, task count,
and name — the stage-level answer to "where do the seconds go" that the
disabled UI would normally show.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="oacs-evlog-")
    from otel_arrow_collector_spark.operators import collect_registry
    from otel_arrow_collector_spark.session import get_spark
    spark = get_spark("profile-stages", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": evdir,
        "spark.driver.extraJavaOptions": "-Xlog:disable"})
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect_registry()
    spark.range(1).count()

    wall: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        runs = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"{name}#run{i + 1}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        wall[name] = runs
    spark.stop()

    # one app log in evdir (Spark 4 writes a rolling-log DIRECTORY)
    path = max(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    if os.path.isdir(path):
        path = max((p for p in glob.glob(os.path.join(path, "*"))
                    if "appstatus" not in os.path.basename(p)
                    and os.path.isfile(p)), key=os.path.getmtime)
    job_desc: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    stages: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = ev.get("Properties", {}).get(
                    "spark.job.description", "")
                job_stages[jid] = [s["Stage ID"]
                                   for s in ev.get("Stage Infos", [])]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub, comp = si.get("Submission Time"), si.get(
                    "Completion Time")
                stages[sid] = {
                    "sec": (comp - sub) / 1000.0 if sub and comp else None,
                    "tasks": si.get("Number of Tasks"),
                    "name": si.get("Stage Name", "")[:90],
                }
    for name in names:
        print(f"\n== {name}  wall run1={wall[name][0]}s run2={wall[name][1]}s")
        for run in (1, 2):
            tag = f"{name}#run{run}"
            jids = sorted(j for j, d in job_desc.items() if d == tag)
            tot = 0.0
            print(f"  -- run{run}: {len(jids)} jobs")
            for j in jids:
                for sid in sorted(job_stages.get(j, [])):
                    st = stages.get(sid)
                    if not st:
                        continue  # skipped (reused) stage
                    tot += st["sec"] or 0
                    print(f"    job {j} stage {sid:4d} {st['sec']:.3f}s "
                          f"tasks={st['tasks']:3d}  {st['name']}")
            print(f"    stage-sec sum: {tot:.3f}")


if __name__ == "__main__":
    main()
