"""Adversarial document-frequency skew stress (verdict r12 ask #3).

``operators/dedup.py`` makes two 100 TB claims the ordinary replication
stress (tools/stress.py) never drives:

1. prefix join (dedup_allpairs_prefix): "df-ascending order puts the
   rarest shingles in prefixes, so bucket sizes stay small" — i.e. a few
   shingles with df in the thousands must NOT blow up the candidate join.
2. banded LSH (dedup_minhash_lsh): "band-hash join keys are uniform md5
   strings — no skew".  True for the HASH VALUES, but identical
   *signatures* still collide regardless of hashing: boilerplate text
   shared across a large doc fraction can dominate the per-component min
   and produce one mega-bucket per band — the classic LSH failure mode.

This harness builds corpora where that is exactly the case, while keeping
the OUTPUT empty so growth is operator work, not output-faithful growth:

  N = 5000*k docs; every doc has L=24 doc-unique words; half of all docs
  share a fixed B=24-word boilerplate tail.  Hot shingles then have
  df = N/2 (thousands), but the pairwise Jaccard of two hot docs is
  ~22/(46+46-22) ~= 0.31 < tau=0.5 -> zero qualifying pairs at any scale.

Per scale k in {1,2,4} it runs both queries end-to-end (fresh cache per
work dir), records wall time, result rows, LSH candidate-pair count and
the largest band bucket, and fits the scaling exponent alpha (t ~ k^alpha).

Usage: python tools/stress_skew.py [--scales 1,2,4] [--out -]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 5000       # sf0.1 documents cardinality
L_UNIQUE = 24       # doc-unique words per doc
B_BOILER = 24       # shared boilerplate words (appended to every 2nd doc)


def gen_corpus(path: str, k: int) -> None:
    import duckdb
    n = N_BASE * k
    con = duckdb.connect()
    uniq = ("list_aggregate(list_transform(range(1, %d), "
            "j -> 'u' || i || 'x' || j), 'string_agg', ' ')" % (L_UNIQUE + 1))
    boil = " ".join(f"bp{j}" for j in range(B_BOILER))
    con.execute(f"""
        COPY (
          SELECT i AS doc_id,
                 CASE WHEN i % 2 = 0 THEN {uniq} || ' ' || '{boil}'
                      ELSE {uniq} END AS text,
                 'en' AS lang,
                 'src' || (i % 4) AS source,
                 LENGTH(CASE WHEN i % 2 = 0 THEN {uniq} || ' ' || '{boil}'
                             ELSE {uniq} END) AS n_chars
          FROM range({n}) t(i)
        ) TO '{path}/documents.parquet' (FORMAT PARQUET)
    """)
    con.close()


def lsh_diagnostics(spark, sf_dir: str) -> dict:
    """Candidate-pair count + max band-bucket size (outside timed region)."""
    from pyspark.sql import functions as F

    from otel_arrow_collector_spark.operators import dedup as D
    d = D.load_table(spark, sf_dir, "documents")
    sig = (d.select("doc_id", F.split("text", " ").alias("ws"))
            .select("doc_id", F.expr(D._spark_shingles()).alias("shs"))
            .select("doc_id", F.array(*[F.expr(D._spark_sig(j))
                                        for j in range(D.K_HASHES)])
                     .alias("sig")))
    bands = sig.select("doc_id", F.explode(F.expr(D._spark_bands()))
                        .alias("band"))
    bc = bands.groupBy("band").count()
    row = bc.agg(F.max("count").alias("mx"),
                 F.sum(F.expr("count * (count - 1) / 2")).alias("pairs_ub")
                 ).collect()[0]
    n_cand = D._build_lsh_candidate_pairs(spark, sf_dir).count()
    return {"max_bucket": int(row["mx"]),
            "bucket_pair_bound": int(row["pairs_ub"]),
            "lsh_candidates": int(n_cand)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,4")
    ap.add_argument("--work-dir", default="/tmp/spark_graft_skew")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from otel_arrow_collector_spark.operators import collect_registry
    from otel_arrow_collector_spark.session import get_spark
    spark = get_spark("stress-skew", extra_conf={
        "spark.driver.extraJavaOptions": "-Xlog:disable"})
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect_registry()
    names = ["dedup_allpairs_prefix", "dedup_minhash_lsh",
             "dedup_bucket_cap_audit", "dedup_prefix_cost_model"]

    # Warm the JVM/codegen paths on a dedicated small corpus so the first
    # timed scale doesn't absorb one-time costs (observed: 11.3s vs 4.4s
    # for the same query cold vs warm).
    warm = os.path.join(args.work_dir, "warm")
    shutil.rmtree(warm, ignore_errors=True)
    os.makedirs(warm)
    import duckdb
    con = duckdb.connect()
    con.execute(f"""COPY (SELECT i AS doc_id,
        'w' || i || ' x' || i || ' y' || i || ' z' || i AS text,
        'en' AS lang, 'src0' AS source, 10 AS n_chars
        FROM range(500) t(i)) TO '{warm}/documents.parquet'
        (FORMAT PARQUET)""")
    con.close()
    for name in names:
        queries[name](spark, warm).collect()
    spark.catalog.clearCache()

    results: dict = {"design": {
        "n_docs_per_scale": {str(k): N_BASE * k for k in scales},
        "hot_shingle_df_at_scale": {str(k): N_BASE * k // 2 for k in scales},
        "expected_output_pairs": 0,
        "why_output_is_flat": "pairwise Jaccard of boilerplate-sharing "
                              "docs ~0.31 < tau=0.5"},
        "scales": {}}
    for k in scales:
        wd = os.path.join(args.work_dir, f"x{k}")
        shutil.rmtree(wd, ignore_errors=True)
        os.makedirs(wd)
        gen_corpus(wd, k)
        rec: dict = {}
        for name in names:
            t0 = time.perf_counter()
            rows = queries[name](spark, wd).collect()
            rec[name] = {"sec": round(time.perf_counter() - t0, 3),
                         "rows": len(rows)}
            if name == "dedup_prefix_cost_model":
                rec[name]["out"] = rows[0].asDict()
            elif name == "dedup_bucket_cap_audit":
                rec[name]["dropped_classes"] = [
                    r.asDict() for r in rows if r.dropped_by_cap]
        rec["lsh"] = lsh_diagnostics(spark, wd)
        results["scales"][str(k)] = rec
        spark.catalog.clearCache()

    for name in names:
        xs = [math.log(k) for k in scales]
        ys = [math.log(max(results["scales"][str(k)][name]["sec"], 1e-3))
              for k in scales]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        alpha = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        results.setdefault("alpha", {})[name] = round(alpha, 3)

    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
