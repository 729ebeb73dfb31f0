"""Adversarial-df-skew pins for the LSH bucket cap (STRESS_SKEW_r13).

operators/dedup.py drops band buckets larger than LSH_BUCKET_CAP before
the pair join (module docstring, "Scale stance").  These tests pin the
three contract points:

1. the cap is INERT on corpora without boilerplate mega-buckets
   (capped candidates == uncapped candidates),
2. under boilerplate skew the uncapped bucket really is quadratic-hazard
   sized and the capped candidate set is bounded,
3. the exact prefix-filter path keeps its guarantee on the same skewed
   corpus (boilerplate shingles rank LAST by df, so prefixes stay
   doc-unique and the candidate join stays near-empty) — LSH recall
   trades are backstopped by dedup_allpairs_prefix.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otel_arrow_collector_spark.operators import dedup as D

N_HOTDOCS = 2600        # half of these share the boilerplate tail
L_UNIQUE = 24
B_BOILER = 24


def _skewed_docs(spark, tmp_path, n=N_HOTDOCS):
    """Stress-harness corpus shape: every doc L unique words; every 2nd
    doc shares a B-word boilerplate tail.  Pairwise Jaccard of two hot
    docs ~0.31 < tau=0.5, so the verified output is EMPTY by design —
    any candidate blowup is operator work, not output."""
    boiler = " ".join(f"bp{j}" for j in range(B_BOILER))
    rows = []
    for i in range(n):
        words = " ".join(f"u{i}x{j}" for j in range(L_UNIQUE))
        text = f"{words} {boiler}" if i % 2 == 0 else words
        rows.append((i, text, "en", f"src{i % 4}", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    path = str(tmp_path / "skew")
    df.coalesce(4).write.parquet(f"{path}/documents.parquet")
    return path


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    return _skewed_docs(spark, tmp_path_factory.mktemp("dfskew"))


def _raw_bands(spark, sf_dir):
    d = D.load_table(spark, sf_dir, "documents")
    sig = (d.select("doc_id", F.split("text", " ").alias("ws"))
           .select("doc_id", F.expr(D._spark_shingles()).alias("shs"))
           .select("doc_id", F.array(*[F.expr(D._spark_sig(j))
                                       for j in range(D.K_HASHES)])
                    .alias("sig")))
    return sig.select("doc_id", F.explode(F.expr(D._spark_bands()))
                       .alias("band"))


def test_skewed_corpus_has_mega_bucket_and_cap_bounds_it(spark, skew_dir):
    bands = _raw_bands(spark, skew_dir)
    max_bucket = (bands.groupBy("band").count()
                  .agg(F.max("count")).collect()[0][0])
    # the hazard is real: one boilerplate bucket far beyond the cap,
    # whose pair count would be quadratic in the hot-doc count
    assert max_bucket > D.LSH_BUCKET_CAP
    capped = D._cap_buckets(bands)
    capped_max = (capped.groupBy("band").count()
                  .agg(F.max("count")).collect())
    assert not capped_max or capped_max[0][0] is None \
        or capped_max[0][0] <= D.LSH_BUCKET_CAP
    n_cand = D._build_lsh_candidate_pairs(spark, skew_dir).count()
    # bounded: at most cap^2/2 per surviving bucket x 4 bands, and in
    # this corpus the surviving buckets are tiny
    assert n_cand < D.LSH_BUCKET_CAP ** 2


def test_cap_is_inert_without_mega_buckets(spark, sf_dir=None):
    """On the real sf0.001 corpus every bucket is far below the cap, so
    capped and uncapped candidate sets are IDENTICAL."""
    sf = "/root/testdata/sf0.001"
    bands = _raw_bands(spark, sf).persist()
    try:
        uncapped = (bands.alias("a")
                    .join(bands.alias("b"),
                          (F.col("a.band") == F.col("b.band"))
                          & (F.col("a.doc_id") < F.col("b.doc_id")))
                    .select(F.col("a.doc_id").alias("d1"),
                            F.col("b.doc_id").alias("d2")).distinct())
        capped = D._build_lsh_candidate_pairs(spark, sf)
        assert capped.exceptAll(uncapped).count() == 0
        assert uncapped.exceptAll(capped).count() == 0
    finally:
        bands.unpersist()


def test_prefix_join_guarantee_survives_skew(spark, skew_dir):
    """dedup_allpairs_prefix on the skewed corpus: boilerplate shingles
    have df in the thousands, so df-ascending ranking keeps them OUT of
    every prefix (each doc has >= half doc-unique shingles) — the
    candidate join stays near-empty and the exact result is the true
    empty set (all pairwise J ~0.31 < 0.5)."""
    out = D.QUERIES["dedup_allpairs_prefix"](spark, skew_dir).collect()
    assert out == []


def test_prefix_relation_is_shared_and_cached(spark):
    """dedup_allpairs_prefix and dedup_prefix_cost_model read the SAME
    session-memoized ranked prefix relation (r13 refactor): the ranking
    pipeline — the expensive half of the exact path — builds once per
    (session, dir)."""
    sf = "/root/testdata/sf0.001"
    a = D._prefix_relation(spark, sf)
    b = D._prefix_relation(spark, sf)
    assert a is b
    assert "Memory" in str(a.storageLevel)
    D.QUERIES["dedup_prefix_cost_model"](spark, sf).collect()
    out = D.QUERIES["dedup_allpairs_prefix"](spark, sf).collect()
    assert out  # sf0.001 has near-dup pairs
