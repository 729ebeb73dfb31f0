"""Sampling operators: statistical-sanity pins (deterministic —
hash-driven, so exact every run; the oracle gate pins exactness
separately)."""

from __future__ import annotations


def test_bootstrap_replicates_bracket_truth(spark):
    """sample_bootstrap statistical sanity (values are deterministic
    functions of the hash, so these are exact pins, not flaky stats):
    every replicate's effective count is within 4*sqrt(n) of n
    (Poisson(1) total has variance n), the replicate means bracket
    the true mean, and their spread is within ~6 standard errors."""
    from pyspark.sql import functions as F

    from otel_arrow_collector_spark.operators.sampling import (
        sample_bootstrap)
    from tests.conftest import SF_SMALL

    reps = sample_bootstrap(spark, SF_SMALL).collect()
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    stats = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.round(F.col("o_totalprice") * 100)).alias("mu"),
        F.stddev(F.round(F.col("o_totalprice") * 100)).alias("sd")
    ).first()
    n, mu, sd = stats.n, stats.mu, stats.sd
    se = sd / n ** 0.5
    for r in reps:
        assert abs(r.n_eff - n) < 4 * n ** 0.5 + 10
        assert abs(r.mean_cents - mu) < 6 * se
    means = [r.mean_cents for r in reps]
    assert min(means) < mu < max(means)


def test_hexint_sql_matches_python_hex_parse(spark):
    """_hexint_sql (the 28-bit hash the sampling/bootstrap family
    shares) equals Python's int(hexdigest[:7], 16) for keys whose
    high hex digits exercise every nibble — the theta-hash pin
    applied to the 7-char polynomial, under BOTH ANSI modes."""
    import hashlib

    from pyspark.sql import functions as F

    from otel_arrow_collector_spark.operators.sampling import _hexint_sql

    keys = [f"boot:{b}:{k}" for b in (0, 7, 15) for k in
            ("1", "42", "999983", "zq9")]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    expr = _hexint_sql("md5(k)", 7, "substring")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for mode in ("false", "true"):
            spark.conf.set("spark.sql.ansi.enabled", mode)
            got = {r.k: r.hv for r in
                   df.select("k", F.expr(expr).alias("hv")).collect()}
            for k in keys:
                want = int(hashlib.md5(k.encode()).hexdigest()[:7], 16)
                assert got[k] == want, (mode, k)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
