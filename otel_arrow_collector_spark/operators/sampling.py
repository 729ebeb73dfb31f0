"""Deterministic sampling operators over ``documents`` — the corpus-
curation surface of a training-data pipeline (stratified subsampling,
reproducible train/val/test splits).

Reference parity: the reference's probabilistic surface is head-based
trace sampling decisions (span flags, pdata/ptrace); these operators
extend the idea to corpus curation (driver north-star).

Cross-engine determinism: selection is a pure function of md5 over stable
keys — no RNG, no seed state — so membership is identical in Spark,
DuckDB, and any future engine, and re-running a pipeline never reshuffles
the split.  The first 4 md5 hex chars are compared lexicographically
(fixed-width lowercase hex == numeric order), giving 16-bit resolution
(~0.002% rate granularity).

Scale stance: both operators are a codegen map (hash + compare) followed
by one hash aggregation — no window, no join; at 100 TB the filter runs
inside the scan and the aggregate is map-side-combined per stratum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table, parallel_table

QUERIES: dict = {}
ORACLES: dict = {}

#: keep-threshold on the first 4 md5 hex chars: 0x4000/0x10000 = 25%
SAMPLE_HEX = "4000"
#: train/val/test boundaries: 80% / 10% / 10%
TRAIN_HEX, VAL_HEX = "cccc", "e666"


def _key(salt: str):
    return F.substring(
        F.md5(F.concat(F.col("lang"), F.lit(salt),
                       F.col("doc_id").cast("string"))), 1, 4)


def sample_stratified(spark, sf_dir):
    """Per-language deterministic ~25% subsample: keep iff the first
    16 bits of md5(lang:doc_id) fall under the rate threshold.  Output is
    the per-stratum accounting (totals, sampled, realized rate)."""
    d = load_table(spark, sf_dir, "documents")
    keep = (_key(":") < SAMPLE_HEX).cast("int")
    return (d.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_total"),
                  F.sum(keep).cast("long").alias("n_sampled"))
             .select("lang", "n_total", "n_sampled",
                     F.round(F.col("n_sampled").cast("double")
                             / F.col("n_total"), 4).alias("rate"))
             .orderBy("lang"))


QUERIES["sample_stratified"] = sample_stratified
ORACLES["sample_stratified"] = f"""
SELECT lang, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)),
                                 1, 4) < '{SAMPLE_HEX}'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       ROUND(CAST(SUM(CASE WHEN substr(md5(lang || ':' ||
                                          CAST(doc_id AS VARCHAR)), 1, 4)
                               < '{SAMPLE_HEX}' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS rate
FROM documents GROUP BY lang ORDER BY lang
"""


def sample_split(spark, sf_dir):
    """Reproducible 80/10/10 train/val/test assignment per document —
    hash-range buckets over md5(lang|doc_id), reported per (lang, split).
    A document's split never changes as the corpus grows (pure function
    of its key), the property training pipelines need for incremental
    ingestion without leakage."""
    d = load_table(spark, sf_dir, "documents")
    key = _key("|")
    split = (F.when(key < TRAIN_HEX, "train")
              .when(key < VAL_HEX, "val").otherwise("test"))
    return (d.groupBy("lang", split.alias("split"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.min("doc_id").alias("first_doc"))
             .orderBy("lang", "split"))


QUERIES["sample_split"] = sample_split
ORACLES["sample_split"] = f"""
WITH t AS (
  SELECT lang, doc_id,
         substr(md5(lang || '|' || CAST(doc_id AS VARCHAR)), 1, 4) AS k
  FROM documents)
SELECT lang,
       CASE WHEN k < '{TRAIN_HEX}' THEN 'train'
            WHEN k < '{VAL_HEX}' THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
FROM t GROUP BY 1, 2 ORDER BY lang, split
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement (hash-priority)
# ---------------------------------------------------------------------------

#: docs drawn per language stratum
WEIGHTED_K = 50
_HEX16 = "0123456789abcdef"


def _hexint_sql(h_expr: str, nchars: int, substr_fn: str) -> str:
    """Integer value of the first ``nchars`` hex chars of ``h_expr`` as
    pure strpos/substr arithmetic — identical semantics in Spark SQL
    (substring) and DuckDB (substr), neither of which shares a native
    hex-parse function with the other.  ORACLE-side form; the Spark
    side uses _hexint_spark (same value, native parse)."""
    terms = [
        f"(instr('{_HEX16}', {substr_fn}({h_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)]
    return "(" + " + ".join(terms) + ")"


def _hexint_spark(h_expr: str, nchars: int) -> str:
    """Spark-side fast path for the same integer: ``conv(hex, 16, 10)``
    is one native parse instead of nchars instr+substring string ops —
    BOOT_PROFILE_r14 measured the instr form costing ~1.5x the whole
    bootstrap query at 16 hashes/row.  Value-identical to _hexint_sql
    (both parse the same leading hex window; parity-gated)."""
    return (f"CAST(conv(substring({h_expr}, 1, {nchars}), 16, 10)"
            f" AS BIGINT)")


def sample_weighted(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, ``WEIGHTED_K`` docs per
    language, weight = n_chars: each doc draws the integer priority
    md5_28bit('wgt:' || doc_id) // n_chars and the smallest priorities
    win — a doc with twice the weight halves its expected priority, the
    integer cousin of the A-ES exponential-key scheme (Efraimidis &
    Spirakis 2006), chosen over the float form so the oracle gates
    EXACT values (no pow/log cross-engine drift).

    Scale shape: priorities are a map-side expression; per-stratum
    selection is one window top-k (the q19 pattern) — no global sort,
    no driver state, reruns are bit-identical (pure function of keys).
    """
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    hv = _hexint_spark("md5('wgt:' || CAST(doc_id AS STRING))", 7)
    pri = F.expr(f"CAST({hv} DIV greatest(n_chars, 1) AS BIGINT)")
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (d.select("lang", "doc_id",
                     F.col("n_chars").cast("long").alias("n_chars"),
                     pri.alias("priority"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= WEIGHTED_K)
            .select("lang", "doc_id", "n_chars", "priority")
            .orderBy("lang", "priority", "doc_id"))


QUERIES["sample_weighted"] = sample_weighted
ORACLES["sample_weighted"] = f"""
WITH pri AS (
  SELECT lang, doc_id, n_chars,
         {_hexint_sql("md5('wgt:' || CAST(doc_id AS VARCHAR))", 7, "substr")}
           // greatest(n_chars, 1) AS priority,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {_hexint_sql(
                                "md5('wgt:' || CAST(doc_id AS VARCHAR))",
                                7, "substr")}
                              // greatest(n_chars, 1), doc_id) AS rk
  FROM documents)
SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(priority AS BIGINT) AS priority
FROM pri WHERE rk <= {WEIGHTED_K}
ORDER BY lang, priority, doc_id
"""


# ---------------------------------------------------------------------------
# deterministic hash-Poisson bootstrap (resampling without data copies)
# ---------------------------------------------------------------------------

#: bootstrap replicates
BOOTSTRAP_B = 16
#: 28-bit hash range (7 hex chars — the overflow-audited width)
_BOOT_RANGE = 16 ** 7


def _poisson1_thresholds(max_k: int = 9) -> list[int]:
    """Cumulative Poisson(1) CDF scaled to the 28-bit hash range —
    LITERAL constants embedded identically in both engines' SQL, so
    the float math runs once here, never per row or per engine.  A
    uniform 28-bit hash h draws weight w = #{k: h >= T_k}, giving
    P(w=k) = Poisson(1) pmf to ~1e-8 (k capped at max_k; the tail
    beyond is one part in 10^6 of replicas)."""
    import math
    cum, out = 0.0, []
    for k in range(max_k):
        cum += math.exp(-1) / math.factorial(k)
        out.append(min(int(cum * _BOOT_RANGE), _BOOT_RANGE))
    return out


def sample_bootstrap(spark, sf_dir):
    """BOOTSTRAP_B bootstrap replicates of mean order value WITHOUT
    copying the data: each (order, replicate) pair draws a Poisson(1)
    multiplicity from a deterministic 28-bit hash (the online-bootstrap
    identity — resampling n-with-replacement converges to i.i.d.
    Poisson(1) weights; Oza & Russell 2001), so the B resamples are
    B weighted aggregations over ONE scan, reproducible bit-for-bit.
    Publishes each replicate's effective count and floor-div mean in
    exact cents — the spread across replicates IS the bootstrap CI a
    mixture curator reads.

    Scale shape: one constant-factor explode (x B) feeding one
    map-side-combinable hash agg on the replicate id; weights are pure
    column arithmetic (9 comparisons against literal thresholds); no
    joins, no windows, no driver state.
    """
    # fan-out: the B-way explode + per-row md5 otherwise runs inside a
    # single-split scan stage on one core (guide §2.5)
    o = parallel_table(spark, sf_dir, "orders")
    ts = _poisson1_thresholds()
    h = _hexint_spark(
        "md5(concat('boot:', CAST(b AS STRING), ':',"
        " CAST(o_orderkey AS STRING)))", 7)
    w_expr = " + ".join(
        f"(CASE WHEN hv >= {t} THEN 1 ELSE 0 END)" for t in ts)
    # floor(v + 0.5): value-identical to round for 2-decimal money
    # (relational._half_up rationale; pinned in test_half_up_round)
    return (o.select(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                     .alias("cents"),
                     "o_orderkey",
                     F.explode(F.expr(
                         f"sequence(0, {BOOTSTRAP_B - 1})")).alias("b"))
            .select("cents", "b",
                    F.expr(h).cast("long").alias("hv"))
            .select("cents", "b", F.expr(w_expr).alias("w"))
            .groupBy("b")
            .agg(F.sum("w").cast("long").alias("n_eff"),
                 F.sum(F.col("w") * F.col("cents")).alias("tot"))
            .select(F.col("b").cast("long").alias("b"), "n_eff",
                    F.expr("tot div n_eff").cast("long")
                    .alias("mean_cents"))
            .orderBy("b"))


QUERIES["sample_bootstrap"] = sample_bootstrap


def _bootstrap_oracle() -> str:
    ts = _poisson1_thresholds()
    h = _hexint_sql(
        "md5(concat('boot:', CAST(b AS VARCHAR), ':',"
        " CAST(o_orderkey AS VARCHAR)))", 7, "substr")
    w_expr = " + ".join(
        f"(CASE WHEN hv >= {t} THEN 1 ELSE 0 END)" for t in ts)
    return f"""
WITH e AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey, t.b
  FROM orders, unnest(range(0, {BOOTSTRAP_B})) AS t(b)),
hv AS (SELECT cents, b, {h} AS hv FROM e),
w AS (SELECT cents, b, {w_expr} AS w FROM hv)
SELECT CAST(b AS BIGINT) AS b,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       CAST(SUM(w * cents) // SUM(w) AS BIGINT) AS mean_cents
FROM w GROUP BY b ORDER BY b
"""


ORACLES["sample_bootstrap"] = _bootstrap_oracle()


RESERVOIR_K = 12


def sample_reservoir(spark, sf_dir):
    """Deterministic distributed reservoir sample: ``RESERVOIR_K`` docs
    per language, selected as the bottom-K by md5('rsv:' || doc_id) —
    the hash-rank formulation of reservoir sampling (Vitter 1985
    Algorithm R gives each item equal inclusion probability; ranking a
    uniform hash gives the SAME marginal law while being mergeable,
    rerun-stable, and order-independent — the property a distributed /
    streaming reservoir actually needs, and the same bottom-K state the
    theta sketch keeps).  Unlike sample_stratified's fixed-rate filter,
    the output size per stratum is exactly min(K, n) regardless of
    corpus size.

    Magnitude at 100x: the 28-bit hash key and row ranks only — no
    arithmetic beyond the window rank.

    Scale shape: the hash is a map-side expression; per-stratum
    selection is one window top-k partitioned by lang (the q19 /
    sample_weighted pattern) — no global sort, no driver state.
    """
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    hv = _hexint_spark("md5('rsv:' || CAST(doc_id AS STRING))", 7)
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (d.select("lang", "doc_id",
                     F.expr(f"CAST({hv} AS BIGINT)").alias("hkey"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= RESERVOIR_K)
            .select("lang", "doc_id", "hkey",
                    F.col("rk").cast("long").alias("rk"))
            .orderBy("lang", "rk"))


QUERIES["sample_reservoir"] = sample_reservoir
ORACLES["sample_reservoir"] = f"""
WITH pri AS (
  SELECT lang, doc_id,
         CAST({_hexint_sql("md5('rsv:' || CAST(doc_id AS VARCHAR))",
                           7, "substr")} AS BIGINT) AS hkey,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {_hexint_sql(
                                "md5('rsv:' || CAST(doc_id AS VARCHAR))",
                                7, "substr")}, doc_id) AS rk
  FROM documents)
SELECT lang, doc_id, hkey, CAST(rk AS BIGINT) AS rk
FROM pri WHERE rk <= {RESERVOIR_K}
ORDER BY lang, rk
"""


SYSTEMATIC_K = 7


def sample_systematic(spark, sf_dir):
    """Systematic (every-k-th) sample per source stratum: documents are
    ordered by md5('sys:' || doc_id) inside each source and every
    ``SYSTEMATIC_K``-th row is kept (rank % k == 1) — the classic
    survey-sampling design (hash order stands in for the frame order,
    making the pass reproducible and immune to storage order).  Unlike
    the fixed-rate hash filter (sample_stratified), systematic
    selection guarantees the per-stratum sample size is ceil(n/k)
    EXACTLY, with the sample spread evenly through the hash-ordered
    frame — the property a curator wants when a source must contribute
    a predictable row budget.  Reference parity: probabilistic
    sampling policies in the reference decide per item
    (processor/probabilisticsampler); this is the frame-based batch
    twin.

    Scale shape: one window rank partitioned by source over an
    8-byte hash key + doc_id — map-side hash, one shuffle on the
    stratum key, filter folds into the rank projection; no join, no
    global sort.  Magnitude: ranks only — no arithmetic past n.
    """
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("hkey", "doc_id")
    return (d.select("source", "doc_id",
                     F.md5(F.concat(F.lit("sys:"),
                                    F.col("doc_id").cast("string")))
                     .alias("hkey"))
            .withColumn("rk", F.row_number().over(w))
            .filter((F.col("rk") % SYSTEMATIC_K) == 1)
            .select("source", "doc_id",
                    F.col("rk").cast("long").alias("rk"))
            .orderBy("source", "rk"))


QUERIES["sample_systematic"] = sample_systematic
ORACLES["sample_systematic"] = f"""
WITH rk AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('sys:' || CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents)
SELECT source, CAST(doc_id AS BIGINT) AS doc_id, CAST(rk AS BIGINT) AS rk
FROM rk WHERE rk % {SYSTEMATIC_K} = 1
ORDER BY source, rk
"""
