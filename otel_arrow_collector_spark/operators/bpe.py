"""Byte-pair-encoding tokenizer: distributed training + application.

The real subword-vocabulary step of an LLM data pipeline (Sennrich et
al. 2016; the GPT-2 tokenizer family).  Training is the classic
iterative loop — count adjacent symbol pairs, merge the most frequent,
repeat — expressed Spark-first:

- **Pair counting is distributed**: one hash aggregation over the
  exploded (word, adjacent-pair) stream per round, weighted by word
  frequency.  At 100 TB this is the only data-sized step and it is a
  plain groupBy.
- **The argmax and merge-table update are driver-side model steps**
  (like the k-means centroid update in ``similarity.py``): the model is
  K merge rules, not data.
- **Word frequencies are computed ONCE**; each round re-tokenizes only
  the distinct-word vocabulary (tiny relative to the corpus — the
  standard BPE-training optimization), so rounds cost O(|vocab|), not
  O(corpus).

Determinism: ties in pair frequency break on the lexicographically
smallest pair, all counts are integers, and the merge application is a
pure function — two trainings of the same corpus are identical, and
the distributed trainer is pytest-pinned against a pure-Python
reference implementation on the same sample.

Application (``apply_bpe``) merges greedily by merge-table rank — the
exact GPT-2 ``bpe()`` algorithm shape — and is exposed for executor use
via mapInPandas in ``bpe_encode_df``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..sources.tables import load_table

#: End-of-word marker (the classic </w> sentinel keeps merges from
#: crossing word boundaries).
EOW = "</w>"


def word_frequencies(spark, sf_dir: str, sample_mod: int = 10):
    """Distinct-word frequency table over a deterministic doc sample
    (doc_id % sample_mod == 0) — the corpus-sized step, done once."""
    d = load_table(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") % sample_mod == 0)
    return (d.select(F.explode(F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"),
                lambda x: x != "")).alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _symbols(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the merge table in rank order to one word."""
    syms = list(word) + [EOW]
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


#: PRODUCTION vocabulary floor — the min_frequency knob every
#: production trainer exposes, and the floor text_bpe_capacity audits.
#: NOT the trainer default: filtering freq-1 words is NOT
#: merge-preserving (pair mass aggregated across many freq-1 words is
#: real mass — the textbook guard only requires the winning PAIR's
#: count >= 2), so callers opt in explicitly via
#: ``train_bpe(..., min_freq=BPE_MIN_FREQ)`` when the capacity query
#: says the raw vocabulary is too wide.
BPE_MIN_FREQ = 2

#: Loud ceiling on the distinct-word vocabulary the per-round explode
#: carries.  Heaps' law keeps real corpora far under it, but a
#: boilerplate-free 100 TB crawl sampled too wide can exceed it — past
#: this, raise sample_mod or min_freq instead of letting every training
#: round shuffle a corpus-sized "vocabulary".
BPE_VOCAB_MAX = 10_000_000


def train_bpe(spark, sf_dir: str, n_merges: int = 20,
              sample_mod: int = 10,
              min_freq: int = 1) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules.  Per round: ONE distributed
    pair-count aggregation over the vocabulary (weighted by word freq),
    a driver-side argmax with a total-order tie-break, and a new merge
    rule appended to the model.

    The vocabulary stays a PERSISTED DataFrame on the executors — it is
    never collected to the driver (the pre-r14 collect+createDataFrame
    round-trip pushed tens of millions of distinct tokens through the
    driver at crawl scale).  Only the per-round argmax row crosses to
    the driver.  Cardinality is audited against BPE_VOCAB_MAX (the
    text_bpe_capacity query publishes the same bound as a report)."""
    words = (word_frequencies(spark, sf_dir, sample_mod)
             .filter(F.col("freq") >= min_freq)
             .persist())
    n_vocab = words.count()   # materialize the cache + capacity audit
    if n_vocab > BPE_VOCAB_MAX:
        words.unpersist(False)
        raise RuntimeError(
            f"BPE vocabulary {n_vocab} exceeds BPE_VOCAB_MAX="
            f"{BPE_VOCAB_MAX}: raise sample_mod or min_freq "
            f"(see text_bpe_capacity)")
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            mlist = list(merges)

            def toks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    rows = {"a": [], "b": [], "freq": []}
                    for w, f in zip(pdf["word"], pdf["freq"]):
                        syms = _symbols(w, mlist)
                        for i in range(len(syms) - 1):
                            rows["a"].append(syms[i])
                            rows["b"].append(syms[i + 1])
                            rows["freq"].append(int(f))
                    yield pd.DataFrame(rows)

            pairs = (words.mapInPandas(toks, StructType([
                        StructField("a", StringType()),
                        StructField("b", StringType()),
                        StructField("freq", LongType())]))
                     .groupBy("a", "b").agg(F.sum("freq").alias("n"))
                     .orderBy(F.col("n").desc(), "a", "b").limit(1).collect())
            if not pairs or pairs[0].n < 2:
                break
            merges.append((pairs[0].a, pairs[0].b))
    finally:
        words.unpersist(False)
    return merges


def train_bpe_reference(vocab: list[tuple[str, int]],
                        n_merges: int,
                        min_freq: int = 1) -> list[tuple[str, str]]:
    """Pure-Python reference trainer (the textbook algorithm) used to
    pin the distributed trainer's output exactly."""
    vocab = [(w, f) for w, f in vocab if f >= min_freq]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in vocab:
            syms = _symbols(w, merges)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # total order: max count, then lexicographically smallest pair
        top = max(counts.values())
        best = min(p for p, n in counts.items() if n == top)
        if counts[best] < 2:
            break
        merges.append(best)
    return merges


def apply_bpe(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one text with a trained merge table (lowercase +
    [a-z0-9] word split, then per-word merge application)."""
    import re
    out = []
    for w in re.split(r"[^a-z0-9]+", text.lower()):
        if w:
            out.extend(_symbols(w, merges))
    return out


BPE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_tokens", IntegerType()),
    StructField("tokens", ArrayType(StringType())),
])


def bpe_encode_df(df, merges: list[tuple[str, str]]):
    """Executor-side corpus tokenization: mapInPandas over (doc_id,
    text) with the broadcast-captured merge table."""
    mlist = list(merges)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = [apply_bpe(t, mlist) for t in pdf["text"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                "n_tokens": [len(t) for t in toks],
                                "tokens": toks})
    return df.select("doc_id", "text").mapInPandas(run, BPE_SCHEMA)
