"""Streaming Bloom-gated novelty filter — the BOUNDED-state streaming
form of the text_ngram_novelty screen (and the streaming twin of the
batch Bloom machinery in operators/curation.bloom_screen /
sketches.sketch_bloom_fpr).

The exact streaming novelty counter would keep every seen trigram as
state — Heaps-sublinear but still corpus-scale, the state class a
100 TB ingest must refuse.  This operator keeps a per-language BLOOM
BITSET instead: 2^20 bits (16,384 longs, 128 KiB) per key, FIXED SIZE
BY CONSTRUCTION no matter how many trigrams stream past — the filter
an ingest pipeline actually ships (RocksDB/Badger memtables, the
reference's persistent-queue dedup cousins).  Each arriving trigram
probes K=3 bit positions sliced from ONE md5 digest (the
one-hash-K-indexes construction the batch bloom_screen pins, widened
from 16- to 20-bit slices because the streaming filter faces the OPEN
vocabulary, not a fixed benchmark set); it counts as novel iff some
probed bit was unset, then its bits are set.

Error contract (pytest-pinned): ONE-SIDED — a false positive can only
SUPPRESS novelty (count a new trigram as seen), never invent it, so
cumulative n_novel_est <= the exact distinct-trigram count, with the
gap bounded by the measured fill (fpr ~ fill^K; at 2^20 bits the
sf0.001 corpus fills ~8%, fpr ~ 5e-4).  Re-delivery is idempotent (a
seen trigram's bits are set).  Exact batch-split invariance does NOT
hold through false positives (a collision seen before vs after a split
boundary can flip one trigram's verdict) — the pin asserts the
one-sided bound and a tolerance, not equality; that is the honest
contract of a Bloom, and exactly why the batch query stays the
oracle-gated exact path.

Emission (update mode, latest per key wins): (lang, n_novel_est
cumulative, fill_bits) — fill_bits is the live health metric (the
curation_store_stats analogue: watch it approach m and re-shard the
filter before fpr degrades).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StringType,
                               StructField, StructType)

#: Bloom geometry: K 20-bit positions sliced from one md5 digest.
BLOOM_NOV_K = 3
BLOOM_NOV_HEXCHARS = 5               # 5 hex chars = 20-bit positions
BLOOM_NOV_BITS = 16 ** BLOOM_NOV_HEXCHARS          # 2^20
_WORDS = BLOOM_NOV_BITS // 64                      # 16,384 longs

OUT_SCHEMA = StructType([
    StructField("lang", StringType()),
    StructField("n_novel_est", LongType()),
    StructField("fill_bits", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("words", ArrayType(LongType())),
    StructField("n_novel", LongType()),
])


def bloom_positions(tg: str) -> list[int]:
    """K 20-bit positions from one md5 digest — hex slices [0:5),
    [5:10), [10:15), the widened twin of curation._bloom_pos_exprs."""
    h = hashlib.md5(tg.encode("utf-8")).hexdigest()
    return [int(h[i * BLOOM_NOV_HEXCHARS:(i + 1) * BLOOM_NOV_HEXCHARS],
                16) for i in range(BLOOM_NOV_K)]


def _emit_novelty(key, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        words = np.array(state.get[0], dtype=np.int64) \
                  .view(np.uint64).copy()
        n_novel = int(state.get[1])
    else:
        words = np.zeros(_WORDS, dtype=np.uint64)
        n_novel = 0
    # sorted-distinct per batch: deterministic for a given split, and a
    # trigram appearing twice in one batch is novel at most once
    tgs = sorted({str(t) for pdf in pdfs for t in pdf["tg"]})
    touched = False
    for tg in tgs:
        pos = bloom_positions(tg)
        seen = all(bool((words[p >> 6] >> np.uint64(p & 63))
                        & np.uint64(1)) for p in pos)
        if not seen:
            n_novel += 1
            for p in pos:
                words[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
            touched = True
    if touched:
        state.update((words.view(np.int64).tolist(), n_novel))
    fill = int(sum(int(w).bit_count() for w in words.tolist()))
    yield pd.DataFrame({"lang": [key[0]],
                        "n_novel_est": [n_novel],
                        "fill_bits": [fill]})


def bloom_novelty_stream(trigrams: DataFrame) -> DataFrame:
    """Streaming novelty: ``trigrams`` (lang, tg) -> update-mode
    (lang, cumulative n_novel_est, fill_bits) with 128 KiB of state
    per language, fixed by construction."""
    return (trigrams.select("lang", "tg")
            .groupBy("lang")
            .applyInPandasWithState(
                _emit_novelty, OUT_SCHEMA, _STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
