"""Streaming incremental corpus dedup — the stateful twin of
``operators/dedup.dedup_incremental`` (shard = micro-batch, signature
store = keyed state).

The persisted signature store of the batch operator is re-expressed as
per-BAND state: for each LSH band value, the state holds the doc_ids of
every previously seen document carrying that band.  A new micro-batch's
band rows group by band; each group emits (new doc x stored docs) plus
(new x new within the batch) candidate pairs, then appends the new docs
to the state — exactly the band-join the batch operator runs against
the store, unrolled over arrival order.  Re-delivery of an already
stored doc_id emits nothing and changes nothing (set semantics — the
idempotence the reference's redelivery path gets from its persistent
queue, exporter/internal/persistent_storage.go:278-345).

Equivalence (pytest-pinned): the union of per-batch candidate emissions
over any batch split / arrival order / duplication of ``documents``
equals the batch operator's LSH candidate pair set.  Verification
(exact Jaccard) stays a downstream batch join over the emitted pairs —
bounded by candidates — via ``operators.dedup.incremental_pairs``.

Scale shape: state is keyed by uniform md5 band values (no skew); each
state entry is one band bucket, the same bucket the batch join
materializes.  State size is the store size — the production analogue
persists it in the checkpoint exactly as the batch path persists its
parquet store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StructField,
                               StructType)

from ..operators.dedup import (K_HASHES, _spark_bands, _spark_shingles,
                               _spark_sig)

OUT_SCHEMA = StructType([
    StructField("d1", LongType()),
    StructField("d2", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("doc_ids", ArrayType(LongType())),
])

#: per-band state bound: a band bucket holding more doc_ids than this is
#: a degenerate corpus (thousands of near-identical docs hashing to one
#: LSH bucket) whose candidate emission grows quadratically — refuse
#: LOUDLY (memlimit semantics: a hard bound beats an OOM'd executor)
#: instead of letting one bucket's state and output grow unbounded.
#: 10k stored docs in ONE band already implies ~10k pairs per new doc.
MAX_BAND_DOCS = 10_000


class BandStateOverflowError(RuntimeError):
    """A single LSH band bucket exceeded :data:`MAX_BAND_DOCS` stored
    documents — the degenerate-corpus guard of the streaming twin (the
    batch path's analogue is curation_store_stats' max_bucket monitor,
    which exists to watch exactly this fan-out)."""


def _emit_pairs(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState,
                max_band_docs: int = MAX_BAND_DOCS
                ) -> Iterator[pd.DataFrame]:
    stored = set(state.get[0]) if state.exists else set()
    fresh: list[int] = []
    seen = set(stored)
    for pdf in pdfs:
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            if d not in seen:           # re-delivery: no-op
                seen.add(d)
                fresh.append(d)
    if len(seen) > max_band_docs:
        raise BandStateOverflowError(
            f"band {key[0]!r}: {len(seen)} docs in one LSH bucket "
            f"(cap {max_band_docs}) — degenerate near-identical corpus; "
            "pair emission for this bucket is quadratic. Raise "
            "max_band_docs only with the executor memory to match, or "
            "pre-screen exact duplicates (dedup_exact) upstream.")
    if not fresh:
        yield pd.DataFrame({"d1": [], "d2": []}).astype("int64")
        return
    d1s: list[int] = []
    d2s: list[int] = []
    for i, d in enumerate(fresh):
        for e in stored:                # new x store
            d1s.append(min(d, e))
            d2s.append(max(d, e))
        for e in fresh[:i]:             # new x new (within batch)
            d1s.append(min(d, e))
            d2s.append(max(d, e))
    state.update((sorted(seen),))
    yield pd.DataFrame({"d1": d1s, "d2": d2s})


def incr_dedup_stream(docs: DataFrame,
                      max_band_docs: int = MAX_BAND_DOCS) -> DataFrame:
    """Streaming LSH candidate emission: ``docs`` (doc_id, text) ->
    update-mode (d1, d2) candidate pairs touching each arriving batch.
    The band projection is the SAME SQL the batch store builder uses
    (shingle -> signature -> band), so stream and batch cannot diverge
    on bucketing.  ``max_band_docs`` bounds per-band state (closure-
    carried so it reaches the executors); past it the query fails with
    :class:`BandStateOverflowError` rather than growing one bucket's
    state and emission quadratically."""

    def emit(key, pdfs, state):
        return _emit_pairs(key, pdfs, state, max_band_docs)

    bands = (docs.select("doc_id", F.split("text", " ").alias("ws"))
             .select("doc_id", F.expr(_spark_shingles()).alias("shs"))
             .select("doc_id",
                     F.array(*[F.expr(_spark_sig(j))
                               for j in range(K_HASHES)]).alias("sig"))
             .select("doc_id",
                     F.explode(F.expr(_spark_bands())).alias("band"))
             # a <3-word doc signs to NULL bands; the batch equality
             # join can never match NULL = NULL, but a streaming
             # groupBy would collect all such docs into ONE null-key
             # state group and emit phantom pairs — drop them here so
             # stream and batch agree on tiny docs too
             .filter(F.col("band").isNotNull()))
    return (bands.groupBy("band")
            .applyInPandasWithState(
                emit, OUT_SCHEMA, _STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
