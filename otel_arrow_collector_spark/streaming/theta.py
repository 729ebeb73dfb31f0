"""Streaming KMV theta sketch — the stateful twin of the batch theta
queries in ``operators/sketches.py``.

KMV is mergeable by construction: the bottom-K set of a union is the
bottom-K of the merged bottom-K sets, so a per-set state holding the
sorted bottom-THETA_K distinct 48-bit hashes folds micro-batches with
plain sorted-set insertion + truncation, and after batch k the state is
EXACTLY the batch operator's ``kept`` relation over the concatenation
of batches 1..k (pinned by the batch-equivalence test).  Duplicate
arrivals of a user hash to the same value, so re-delivery cannot skew
the sketch — the idempotence HLL gets from register MAX, KMV gets from
set semantics.  State size is <= THETA_K hashes per set regardless of
stream length.

The hash is the SAME SQL expression the batch side uses
(``_theta_hash_sql``), evaluated in the stateless pre-state projection,
so stream and batch cannot diverge on hashing (the 48-bit md5
polynomial is itself pinned against hashlib in tests/test_hll_cms.py).

Reference analogue: arrival-order stateful processing (SURVEY §2.9);
the sketch itself is an engine-added scale operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StringType,
                               StructField, StructType)

from ..operators.sketches import (THETA_K, THETA_RANGE, _theta_hash_sql)

OUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("n_kept", LongType()),
    StructField("th", LongType()),
    StructField("est", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("hashes", ArrayType(LongType())),
])


def theta_stream(events: DataFrame, key_col: str = "user_id",
                 set_col: str = "event_type") -> DataFrame:
    """Streaming theta sketch per ``set_col`` group: each batch emits
    an update-mode snapshot (set, n_kept, th, est) with the batch
    operator's exact threshold/estimate rules — th is the K-th
    smallest retained hash once saturated (else the full range), est
    is (K-1) * 2^48 // th saturated, else the exact kept count."""
    rows = events.select(
        F.col(set_col).alias("skey"),
        F.expr(_theta_hash_sql(key_col, "STRING")).cast("long")
         .alias("hv"))

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        kept: list[int] = list(state.get[0]) if state.exists else []
        ks = set(kept)
        for pdf in pdfs:
            for hv in pdf["hv"]:
                hv = int(hv)
                if hv not in ks:
                    ks.add(hv)
        kept = sorted(ks)[:THETA_K]
        state.update((kept,))
        n = len(kept)
        if n >= THETA_K:
            th = kept[THETA_K - 1]
            est = (THETA_K - 1) * THETA_RANGE // th
        else:
            th, est = THETA_RANGE, n
        yield pd.DataFrame({"event_type": [key[0]],
                            "n_kept": [n], "th": [th], "est": [est]})

    return rows.groupBy("skey").applyInPandasWithState(
        update, OUT_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
