"""Streaming Herfindahl-Hirschman concentration monitor — the stateful
twin of ``operators/relational.q114_herfindahl`` (micro-batch = revenue
deltas, per-nation supplier revenue vector = keyed state).

State per nation is the dict {suppkey: cents-sum} — DIMENSION-bounded
(suppliers are a dimension table; the state never grows with fact
volume, the q114 docstring's own magnitude argument), the
changepoint/seasonal state class one step up (bounded by a dimension
instead of the calendar).  Each batch's (suppkey, cents) rows ADD into
the vector and the nation re-emits its CURRENT (n_suppliers,
total_cents, hhi_bp) — integer arithmetic identical to the batch query
(floor basis-point shares, floored sum-of-squares), so the final
emission is EXACTLY the batch answer, not an estimate: sums are
commutative, hence arrival-order and batch-split invariance hold with
equality (pytest-pinned), unlike the one-sided Bloom twin.

Delivery contract: ADDITIVE deltas — re-delivering a fact row would
double-count, exactly as it would in the batch SUM.  The operator
therefore sits behind a checkpointed exactly-once source (the
ewma/slo/bootstrap twins' contract), pinned by the
restart-from-checkpoint test rather than a duplication test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StructField,
                               StructType)

OUT_SCHEMA = StructType([
    StructField("nation", LongType()),
    StructField("n_suppliers", LongType()),
    StructField("total_cents", LongType()),
    StructField("hhi_bp", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("suppkeys", ArrayType(LongType())),
    StructField("cents", ArrayType(LongType())),
])


def _emit_hhi(key, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    vec = (dict(zip(state.get[0], state.get[1]))
           if state.exists else {})
    touched = False
    for pdf in pdfs:
        for sk, c in zip(pdf["suppkey"], pdf["cents"]):
            vec[int(sk)] = vec.get(int(sk), 0) + int(c)
            touched = True
    if touched:
        ks = sorted(vec)
        state.update((ks, [vec[k] for k in ks]))
    total = sum(vec.values())
    # identical integer arithmetic to the batch query: floor bp shares,
    # floored sum-of-squares (exact decimal headroom is not needed in
    # Python — ints are unbounded)
    hhi = (sum((10000 * c // total) ** 2 for c in vec.values()) // 10000
           if total else 0)
    yield pd.DataFrame({"nation": [key[0]],
                        "n_suppliers": [len(vec)],
                        "total_cents": [total],
                        "hhi_bp": [hhi]})


def hhi_stream(revenue: DataFrame) -> DataFrame:
    """Streaming HHI: ``revenue`` (nation, suppkey, cents deltas) ->
    update-mode (nation, n_suppliers, total_cents, hhi_bp), the running
    concentration index per nation."""
    return (revenue.select("nation", "suppkey", "cents")
            .groupBy("nation")
            .applyInPandasWithState(
                _emit_hhi, OUT_SCHEMA, _STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
