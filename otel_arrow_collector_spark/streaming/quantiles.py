"""Streaming quantiles — a stateful, MERGEABLE fixed-width-histogram
quantile estimator, the cross-batch twin of the rank-selection scale
path (operators/sketches.py engine.rank_select_scale).

State per group is one integer count vector over a fixed value-domain
cut (n_bins equal-width bins between configured lo..hi) — mergeable by
plain addition across micro-batches, shards, or days, the property a
100 TB rollup needs.  The quantile estimate is DETERMINISTIC integer
work: the value bin whose cumulative count first reaches
ceil(q * n / 100), published as the bin's inclusive upper bound.  The
bin derivation is bit-identical to the batch twin
(:func:`bin_quantiles_batch` — Spark ``width_bucket`` with the same
lo/hi+1/n_bins operands), so the streaming snapshot after the last
batch EQUALS the batch answer on the same rows, pinned in
tests/test_quantiles_stream.py.

Accuracy is the bin width (exact rank, quantized value) — the usual
histogram-sketch trade; callers needing exact values run the batch
rank-selection path instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StructField,
                               StructType)

OUT_SCHEMA = StructType([
    StructField("grp", LongType()),
    StructField("q", LongType()),
    StructField("value_ub", LongType()),
    StructField("n", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("counts", ArrayType(LongType())),
])


def _bin_index(v: int, lo: int, hi: int, n_bins: int) -> int:
    """0-based bin of ``v`` — integer-exact mirror of Spark's
    ``width_bucket(v, lo, hi + 1, n_bins) - 1`` for v in [lo, hi]."""
    return (v - lo) * n_bins // (hi + 1 - lo)


def _quantiles_from_counts(counts: list[int], qs: tuple[int, ...],
                           lo: int, hi: int, n_bins: int):
    n = sum(counts)
    out = []
    width_num = hi + 1 - lo
    for q in qs:
        target = (q * n + 99) // 100
        cum = 0
        ub = None
        for b, c in enumerate(counts):
            cum += c
            if cum >= target:
                # inclusive upper bound of bin b: lo + ((b+1)*w)/nb - 1
                ub = lo + ((b + 1) * width_num) // n_bins - 1
                break
        out.append((q, ub if ub is not None else hi, n))
    return out


def bin_quantiles_stream(events: DataFrame, lo: int, hi: int,
                         n_bins: int = 256,
                         qs: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """Per-group streaming quantile snapshots: after each micro-batch,
    one row per (grp, q) with the current estimate over ALL rows seen
    so far.  ``events`` needs long columns grp and v, v within
    [lo, hi]."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        counts = list(state.get[0]) if state.exists else [0] * n_bins
        for pdf in pdfs:
            for v in pdf["v"]:
                counts[_bin_index(int(v), lo, hi, n_bins)] += 1
        state.update((counts,))
        grp = int(key[0])
        rows = [{"grp": grp, "q": q, "value_ub": ub, "n": n}
                for q, ub, n in _quantiles_from_counts(
                    counts, qs, lo, hi, n_bins)]
        yield pd.DataFrame(rows)

    return events.groupBy("grp").applyInPandasWithState(
        update, OUT_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)


def bin_quantiles_batch(events: DataFrame, lo: int, hi: int,
                        n_bins: int = 256,
                        qs: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """The batch twin, as pure column work: width_bucket bin counts,
    a per-group cumulative over <= n_bins rows, and the same
    ceil-rank bin pick — bit-identical operands to the stream's
    _bin_index, so the two paths agree exactly."""
    from pyspark.sql import Window
    binned = events.select(
        "grp", (F.width_bucket("v", F.lit(lo), F.lit(hi + 1),
                               F.lit(n_bins)) - 1).alias("b"))
    counts = binned.groupBy("grp", "b").agg(
        F.count(F.lit(1)).alias("c"))
    w = (Window.partitionBy("grp").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (counts
           .withColumn("cum", F.sum("c").over(w))
           .withColumn("n", F.sum("c").over(Window.partitionBy("grp"))))
    qdf = F.broadcast(events.sparkSession.createDataFrame(
        [(int(q),) for q in qs], "q long"))
    hits = (cum.crossJoin(qdf)
            .filter(F.col("cum") >= F.expr("(q * n + 99) div 100"))
            .groupBy("grp", "q")
            .agg(F.min("b").alias("b"), F.max("n").alias("n")))
    ub = F.lit(lo) + F.expr(f"((b + 1) * {hi + 1 - lo}) div {n_bins}") - 1
    return hits.select("grp", "q", ub.cast("long").alias("value_ub"),
                       F.col("n").cast("long").alias("n"))
