"""Streaming hash-Poisson bootstrap — the stateful twin of
``operators/sampling.py::sample_bootstrap``.

Oza & Russell 2001 ("Online bagging and boosting") is literally the
STREAMING form of the bootstrap: each arriving row draws its Poisson(1)
multiplicity per replicate and the resample statistics are running
sums.  Because the multiplicity here is a deterministic hash of
(replicate, order key) — the batch operator's exact recipe, same
28-bit polynomial, same literal CDF thresholds — the stream needs no
custom state at all: ONE built-in streaming aggregation per replicate
id carries (sum w, sum w*cents) across micro-batches, and the snapshot
after batch k EQUALS the batch operator over the concatenation of
batches 1..k (pinned by the batch-equivalence test).  Re-delivery of a
row changes the sums (streaming aggs count every arrival), so this
twin rides exactly-once file-source semantics — checkpointed offsets,
the Structured Streaming default — rather than idempotent state.

State size: BOOTSTRAP_B rows of two counters, regardless of stream
length — the whole point of the online bootstrap.

Reference analogue: arrival-order stateful processing (SURVEY §2.9);
the resampler itself is an engine-added scale operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import (BOOTSTRAP_B, _hexint_sql,
                                  _poisson1_thresholds)


def bootstrap_stream(orders: DataFrame) -> DataFrame:
    """Streaming bootstrap replicates: update-mode snapshots of
    (b, n_eff, mean_cents) with the batch operator's exact hash
    weights.  ``orders`` needs ``o_orderkey`` and ``cents``."""
    ts = _poisson1_thresholds()
    h = _hexint_sql(
        "md5(concat('boot:', CAST(b AS STRING), ':',"
        " CAST(o_orderkey AS STRING)))", 7, "substring")
    w_expr = " + ".join(
        f"(CASE WHEN hv >= {t} THEN 1 ELSE 0 END)" for t in ts)
    return (orders
            .select("cents", "o_orderkey",
                    F.explode(F.expr(
                        f"sequence(0, {BOOTSTRAP_B - 1})")).alias("b"))
            .select("cents", "b", F.expr(h).cast("long").alias("hv"))
            .select("cents", "b", F.expr(w_expr).alias("w"))
            .groupBy("b")
            .agg(F.sum("w").cast("long").alias("n_eff"),
                 F.sum(F.col("w") * F.col("cents")).alias("tot"))
            .select(F.col("b").cast("long").alias("b"), "n_eff",
                    F.expr("tot div n_eff").cast("long")
                    .alias("mean_cents")))
