"""Skew-mitigation operators — salting for hot keys.

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime; salting is the *declared* alternative when a key's fan-out is
known to be pathological (a handful of trace_ids carrying millions of
spans, one `lang` dominating a corpus):

- ``salted_join``: replicate the small side N ways, scatter the big side's
  hot keys across N sub-keys — the classic replicate-and-scatter plan.
  Each hot key's rows spread over N tasks instead of one straggler.
- ``salted_distinct_count``: two-phase distinct over (key, salt) — the
  partial-aggregate trick for COUNT(DISTINCT) whose single-key state would
  otherwise concentrate on one reducer.

Both are deterministic given ``salt_col``'s derivation (hash of a
tiebreaker column, not rand()), so results are reproducible and tests can
oracle them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_from: str, n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with the small side replicated ``n_salts`` ways.

    ``salt_from`` is a column of ``big`` whose hash spreads rows of one
    key across salts (e.g. the row's unique id).  The join key becomes
    (key, salt) so each hot key occupies ``n_salts`` shuffle partitions.
    The salt columns are dropped from the result.
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_from)), F.lit(n_salts)))
    salted_small = (small
                    .withColumn("__salt", F.explode(
                        F.sequence(F.lit(0), F.lit(n_salts - 1))))
                    .withColumn("__salt", F.col("__salt").cast("int")))
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(df: DataFrame, group_key: str, distinct_col: str,
                          n_salts: int = 16) -> DataFrame:
    """COUNT(DISTINCT distinct_col) per group_key via two-phase salting:
    phase 1 dedups (key, salt, value) shards, phase 2 merges shard counts.
    Equivalent to the direct query; scales when one group dominates."""
    phase1 = (df.withColumn("__salt",
                            F.pmod(F.hash(F.col(distinct_col)),
                                   F.lit(n_salts)))
                .groupBy(group_key, "__salt")
                .agg(F.countDistinct(distinct_col).alias("__partial")))
    return (phase1.groupBy(group_key)
                  .agg(F.sum("__partial").cast("long").alias("n_distinct")))
