"""Shared quality-score Column (the ``text_quality_classifier`` linear
model) — importable by other operators (e.g. quality-aware dedup)
without circular imports."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quality_score_col() -> Column:
    """Integer quality score over a ``text`` column: the fixed linear
    model of ``text_quality_classifier`` (token count, stopword hits,
    digit density, lexical diversity) — exact across engines."""
    words = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                     lambda x: x != "")
    n_words = F.size(words)
    stop_hits = F.size(F.filter(
        words, lambda x: x.isin("the", "a", "fast", "slow")))
    n_digits = F.length(F.regexp_replace("text", "[^0-9]", ""))
    n_distinct = F.size(F.array_distinct(words))
    return (F.lit(2) * n_words + F.lit(50) * stop_hits
            - F.lit(10) * n_digits
            + F.floor(n_distinct * 1000 / n_words).cast("long"))
