"""Operator surface of the engine.

- ``relational``  — SURVEY.md §2.8 declared queries (the executable spec of
  the reference's operator inventory), DataFrame-first.
- ``dedup``       — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  fingerprint deduplication over ``documents``.
- ``similarity``  — embedding ANN: brute-force cosine top-k, LSH buckets, IVF.
- ``text``        — language-ID, quality scoring, token counting.
- ``sampling``    — deterministic stratified sampling + train/val/test splits.
- ``curation``    — sequence packing, contamination screen, shuffle layout.
- ``multimodal``  — binary-column decode/feature plumbing (mapInPandas).
- ``sketches``    — Misra-Gries heavy hitters, HyperLogLog, count-min
  (point + join-size estimation), sampled rank-exact quantiles.
- ``graph``       — oriented-wedge triangle counting, integer
  fixed-point PageRank.
- ``batching``    — batch processor semantics (size/time/split) in batch mode.

Codec modules consumed by ``multimodal``: ``jpeg`` ``gif`` ``qoi``
``netpbm`` ``tiff`` ``g711`` ``adpcm`` (plus ``sources/warc.py`` and
``sources/archive.py`` for the corpus containers).

Each module exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB SQL) consumed by
``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def collect_registry() -> tuple[
    dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]
]:
    """Gather every operator module's queries + oracles into one registry."""
    from . import (curation, dedup, graph, multimodal, relational,
                   sampling, similarity, sketches, text)

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (relational, dedup, similarity, text, sampling, curation,
                multimodal, sketches, graph):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
