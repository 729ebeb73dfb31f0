"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real implementations live in ``otel_arrow_collector_spark``; this module
only adapts them to the driver contract.  NOTE: the engine needs
``spark.sql.legacy.parquet.nanosAsLong=true`` and session timezone UTC (set
in ``otel_arrow_collector_spark.session.get_spark``); ``entry``/``queries``
assert/repair what they can on a caller-provided session.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from otel_arrow_collector_spark.operators import collect_registry

_QUERIES, _ORACLES = collect_registry()


def _prepare(spark: SparkSession) -> SparkSession:
    """Assert engine-required session settings on a driver-provided session.

    ``nanosAsLong`` is a startup conf (cannot be set post-JVM-start); if the
    driver's session lacks it, events.ts loading falls back to the
    timestamp branch of the loader (sources/tables.py handles both).
    Timezone IS runtime-settable and must be UTC for calendar parity.
    ANSI mode is also runtime-settable: PySpark 4.x defaults it ON, while
    the engine's own sessions pin it OFF (session.py) — set it here so a
    driver-provided session evaluates the same arithmetic the builder's
    parity gate verified (overflow/cast/div-by-zero behavior included).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already-started JVM without the flag; loader copes
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q05: grouped event counters — the reference's
    receive->count->export loop) on /root/testdata/sf0.001."""
    _prepare(spark)
    return _QUERIES["q05_groupby"](spark, "/root/testdata/sf0.001")


#: Newest-first ordering hint: the driver's correctness gate samples a
#: subset of entries in iteration order, so surfacing the most recently
#: added queries first gets each of them a driver-recorded row at least
#: once (older entries retain committed PARITY_r{N}.txt evidence).
_NEWEST_FIRST = [
    # FIRST: round-13 additions (commit-checklist rule: every new query
    # gets a slot here).
    "dedup_bucket_cap_audit", "dedup_prefix_cost_model",
    # THEN the 26 stalest driver rows (verdict r12 ask #2 — newest
    # driver evidence r05/r06; all pass the r12 263/263 local parity
    # sweep, but the driver's own ledger is 6+ rounds old):
    "dedup_semantic", "multimodal_mp4_meta", "multimodal_video_frames",
    "text_tfidf_search", "dedup_keep_best", "dedup_substring",
    "embedding_outliers", "embedding_quantize_int8",
    "heavy_hitter_events", "multimodal_audio_windows", "pack_sequences",
    "sample_split", "sample_stratified", "shuffle_shards",
    "sketch_cms_counters", "sketch_cms_join_size", "sketch_hll_by_group",
    "sketch_hll_registers", "temperature_mix", "text_bigram_lm",
    "text_bm25_search", "text_bpe_tokens", "text_df_topterms",
    "text_pii_scrub", "text_quality_classifier",
    # — the next-stalest (r07) band —
    "ann_cosine_topk", "ann_ivf_probe", "dedup_ngram_jaccard",
    "dedup_simhash", "text_langid", "text_quality_score",
    # The histogram-merge family re-timed/re-planned in r13
    # (HIST_PROFILE_r13.json) — fresh driver rows wanted:
    "q36_exp_histogram_merge", "q41_histogram_merge",
    "q42_histogram_quantile", "q48_exp_histogram_quantile",
    # Round-12 additions keep a toe-hold; everything else follows in
    # registry order (all have green driver rows r08-r12).
    "q116_zorder_pruning", "q117_fuzzy_name_match",
    "dedup_incremental_epoch2", "dedup_incremental_epoch2_delta",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_prepare(spark), sf_dir)
        return run
    ordered = [n for n in _NEWEST_FIRST if n in _QUERIES]
    ordered += [n for n in _QUERIES if n not in _NEWEST_FIRST]
    return {name: wrap(_QUERIES[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL ops)."""
    return {name: sql.strip() for name, sql in _ORACLES.items()}
