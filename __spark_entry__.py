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
    # FIRST: round-14 additions (commit-checklist rule: every new query
    # gets a slot here) — prepended as they land.
    "text_bpe_capacity", "dedup_incremental_prefix",
    "embedding_pca_covariance",
    # THEN the 28 stalest driver rows (verdict r13 ask #1 — newest
    # driver evidence r06-r08; all green in the full 265-query
    # PARITY_r13 sweeps, but the driver's own ledger should rotate):
    "text_repetition", "sketch_hll_estimate", "sketch_cms_point",
    "sketch_quantile_sampled", "graph_triangle_count", "graph_pagerank",
    "ann_pq_codes", "embedding_mrl_energy", "dedup_cross_corpus",
    "bloom_screen", "sample_weighted", "cc_pipeline",
    "text_gopher_rules", "text_html_extract", "text_url_domains",
    "ann_lsh_buckets", "ann_ivf_assign", "text_token_stats",
    "text_fingerprint", "multimodal_binary_meta", "ann_knn_graph",
    "multimodal_gif_decode", "q91_rate_limit", "cc_pipeline_warc",
    "sketch_hll_union", "sketch_quantile_binned",
    "multimodal_decode_quarantine", "ann_ivf_cell_quality",
    # Queries whose plans were touched this round (verdict asks #2-#6 +
    # ADVICE fixes) — fresh driver rows wanted on the changed code:
    "text_bpe_merge", "text_bpe_tokens", "sample_bootstrap",
    "text_dedup_spans", "q110_corr_screen",
    "q36_exp_histogram_merge", "q41_histogram_merge",
    "q42_histogram_quantile", "q48_exp_histogram_quantile",
    "multimodal_audio_windows", "dedup_incremental_epoch2_delta",
    "dedup_allpairs_prefix", "dedup_prefix_cost_model",
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
