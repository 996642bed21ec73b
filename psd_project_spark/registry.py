"""Central query registry: aggregates every operator module's queries.

Each operator module exposes ``QUERIES: dict[name, (callable,
oracle_sql | None)]`` where the callable is ``(spark, sf_dir) ->
DataFrame`` and the SQL (when present) is the DuckDB-equivalent used by
the correctness driver. ``__spark_entry__.py`` re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The correctness driver only checks the FIRST 50 registry entries (in
# iteration order), so ordering is part of the verification contract.
# Round-3 rotation: positions 1-31 are the 29 queries never checked by
# the driver in rounds 1-2 (registry minus r01∪r02 windows) plus the
# two round-1 hash failures whose oracle-typing casts landed in commit
# c818c16 but were never driver-re-verified (q12_late_shipment_priority,
# value_outliers); then the eight round-3 additions (also never
# checked).  The remaining slots re-verify the highest-value
# representatives (the reference risk surface + one per extension
# family).  With this window green, every registry query EXCEPT the
# eight r01/r02-green rows that made room (portfolio_projection,
# value_histogram, alert_counts, measures_window_np, measures_window,
# stream_stream_join, kmeans_embeddings, dedup_embedding_1nn — the
# last two pinned at sf0.1 by their own tests) has a driver row this
# round, and every query has one across rounds.
_PRIORITY = (
    # -- never driver-checked (rounds 1-2) ---------------------------
    "table_profile",
    "incremental_rollup",
    "weighted_median",
    "part_price_quartiles",
    "vector_quantize_int8",
    "mad_by_type",
    "resample_ffill",
    "ewma_user_value",
    "partitioned_parquet_roundtrip",
    "fuzzy_name_match",
    "hourly_top_spenders",
    "rolling_dau",
    "retention_cohorts",
    "event_transitions",
    "compression_ratio",
    "trigram_udtf_freq",
    "corpus_quality_filter",
    "curation_pipeline",
    "dedup_embedding_lsh",
    "json_props_stats",
    "props_variant_stats",
    "approx_distinct_users",
    "approx_price_quantiles",
    "orders_by_month",
    "customer_name_parse",
    "distinct_users_per_type",
    "hll_reach_rollup",
    "psd_samples_source",
    "alert_log_roundtrip",
    # -- cast-fixed in round 2, pending driver re-verification -------
    "q12_late_shipment_priority",
    "value_outliers",
    # -- round-3 additions (never driver-checked, by definition) -----
    "semantic_dedup",
    "cross_dedup_minhash",
    "ngram_familiarity",
    "source_mix_rebalance",
    "bpe_vocab_train",
    "dedup_exact_then_minhash",
    "boilerplate_screen",
    "quality_features",
    # -- re-verification: reference risk surface (SURVEY §2.1-2.8) ---
    "measures_agg",
    "alerts_batch",
    "measures_window_stream",
    # -- re-verification: one per extension family -------------------
    "dedup_minhash_lsh",
    "ann_lsh_cosine",
    "doc_fingerprint",
    "pii_redact",
    "media_features",
    "k_anonymity_release",
    "events_time_windows",
    "nearest_view_lag",
)

_MODULES = (
    "psd_project_spark.operators.risk",
    "psd_project_spark.operators.relational",
    "psd_project_spark.operators.relational_tpch",
    "psd_project_spark.operators.relational_tpch3",
    "psd_project_spark.operators.analytics_extra",
    "psd_project_spark.operators.timeseries",
    "psd_project_spark.operators.fuzzy_join",
    "psd_project_spark.operators.behavior",
    "psd_project_spark.operators.governance",
    "psd_project_spark.operators.text_analysis",
    "psd_project_spark.operators.text_curation",
    "psd_project_spark.operators.dedup",
    "psd_project_spark.operators.sampling",
    "psd_project_spark.operators.similarity",
    "psd_project_spark.operators.multimodal",
    "psd_project_spark.operators.scalar_functions",
    "psd_project_spark.operators.sketches",
    "psd_project_spark.operators.skew",
    "psd_project_spark.sources.jsonl",
    "psd_project_spark.sources.orc",
    "psd_project_spark.sources.python_ds_query",
    "psd_project_spark.sources.alert_log",
    "psd_project_spark.streaming.jobs",
    "psd_project_spark.streaming.foreach_sink",
)


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    import importlib

    raw: dict[str, tuple[QueryFn, str | None]] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, entry in mod.QUERIES.items():
            if name in raw:
                raise ValueError(f"duplicate query name: {name}")
            raw[name] = entry
    missing = [n for n in _PRIORITY if n not in raw]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    out = {name: raw[name] for name in _PRIORITY}
    out.update((n, e) for n, e in raw.items() if n not in out)
    return out


def queries() -> dict[str, QueryFn]:
    from psd_project_spark.functions.caching import release_transient

    def _wrap(name: str, fn: QueryFn) -> QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # scratch caches from the PREVIOUS query are released at
            # the next query's entry — see functions/caching.py
            release_transient()
            return fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: _wrap(name, fn) for name, (fn, _) in _collect().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _collect().items() if sql is not None
    }
