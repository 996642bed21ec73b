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
# Round-15 rotation (optimization round 2): the re-entering queries of
# the modules round 15 functionally touches lead the window —
# operators/scd.py (CDF producer pipelining, bucketed stagings, ADVICE
# r14 hardenings), streaming/foreach_sink.py (staged-bucket sidecars +
# run_foreachbatch_versioned fast path), operators/text_curation.py +
# operators/text_analysis.py (the fused one-pass quality-feature
# extraction, VERDICT r14 #1) — per the module-level precedent every
# query those modules register re-windows — plus the
# changed-dependency consumers: the 8 quality_classifier.py queries
# (every one flows through the changed quality_features bytes) and
# stream_value_quantiles_sink (freq_sketch.py flows through the
# changed run_foreachbatch_versioned). run_stream / write_epoch /
# stage_stream_splits / apply_versioned_epoch stay byte-identical, so
# the foreachBatch streams that only run through those (bucketing,
# index_delete, minhash_stream, exact_substr, similarity, range_join,
# zorder) keep their r10-r14 rows. Spares: the stale-row burn-down —
# the 5 alphabetically-first of the 12 remaining r06 rows
# (cross_dedup_minhash, decontaminate_ngrams, dedup_canonical,
# dedup_components, dedup_embedding_1nn); the other 7 r06 rows stand
# over modules untouched since and are covered by this round's
# in-session full-registry sweep. NO queue: every registry query holds
# or re-earns a current-bytes driver row (tests/test_registry_order.py).
_PRIORITY = (
    # -- re-entering: operators/scd.py (module-level) ------------------
    "cdf_consumer_eviction",
    "cdf_multi_consumer",
    "cdf_feed_retention",
    "cdf_materialized_view",
    "scd2_change_feed",
    "scd2_schema_evolution",
    "scd2_history",
    "scd2_time_travel",
    "asof_feature_join",
    "stream_asof_lookup",
    "stream_scd2_maintain",
    "stream_scd2_erase",
    "stream_scd2_serve",
    # -- re-entering: streaming/foreach_sink.py (module-level) ---------
    "stream_upsert_rename",
    "stream_upsert_rebucket",
    "stream_upsert_widening",
    "stream_upsert_latest",
    "stream_upsert_evolving",
    # -- re-entering: operators/text_curation.py (module-level) --------
    "quality_features",
    "boilerplate_screen",
    "repetition_metrics",
    "doc_chunking",
    "pii_redact",
    # -- re-entering: operators/text_analysis.py (module-level) --------
    "doc_stats",
    "ngram_familiarity",
    "corpus_quality_filter",
    "curation_pipeline",
    "lang_id",
    "token_freq",
    "trigram_udtf_freq",
    "tfidf_top_terms",
    "bm25_rank",
    "dsir_weights",
    "doc_fingerprint",
    "bpe_vocab_train",
    "bpe_encode_stats",
    # -- re-entering: changed-dependency consumers ----------------------
    # (quality_classifier.py — every query flows through the fused
    #  quality_features bytes)
    "quality_classifier_train",
    "quality_classifier_score",
    "quality_classifier_eval",
    "quality_calibration",
    "stream_quality_score",
    "quality_store_incremental",
    "domain_mixture_weights",
    "mixture_resample",
    # (freq_sketch.py — flows through run_foreachbatch_versioned)
    "stream_value_quantiles_sink",
    # -- spares: stale-row burn-down (5 of the 12 remaining r06 rows,
    #    alphabetically first) ------------------------------------------
    "cross_dedup_minhash",
    "decontaminate_ngrams",
    "dedup_canonical",
    "dedup_components",
    "dedup_embedding_1nn",
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
    "psd_project_spark.operators.index_delete",
    "psd_project_spark.operators.zorder",
    "psd_project_spark.operators.shuffling",
    "psd_project_spark.operators.minhash_stream",
    "psd_project_spark.operators.bucketing",
    "psd_project_spark.operators.range_join",
    "psd_project_spark.operators.scd",
    "psd_project_spark.operators.exact_substr",
    "psd_project_spark.operators.quality_classifier",
    "psd_project_spark.operators.sampling",
    "psd_project_spark.operators.similarity",
    "psd_project_spark.operators.multimodal",
    "psd_project_spark.operators.scalar_functions",
    "psd_project_spark.operators.sketches",
    "psd_project_spark.operators.freq_sketch",
    "psd_project_spark.operators.packing",
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
    import functools

    from psd_project_spark.functions.caching import release_transient

    def _wrap(name: str, fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
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
