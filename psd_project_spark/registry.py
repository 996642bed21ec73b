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
# Round-9 rotation (VERDICT r08 "Next round" #1): round 9's six new
# operators (the persisted-IVF trio, the streaming MinHash screen,
# the co-located bucketed join, the bucketed range join) and the
# three round-8 operators that shipped without a driver row lead the
# window (stream_index_maintain, quality_classifier_eval,
# quality_calibration — the zero-queue breach this rotation repairs),
# then EVERY query of
# every module functionally changed in round 8 — sampling.py (the
# chunked-rank rewrite of source_mix_rebalance plus the content-hash
# helper migration), governance.py (same migration), quality_classifier
# .py (eval/calibration tier, prefix-sum rewrite of mixture_resample,
# model memo, store fingerprint), exact_substr.py (stream_index_
# maintain, MAX_EPOCH_DOCS guard), similarity.py (MAX_EPOCH_QUERIES
# guard, cached epoch ids) — so their pre-rewrite rows are replaced by
# current-bytes rows. dedup.py is untouched, but its persisted-index
# queries flow through index_compact.py, which round 9 touches for the
# per-bucket compaction / persisted-IVF work (the r06/r07 precedent:
# a changed dependency re-windows exactly the queries it affects) —
# minhash_index_* therefore re-enter. Spares re-verify the reference
# risk surface and the core streaming battery. Outside the window:
# queries
# in files untouched since their last green row (freq_sketch.py,
# streaming/foreach_sink.py, risk.py's value_histogram, the relational
# /tpch tiers, text_analysis/text_curation/dedup batch tiers — all
# hold r08-or-earlier rows over unchanged bytes; stream_session_windows
# / stream_stream_join / stream_upsert_latest / dedup_ngram_jaccard
# yielded their r7-spare slots, each holding a green r08 row). NO
# queue: every registry query holds or re-earns a current-bytes driver
# row (tests/test_registry_order.py).
_PRIORITY = (
    # -- round-9 new operators (front: day-one driver rows) ------------
    "ivf_index_search",
    "ivf_index_compaction",
    "stream_ivf_search",
    "stream_minhash_screen",
    "bucketed_join_roundtrip",
    "range_join_overlap",
    "scd2_history",
    # -- round-8 operators owed their day-one driver row ---------------
    "stream_index_maintain",
    "quality_classifier_eval",
    "quality_calibration",
    # -- operators/sampling.py (chunked_rank rewrite + hash migration) -
    "train_val_split",
    "source_mix_rebalance",
    "stratified_sample",
    "token_budget_packing",
    # -- operators/governance.py (hash-helper migration) ---------------
    "k_anonymity_release",
    "weighted_sample",
    "training_shard_export",
    # -- operators/quality_classifier.py (module changed in r8) --------
    "quality_classifier_train",
    "quality_classifier_score",
    "stream_quality_score",
    "quality_store_incremental",
    "domain_mixture_weights",
    "mixture_resample",
    # -- operators/exact_substr.py (module changed in r8) --------------
    "dedup_exact_substr",
    "exact_substr_cut",
    "decontaminate_substr",
    "decontaminate_cut",
    "substr_index_incremental",
    "stream_crawl_screen",
    # -- operators/similarity.py (module changed in r8) ----------------
    "knn_cosine",
    "ann_index_export",
    "ann_index_incremental",
    "ann_index_compaction",
    "stream_ann_search",
    "ann_lsh_cosine",
    "ivf_ann_cosine",
    "embedding_centroids",
    "kmeans_embeddings",
    "cluster_balanced_sample",
    "dedup_embedding_lsh",
    "semantic_dedup",
    # -- dedup.py index-lifecycle queries (index_compact.py changes
    #    in r9: per-bucket compaction + persisted IVF) -----------------
    "minhash_index_export",
    "minhash_index_incremental",
    "minhash_index_compaction",
    # -- spares: reference risk surface re-verification ----------------
    "measures_agg",
    "measures_window",
    "alerts_batch",
    "alert_counts",
    # -- spares: core streaming battery --------------------------------
    "stream_ingest_dedup",
    "measures_window_stream",
    # (stream_dedup_users + quality_features + events_time_windows +
    # psd_samples_source + alert_log_roundtrip + alerts_stream +
    # portfolio_projection yielded their spare slots to the round-9
    # additions — the persisted-IVF trio, the streaming MinHash
    # screen, the co-located bucketed join, the bucketed range join,
    # and the SCD2 history: all seven hold green r08 rows over bytes
    # untouched since)
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
