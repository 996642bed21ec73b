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
# Round-10 rotation (VERDICT r09 "Next round" #1, rotated FIRST): the
# round-10 additions lead the window as they land — asof_feature_join
# and stream_scd2_maintain (both in scd.py) — followed by every query
# of every module round 10 functionally touches: scd.py (the two new
# queries live beside scd2_history), range_join.py (the pair builder
# is factored out for the skew pin), bucketing.py (per-table
# fingerprints + the bucket-aligned delta-append write path), and —
# by the r06/r07/r09 changed-dependency precedent (a changed
# dependency re-windows exactly the queries it affects) —
# stream_upsert_latest and stream_value_quantiles_sink, whose merge
# paths move onto the generic versioned foreachBatch runner (with
# version retention) in streaming/foreach_sink.py that the SCD2
# maintenance stream shares (run_stream itself is byte-unchanged, so
# the foreachBatch streams that only run through it keep their r9
# rows).
# functions/vectors.py is also touched, but only inside
# make_nn_kernel (the size-gate on its driver collect), which no
# registry query calls — its sole caller is the non-registry
# differential baseline dedup_embedding_1nn_collect — so no query
# re-enters for it. The remaining slots are documented spares holding
# their full-r9-window green rows: the persisted-index lifecycles,
# the classifier/sampling/governance/exact_substr/similarity
# families, the reference risk surface, and the core streaming
# battery. Yields by name (each yielder holds a green r9 row over
# bytes untouched in r10): quality_store_incremental →
# stream_upsert_latest, domain_mixture_weights → asof_feature_join,
# mixture_resample → stream_scd2_maintain, cluster_balanced_sample →
# stream_range_overlap, and — after the late-round exact_substr
# staging fix re-windowed that family's earlier yielders
# stream_crawl_screen and decontaminate_cut — train_val_split →
# stream_asof_lookup and token_budget_packing →
# stream_value_quantiles_sink. NO queue: every registry query holds
# or re-earns a current-bytes driver row
# (tests/test_registry_order.py).
_PRIORITY = (
    # -- round-10 new + re-entering (front: day-one driver rows) -------
    "asof_feature_join",
    "stream_scd2_maintain",
    "stream_asof_lookup",
    "scd2_history",
    "range_join_overlap",
    "stream_range_overlap",
    "bucketed_join_roundtrip",
    "stream_upsert_latest",
    "stream_value_quantiles_sink",
    # -- spares: round-9 operators re-verified over unchanged bytes ----
    "ivf_index_search",
    "ivf_index_compaction",
    "stream_ivf_search",
    "stream_minhash_screen",
    "stream_index_maintain",
    "quality_classifier_eval",
    "quality_calibration",
    # -- spares: sampling.py family (green r9 rows, untouched;
    #    train_val_split and token_budget_packing yielded their slots
    #    to the re-entering exact_substr pair) -------------------------
    "source_mix_rebalance",
    "stratified_sample",
    # -- spares: governance.py family (green r9 rows, untouched) -------
    "k_anonymity_release",
    "weighted_sample",
    "training_shard_export",
    # -- spares: quality_classifier.py family (green r9 rows,
    #    untouched; quality_store_incremental yielded its slot to the
    #    re-entering stream_upsert_latest, domain_mixture_weights to
    #    asof_feature_join, mixture_resample to stream_scd2_maintain) --
    "quality_classifier_train",
    "quality_classifier_score",
    "stream_quality_score",
    # -- exact_substr.py family: the streaming-maintenance staging
    #    moved onto stage_stream_splits late in r10 (the degenerate
    #    repartition-split fix), so the module's bytes changed and
    #    every query re-enters — including the two that had yielded
    #    earlier in the round ---------------------------------------
    "dedup_exact_substr",
    "exact_substr_cut",
    "decontaminate_substr",
    "decontaminate_cut",
    "substr_index_incremental",
    "stream_crawl_screen",
    # (stream_index_maintain, the family's sixth member, already
    # holds a slot in the round-9 block above)
    # -- spares: similarity.py family (green r9 rows, untouched) -------
    "knn_cosine",
    "ann_index_export",
    "ann_index_incremental",
    "ann_index_compaction",
    "stream_ann_search",
    "ann_lsh_cosine",
    "ivf_ann_cosine",
    "embedding_centroids",
    "kmeans_embeddings",
    # (cluster_balanced_sample yielded its slot to stream_range_overlap)
    "dedup_embedding_lsh",
    "semantic_dedup",
    # -- spares: dedup.py index lifecycle (green r9 rows; dedup.py and
    #    index_compact.py both untouched in r10) -----------------------
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
    # (quality_store_incremental, domain_mixture_weights,
    # mixture_resample, cluster_balanced_sample, train_val_split and
    # token_budget_packing yielded their r9 slots to the round-10
    # entries; each holds a green r9 row over bytes untouched in r10.
    # The r8-era yielders — stream_dedup_users,
    # quality_features, events_time_windows, psd_samples_source,
    # alert_log_roundtrip, alerts_stream, portfolio_projection,
    # stream_session_windows, stream_stream_join, dedup_ngram_jaccard —
    # still hold green r08-or-earlier rows over bytes untouched since.)
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
