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
# iteration order), so ordering is part of the verification contract:
# _PRIORITY pins one-or-more representatives of every operator family
# (risk, dedup, similarity, text, curation, multimodal, governance,
# sampling, streaming, behavior, skew, sources) into that window.  The
# TPC-H battery and the remaining long tail — all driver-verified in
# round 1 — follow in module order.
_PRIORITY = (
    # reference risk surface (SURVEY §2.1-2.8)
    "measures_agg",
    "measures_window",
    "measures_window_np",
    "alerts_batch",
    "alert_counts",
    "portfolio_projection",
    "value_histogram",
    # dedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_1nn",
    "dedup_components",
    "dedup_canonical",
    "decontaminate_ngrams",
    # similarity / ANN family
    "knn_cosine",
    "ann_lsh_cosine",
    "ivf_ann_cosine",
    "embedding_centroids",
    "kmeans_embeddings",
    # text analysis
    "doc_stats",
    "tfidf_top_terms",
    "bm25_rank",
    "lang_id",
    "token_freq",
    "doc_fingerprint",
    # text curation
    "doc_chunking",
    "repetition_metrics",
    "pii_redact",
    # multimodal
    "media_catalog",
    "media_features",
    "media_resize",
    "frame_sample",
    # governance
    "k_anonymity_release",
    "weighted_sample",
    "training_shard_export",
    # sampling
    "train_val_split",
    "stratified_sample",
    "token_budget_packing",
    # streaming (batch-equivalent registry forms)
    "measures_window_stream",
    "alerts_stream",
    "events_time_windows",
    "stream_dedup_users",
    "stream_session_windows",
    "stream_stream_join",
    "stream_upsert_latest",
    # behavior / skew / sources representatives
    "nearest_view_lag",
    "salted_event_stats",
    "events_jsonl_source",
    "lineitem_orc_source",
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
    return {name: fn for name, (fn, _) in _collect().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _collect().items() if sql is not None
    }
