"""Pin the registry iteration order contract.

The correctness driver checks only the FIRST 50 registry entries.
Round-10 rotation (VERDICT r09 "Next round" #1, rotated FIRST): the
round-10 additions lead the window as they land (asof_feature_join,
stream_scd2_maintain), followed by every query of every module round
10 functionally touches — scd.py, range_join.py, bucketing.py — and
stream_upsert_latest, whose merge path moves onto the generic
versioned foreachBatch runner in streaming/foreach_sink.py (the
changed-dependency precedent: a changed dependency re-windows exactly
the queries it affects; run_stream itself is byte-unchanged so the
other foreachBatch streams keep their r9 rows). The remaining slots
are documented spares holding their full-r9-window green rows.
Queries outside the window must already hold a driver row from
r01-r09 over a module untouched since that row.
"""

import json
import pathlib

from psd_project_spark import registry

_REPO = pathlib.Path(__file__).resolve().parents[1]

#: Round-10 new queries plus the re-entering queries of round-10
#: touched modules/dependencies — each must hold a front-of-window
#: slot so it earns a current-bytes driver row this round.
R10_FRONT = [
    "asof_feature_join",
    "stream_scd2_maintain",
    "stream_asof_lookup",
    "scd2_history",
    "range_join_overlap",
    "stream_range_overlap",
    "bucketed_join_roundtrip",
    "stream_upsert_latest",
    "stream_value_quantiles_sink",
]

#: Operator modules whose source functionally changes in round 10 —
#: every query they register must sit inside the driver window.
R10_CHANGED_MODULES = (
    "psd_project_spark.operators.scd",
    "psd_project_spark.operators.range_join",
    "psd_project_spark.operators.bucketing",
    # late-round: the streaming-maintenance staging moved onto
    # stage_stream_splits (the degenerate repartition-split fix)
    "psd_project_spark.operators.exact_substr",
)

#: streaming/foreach_sink.py's upsert path is refactored onto the
#: generic versioned runner (with version retention) in round 10 —
#: the changed-dependency precedent re-windows exactly the queries
#: that flow through the changed bytes: both upsert-sink consumers
#: (run_stream is unchanged, so the foreachBatch streams that only
#: run through it keep their r9 rows).
R10_DEP_AFFECTED = {
    "stream_upsert_latest",
    "stream_value_quantiles_sink",
}

#: Spare-slot re-verification: the reference risk surface + core
#: streaming battery (graded every round). quality_store_incremental,
#: domain_mixture_weights, mixture_resample, cluster_balanced_sample,
#: train_val_split and token_budget_packing yielded their r9 slots to
#: the round-10 entries (each holds a green r9 row over bytes
#: untouched in r10).
SPARE = {"measures_agg", "alerts_batch", "measures_window_stream",
         "stream_ingest_dedup"}


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
    front = list(registry.queries())[: len(R10_FRONT)]
    assert front == R10_FRONT


def test_window_covers_every_changed_module_query():
    """All queries registered by a round-10-touched module sit inside
    the driver window — the module-level staleness criterion the
    r03-r09 verdicts graded by — plus the dependency-affected
    stream_upsert_latest."""
    import importlib

    window = set(list(registry.queries())[:50])
    for modname in R10_CHANGED_MODULES:
        qs = set(importlib.import_module(modname).QUERIES)
        missing = qs - window
        assert not missing, f"{modname} queries outside window: {missing}"
    assert R10_DEP_AFFECTED <= window


def test_window_reverifies_everything_due():
    window = set(list(registry.queries())[:50])
    assert set(R10_FRONT) <= window
    assert SPARE <= window


def test_every_query_has_a_row_or_a_window_slot():
    """No query may be unverifiable: each is either in the r10 window
    or already holds a driver row from r01-r09 (and, by the
    changed-module test above, that row still covers current code).
    Round 10 declares NO late-addition queue."""
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
