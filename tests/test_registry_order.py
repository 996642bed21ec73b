"""Pin the registry iteration order contract.

The correctness driver checks only the FIRST 50 registry entries.
Round-12 rotation (VERDICT r11 "Next round" #1, rotated FIRST): the
re-entering queries of the modules round 12 functionally touches lead
the window — zorder.py (ADVICE r11 fixes + streaming Z-order ingest +
layout erasure), shuffling.py (ADVICE r11 dead-knob fix), scd.py
(schema-evolution query + CDF feed retention) — plus, by the
changed-dependency precedent, every consumer of
streaming/foreach_sink.py's versioned MERGE runner / read_versioned /
manifest format, which gain schema versioning (VERDICT r11 #3):
stream_upsert_latest and stream_value_quantiles_sink (the scd.py nine
sit in anyway). run_stream / write_epoch / stage_stream_splits stay
byte-identical, so the foreachBatch streams that only run through
those keep their r10/r11 rows. Round-12 additions join the front on
their landing commits with staged by-name yields from the tail of the
r03-stale spare block — each yield is annotated inline in both lists.
Spares: the full 24-query stale backlog (heavy TPC-H six + the four
r11 landing-commit yielders first, per VERDICT r11 #1, then the
remaining r01 rows and the four r02 rows), the 4-query
reference-risk/streaming signature set, then the stalest r03
row-holders. Queries outside the window must already hold a driver
row from r01-r11 over a module untouched since that row.
"""

import json
import pathlib

from psd_project_spark import registry

_REPO = pathlib.Path(__file__).resolve().parents[1]

#: Round-12 new queries plus the re-entering queries of round-12
#: touched modules/dependencies — each must hold a front-of-window
#: slot so it earns a current-bytes driver row this round. New queries
#: are appended here by their landing commits.
R12_FRONT = [
    "zorder_pruned_scan",
    "zonemap_pruned_scan",
    "stream_zonemap_ingest",
    "epoch_shuffle",
    "scd2_history",
    "asof_feature_join",
    "stream_asof_lookup",
    "stream_scd2_maintain",
    "stream_scd2_erase",
    "scd2_time_travel",
    "scd2_change_feed",
    "cdf_materialized_view",
    "stream_scd2_serve",
    "stream_upsert_latest",
    "stream_value_quantiles_sink",
]

#: Operator modules whose source functionally changes in round 12 —
#: every query they register must sit inside the driver window.
R12_CHANGED_MODULES = (
    # ADVICE r11 fixes + streaming Z-order ingest + layout erasure
    "psd_project_spark.operators.zorder",
    # ADVICE r11 dead-knob fix
    "psd_project_spark.operators.shuffling",
    # schema-evolution query + CDF feed retention
    "psd_project_spark.operators.scd",
)

#: streaming/foreach_sink.py's versioned MERGE runner / read_versioned
#: / manifest format gain schema versioning in round 12 — the
#: changed-dependency precedent re-windows exactly the queries that
#: flow through the changed bytes: every versioned-runner /
#: current_upsert_table consumer (run_stream / write_epoch /
#: stage_stream_splits are unchanged, so the foreachBatch streams that
#: only run through those keep their r10/r11 rows).
R12_DEP_AFFECTED = {
    "stream_scd2_maintain",
    "stream_upsert_latest",
    "stream_value_quantiles_sink",
}

#: Spare-slot re-verification: the reference risk surface / core
#: streaming signature set (re-verified every round).
SPARE = {
    "measures_agg",
    "alerts_batch",
    "measures_window_stream",
    "stream_ingest_dedup",
}

#: Stalest-row burn-down (VERDICT r11 #1): the 24 queries holding
#: r01/r02 driver rows over bytes untouched since — ALL re-earn
#: current-round rows this round; after r12 no query holds a row older
#: than r03. Heavy TPC-H six + the four r11 landing-commit yielders
#: lead, exactly as the r11 registry note promised.
R12_STALE_REVERIFY = {
    # the heavy TPC-H six, deferred by name from r11
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q20_dominant_share_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_high_balance",
    # the four r11 landing-commit yielders
    "purchases_asof_views",
    "views_before_purchase",
    "big_spenders_semi",
    "cube_orders",
    # remaining r01 rows
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_trade_volume",
    "region_nation_rollup",
    "running_user_spend",
    "sessionize_events",
    "top3_cheapest_per_flag",
    "top_orders_by_revenue",
    "trailing_hour_user_value",
    # the r02 rows
    "lineitem_orc_source",
    "media_catalog",
    "media_resize",
    "salted_event_stats",
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
    # new round-12 queries join at the very front on their landing
    # commits; the re-entering set must sit inside the window in the
    # committed order regardless of how many have landed
    idx = [front.index(n) for n in R12_FRONT]
    assert idx == sorted(idx)


def test_window_covers_every_changed_module_query():
    """All queries registered by a round-12-touched module sit inside
    the driver window — the module-level staleness criterion the
    r03-r11 verdicts graded by — plus the dependency-affected
    versioned-runner consumers."""
    import importlib

    window = set(list(registry.queries())[:50])
    for modname in R12_CHANGED_MODULES:
        qs = set(importlib.import_module(modname).QUERIES)
        missing = qs - window
        assert not missing, f"{modname} queries outside window: {missing}"
    assert R12_DEP_AFFECTED <= window


def test_window_reverifies_everything_due():
    window = set(list(registry.queries())[:50])
    assert set(R12_FRONT) <= window
    assert SPARE <= window
    assert R12_STALE_REVERIFY <= window


def test_every_query_has_a_row_or_a_window_slot():
    """No query may be unverifiable: each is either in the r12 window
    or already holds a driver row from r01-r11 (and, by the
    changed-module test above, that row still covers current code).
    Round 12 declares NO late-addition queue."""
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
