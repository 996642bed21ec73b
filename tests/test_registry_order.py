"""Pin the registry iteration order contract.

The correctness driver checks only the FIRST 50 registry entries.
Round-5 rotation (VERDICT r04 "Next round" #1): the window front-loads
the declared R5_QUEUE (late r04 additions), then the post-guard
frame_sample re-verification, then round 5's new operators, then every
query of a module functionally changed in round 5 (their older driver
rows no longer cover current bytes), with the spare slots re-verifying
the reference risk surface. Queries outside the window must already
hold a driver row from r01-r04 over a module untouched this round —
and for the first time there is NO late-addition queue.
"""

import json
import pathlib

from psd_project_spark import registry

_REPO = pathlib.Path(__file__).resolve().parents[1]

#: Late-round-4 additions the full r04 window could not take — the
#: r04 verdict's #1 ask is that they lead the round-5 window.
R5_QUEUE_FRONT = [
    "minhash_index_export", "moments_quantile_sketch",
    "embedding_pq_quantize",
]

#: multimodal.py's frame_sample gained an (unreachable-on-fixtures)
#: empty-payload guard late in r04; its driver row predates the guard
#: bytes, so it re-windows (VERDICT r04 "What's wrong" #2).
POST_GUARD = {"frame_sample"}

#: Round-5 additions: incremental index maintenance for both persisted
#: indexes, the rank-error-bounded dyadic quantile sketch, and its
#: Structured Streaming form (bounded-state node counts as a streaming
#: aggregation).
R5_NEW = {
    "minhash_index_incremental", "ann_index_incremental",
    "dyadic_quantile_sketch", "stream_value_quantiles",
    "pack_sequences",
}

#: Operator modules whose source functionally changed in round 5 —
#: every query they register must re-earn a driver row in this window.
R5_CHANGED_MODULES = (
    "psd_project_spark.operators.dedup",
    "psd_project_spark.operators.similarity",
    "psd_project_spark.operators.text_analysis",
    "psd_project_spark.operators.freq_sketch",
    "psd_project_spark.operators.packing",  # new this round
    "psd_project_spark.streaming.jobs",
)

#: functions/measures_np.py changed in round 5 (NULL-key dropna fix) —
#: its query re-earns a driver row.
R5_FUNC_CHANGED = {"measures_window_np"}

#: Spare-slot re-verification: the reference risk-surface flagship
#: (table_profile's and alerts_batch's slots yielded to the late-round
#: stream_value_quantiles / pack_sequences additions — both hold
#: r03/r04 hash-match rows over bytes untouched this round).
SPARE = {"measures_agg"}


def _driver_checked_rounds() -> set[str]:
    checked: set[str] = set()
    for path in _REPO.glob("CORRECTNESS_r0*.json"):
        checked |= set(json.loads(path.read_text()))
    return checked


def test_first_50_is_priority_list():
    names = list(registry.queries())
    assert len(registry._PRIORITY) == 50
    assert names[: len(registry._PRIORITY)] == list(registry._PRIORITY)


def test_window_front_loads_r5_queue():
    assert list(registry.queries())[:3] == R5_QUEUE_FRONT


def test_window_covers_every_changed_module_query():
    """All queries registered by a round-5-touched module sit inside
    the driver window — the module-level staleness criterion the
    r03/r04 verdicts graded by."""
    import importlib

    window = set(list(registry.queries())[:50])
    for modname in R5_CHANGED_MODULES:
        qs = set(importlib.import_module(modname).QUERIES)
        missing = qs - window
        assert not missing, f"{modname} queries outside window: {missing}"


def test_window_reverifies_everything_due():
    window = set(list(registry.queries())[:50])
    assert POST_GUARD <= window
    assert R5_NEW <= window
    assert R5_FUNC_CHANGED <= window
    assert SPARE <= window


def test_every_query_has_a_row_or_a_window_slot():
    """No query may be unverifiable: each is either in the r5 window
    or already holds a driver row from r01-r04 (and, by the
    changed-module test above, that row still covers current code).
    Round 5 declares NO late-addition queue."""
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
    assert len(names) >= 144
