"""Pins for the mergeable-HLL rollup (no SQL oracle by nature —
DuckDB's HLL is a different implementation; see operators/sketches.py).
"""

from pyspark.sql import functions as F

from psd_project_spark.operators.sketches import (
    HLL_LGK,
    _daily_sketches,
    hll_reach_rollup,
)
from psd_project_spark.sources.registry import load_table
from tests.conftest import SF_DIR_MID


def test_union_of_daily_sketches_equals_one_shot_sketch(spark):
    """HLL union is register-wise max — merging per-day sketches must
    give EXACTLY the estimate of one sketch built over all rows.
    This is the identity that makes incremental reach correct."""
    rolled = {
        r["event_type"]: r["reach_approx"]
        for r in hll_reach_rollup(spark, SF_DIR_MID).collect()
    }
    e = load_table(spark, SF_DIR_MID, "events")
    oneshot = {
        r["event_type"]: r["est"]
        for r in e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
            ).alias("est")
        )
        .collect()
    }
    assert rolled.keys() == oneshot.keys() and len(rolled) > 0
    for k in rolled:
        assert rolled[k] == oneshot[k], (k, rolled[k], oneshot[k])


def test_estimate_within_error_band_and_below_sum_of_dailies(spark):
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR_MID, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in hll_reach_rollup(spark, SF_DIR_MID).collect():
        et = r["event_type"]
        rel = abs(r["reach_approx"] - exact[et]) / exact[et]
        assert rel < 0.05, (et, r["reach_approx"], exact[et])
        # distinct reach can never exceed the sum of daily distincts
        # (both sides sketch-estimated from the same stored state —
        # the daily state is deliberately sketch-only, so the
        # comparison carries the estimates' error band)
        assert r["reach_approx"] <= r["sum_daily_distinct_approx"] * 1.05


def test_daily_sketch_state_is_small(spark):
    """The persisted state is sketches, not id sets: each serialized
    sketch must stay bounded (≲ 2^14 registers ≈ KBs), independent of
    daily cardinality."""
    daily = _daily_sketches(spark, SF_DIR_MID).select(
        F.octet_length("sk").alias("sz")
    )
    mx = daily.agg(F.max("sz")).collect()[0][0]
    assert mx is not None and mx < 64 * 1024
