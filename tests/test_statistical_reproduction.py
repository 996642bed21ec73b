"""Statistical reproduction of the reference run (SURVEY.md §5.2-4).

Regenerates the reference's data distribution (seeded Gibbs truncated
multivariate-t, fixtures/generator.py), runs the full batch alert
pipeline over all 7 series, and checks the per-(measure, series) alert
counts reproduce the *shape* of the reference's golden artifact
``postProcessing/countings.txt``:

- mean/median/q10/tail_mean/sm1 alerts fire on every asset series at
  broadly similar rates (reference: ~17-35% of windows);
- with the reference's shipped (scale-mismatched) SM2 threshold, SM2
  alerts are ≈ 0 — the bug-compat behavior;
- with the consistent SM2 threshold, SM2 alerts fire like the others
  (what the reference *intended*).

Tolerances are wide: the RNG stream differs from R's, so only the
distributional shape is comparable.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from psd_project_spark.config import MEASURES
from psd_project_spark.fixtures.generator import (
    sample_returns,
    stats_table,
    with_portfolio,
)
from psd_project_spark.functions.measures import (
    measures_to_long,
    windowed_measures,
)

N_SAMPLES = 6000
THRESH = 0.01


@pytest.fixture(scope="module")
def fixture_data():
    x7 = with_portfolio(sample_returns(N_SAMPLES, seed=7))
    return x7


def _alert_counts(spark, x7: np.ndarray, variant: str) -> dict[tuple[str, int], int]:
    rows = [
        (int(seq), int(series), float(x7[seq, series]))
        for seq in range(x7.shape[0])
        for series in range(x7.shape[1])
    ]
    df = spark.createDataFrame(rows, "seq long, series int, value double")
    measured = windowed_measures(
        df, key_cols=["series"], order_col="seq", value_col="value",
        window_size=30, digits=9,
    )
    long = measures_to_long(measured, ["series", "seq"])
    stats = spark.createDataFrame(
        stats_table(x7, variant), "measure string, series int, ref_value double"
    )
    joined = long.join(F.broadcast(stats), ["series", "measure"])
    alerts = joined.filter(
        (F.col("value") < F.col("ref_value"))
        & ((F.col("ref_value") - F.col("value")) / (1.0 + F.col("ref_value")) >= THRESH)
    )
    counts = {
        (r["measure"], r["series"]): r["n"]
        for r in alerts.groupBy("measure", "series").agg(F.count("*").alias("n")).collect()
    }
    return {
        (m, s): counts.get((m, s), 0)
        for m in MEASURES
        for s in range(x7.shape[1])
    }


#: Loose per-measure alert-rate bands for the six asset series,
#: centered on the reference's own rates (countings.txt / ~1M windows):
#: mean ~17%, median ~28%, q10 ~7.5%, tail ~0.15-0.3%, sm1 ~17%.
ASSET_RATE_BANDS = {
    "mean": (0.03, 0.55),
    "median": (0.05, 0.65),
    "q10": (0.01, 0.45),
    "tail_mean": (0.0003, 0.15),
    "sm1": (0.03, 0.55),
    "sm2": (0.005, 0.65),  # consistent threshold ⇒ fires like mean/sm1
}


def test_alert_shape_consistent_stats(spark, fixture_data):
    counts = _alert_counts(spark, fixture_data, "consistent")
    windows = N_SAMPLES - 29
    for m in MEASURES:
        lo, hi = ASSET_RATE_BANDS[m]
        for s in range(6):
            rate = counts[(m, s)] / windows
            assert rate <= hi, (m, s, rate)
            # tail_mean's asset rate (~0.2%) can plausibly be 0 in a
            # single series at this sample size; its lower bound is
            # checked on the measure total below.
            if m != "tail_mean":
                assert rate >= lo, (m, s, rate)
        assert sum(counts[(m, s)] for s in range(6)) / (6 * windows) >= lo / 6, m
        # the diversified portfolio series alerts far less per measure
        # (reference: mean/6 ≈ 1.1%) but still fires somewhere
        assert counts[(m, 6)] / windows <= hi, (m, counts[(m, 6)])
    assert sum(counts[(m, 6)] for m in MEASURES) > 0


def test_sm2_bug_compat_shape(spark, fixture_data):
    """With the shipped stats artifact, SM2 alerts ≈ 0 (countings.txt
    rows 36-42: 8,0,0,0,0,2,0 out of ~1M windows) while every other
    measure still fires."""
    counts = _alert_counts(spark, fixture_data, "reference_bug")
    windows = N_SAMPLES - 29
    for s in range(7):
        assert counts[("sm2", s)] / windows < 0.01, (s, counts[("sm2", s)])
    for m in ("mean", "median", "q10", "tail_mean", "sm1"):
        assert sum(counts[(m, s)] for s in range(7)) > 0, m
