"""Quality-classifier train/apply invariants + oracle parity
(VERDICT r06 "Next round" #4)."""

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.oracle_utils import compare_frames, duck_connection


def test_train_loss_monotone_and_calibrated(spark):
    """Gradient descent on a smooth bounded loss with the calibrated
    fixed step: per-iteration loss is monotone non-increasing, starts
    at the exact all-zero-weights value 0.25 (p≡0.5), and genuinely
    descends by iteration 5."""
    from psd_project_spark.operators.quality_classifier import (
        quality_classifier_train,
    )

    rep = (
        quality_classifier_train(spark, SF_DIR)
        .toPandas()
        .sort_values("iteration")
        .reset_index(drop=True)
    )
    assert list(rep.iteration) == [1, 2, 3, 4, 5]
    assert rep.loss.iloc[0] == 0.25
    assert (rep.loss.diff().dropna() <= 0).all()
    assert rep.loss.iloc[-1] < 0.25
    assert ((rep.accuracy >= 0) & (rep.accuracy <= 1)).all()


def test_score_decision_consistent_with_link(spark):
    """keep ⇔ score ≥ 0.5 (softsign is monotone with p(0)=0.5), the
    scorer emits every document exactly once, and the distilled filter
    beats the majority-class baseline on its own training labels."""
    from psd_project_spark.operators.quality_classifier import (
        quality_classifier_score,
    )

    got = quality_classifier_score(spark, SF_DIR).toPandas()
    assert got.doc_id.is_unique
    assert ((got.score >= 0.5) == (got.keep == 1)).all()
    assert set(got.label.unique()) <= {0, 1}
    base = max(got.label.mean(), 1 - got.label.mean())
    acc = (got.keep == got.label).mean()
    assert acc >= base - 1e-9  # never worse than predict-majority


def test_train_oracle_parity(spark):
    from psd_project_spark.operators.quality_classifier import QUERIES

    fn, sql = QUERIES["quality_classifier_train"]
    got = fn(spark, SF_DIR).toPandas()
    con = duck_connection(SF_DIR)
    compare_frames(got, con.execute(sql).fetchdf())


def test_score_oracle_parity(spark):
    from psd_project_spark.operators.quality_classifier import QUERIES

    fn, sql = QUERIES["quality_classifier_score"]
    got = fn(spark, SF_DIR).toPandas()
    con = duck_connection(SF_DIR)
    compare_frames(got, con.execute(sql).fetchdf())


def test_feature_list_is_quality_score_free():
    """The label is distilled FROM quality_score — the feature list
    must never include it (or the 'classifier' degenerates into a
    one-feature threshold copy)."""
    from psd_project_spark.operators.quality_classifier import FEATURES

    for _name, expr in FEATURES:
        assert "quality_score" not in expr
    assert len(FEATURES) == 9
