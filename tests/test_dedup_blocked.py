"""Blocked (distributed) dedup_embedding_1nn equals the collect-based
baseline row-for-row, and its plan is a cogroup grid, not a driver
collect feeding a closure."""

from psd_project_spark.operators.dedup import (
    dedup_embedding_1nn,
    dedup_embedding_1nn_collect,
)
from tests.conftest import SF_DIR


def test_blocked_equals_collect_baseline(spark):
    a = dedup_embedding_1nn(spark, SF_DIR).toPandas()
    b = dedup_embedding_1nn_collect(spark, SF_DIR).toPandas()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values("vec_id").reset_index(drop=True)
    b = b[cols].sort_values("vec_id").reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for c in cols:
        assert (a[c].values == b[c].values).all(), c


def test_blocked_plan_is_cogroup_grid(spark):
    plan = (
        dedup_embedding_1nn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapCoGroupsInPandas" in plan
