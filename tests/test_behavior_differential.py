"""Differential check: the JVM-windowed nearest_view_lag equals the
cogrouped-applyInPandas kernel row-for-row (both integer-exact), and
its physical plan contains no Python evaluation and no extra exchange
beyond the one user_id shuffle."""

from psd_project_spark.operators.behavior import (
    nearest_view_lag,
    nearest_view_lag_cogroup,
)
from tests.conftest import SF_DIR


def test_windowed_equals_cogroup_kernel(spark):
    a = nearest_view_lag(spark, SF_DIR).toPandas()
    b = nearest_view_lag_cogroup(spark, SF_DIR).toPandas()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for c in cols:
        assert (a[c].astype("int64").values == b[c].astype("int64").values).all(), c


def test_windowed_plan_is_jvm_only(spark):
    plan = nearest_view_lag(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "FlatMapCoGroupsInPandas" not in plan
    # one hash exchange on user_id for the window; the final groupBy
    # reuses it (plus the single-partition exchange for the orderBy)
    assert plan.count("hashpartitioning(user_id") <= 1, plan
