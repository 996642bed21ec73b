"""observe()-based data-quality metrics: collected by the query's own
action — the plan must NOT gain a second scan for the metrics."""

from pyspark.sql import functions as F

from psd_project_spark.functions.quality import observe_quality
from psd_project_spark.plans import executed_plan
from psd_project_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_observe_matches_exact_counts(spark):
    e = load_table(spark, SF_DIR, "events")
    observed, obs = observe_quality(
        e, null_cols=["props", "user_id"], range_cols=["value"]
    )
    # downstream consumer runs its own aggregation; metrics ride along
    out = observed.groupBy("event_type").count()
    out.collect()
    got = obs.get

    assert got["n_rows"] == e.count()
    assert got["nulls_user_id"] == e.filter(F.col("user_id").isNull()).count()
    assert got["nulls_props"] == e.filter(F.col("props").isNull()).count()
    lo, hi = e.agg(F.min("value"), F.max("value")).collect()[0]
    assert got["min_value"] == lo and got["max_value"] == hi


def test_observe_adds_no_extra_scan(spark):
    e = load_table(spark, SF_DIR, "events")
    observed, _ = observe_quality(e, null_cols=["props"])
    plan = executed_plan(observed.groupBy("event_type").count())
    assert plan.count("Scan parquet") == 1, plan
