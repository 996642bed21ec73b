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


def test_streaming_observe_surfaces_per_batch_metrics(spark):
    """The same observe_quality call on a streaming source must surface
    metrics through StreamingQueryProgress.observedMetrics — summed
    over micro-batches they equal the exact batch counts."""
    from psd_project_spark.streaming.jobs import stream_events

    observed, obs = observe_quality(
        stream_events(spark, SF_DIR), null_cols=["props"], name="sq"
    )
    assert obs is None
    q = (
        observed.groupBy("event_type")
        .count()
        .writeStream.format("memory")
        .queryName("sq_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = nulls = 0
    for p in q.recentProgress:
        om = p.observedMetrics.get("sq")
        if om is not None:
            rows += om["n_rows"]
            nulls += om["nulls_props"]
    e = load_table(spark, SF_DIR, "events")
    assert rows == e.count()
    assert nulls == e.filter(F.col("props").isNull()).count()
