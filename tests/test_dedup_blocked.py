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


def test_grid_covers_every_block_at_larger_sf(spark):
    """Regression for the cogroup key-type mismatch (int-typed probe
    blk vs bigint-typed index blk): Spark pairs cogroup groups by
    binary key, so mismatched types silently paired only a subset of
    blocks — HALF the partials vanished at sf0.1 while sf0.001 passed.
    Pin: every probe must produce exactly one partial per block."""
    from pyspark.sql import functions as F

    from psd_project_spark.operators.dedup import (
        _NN_BLOCKS,
        _nn_block_partials,
    )

    counts = (
        _nn_block_partials(spark, "/root/testdata/sf0.1")
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("m"))
        .collect()
    )
    hist = {r["n"]: r["m"] for r in counts}
    assert set(hist) == {_NN_BLOCKS}, hist


def test_blocked_plan_is_cogroup_grid(spark):
    plan = (
        dedup_embedding_1nn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapCoGroupsInPandas" in plan
