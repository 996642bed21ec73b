"""Bucketed co-located join: the 100 TB shuffle-elimination lever.

At scale, lineitem⋈orders is the one unavoidable big⋈big join
(SURVEY.md §2.9); pre-bucketing both tables by the join key at write
time makes every subsequent join shuffle-free — each bucket pair joins
locally. This test proves the engine's write path produces tables
Catalyst recognizes as co-partitioned: the joined plan contains NO
Exchange, and results are identical to the plain shuffled join.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from psd_project_spark.sources.registry import load_table
from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture
def bucketed_tables(spark):
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        (
            load_table(spark, SF_DIR, name)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"{name}_bucketed")
        )
    yield
    for name in ("lineitem", "orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_bucketed")
    shutil.rmtree(warehouse, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # Force the sort-merge path (broadcast would hide the exchange
    # question entirely — at real scale neither side is broadcastable).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("lineitem_bucketed")
        o = spark.table("orders_bucketed")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # the join itself reads both sides bucket-aligned: no shuffle
        # below the join (the groupBy above it may still exchange)
        assert "Exchange" not in join_section, join_section

        # and the answer matches the plain (shuffled) join exactly
        li_p = load_table(spark, SF_DIR, "lineitem")
        o_p = load_table(spark, SF_DIR, "orders")
        expected = {
            r["o_orderstatus"]: (r["n"], r["qty"])
            for r in li_p.join(o_p, li_p.l_orderkey == o_p.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
            )
            .collect()
        }
        got = {
            r["o_orderstatus"]: (r["n"], r["qty"]) for r in joined.collect()
        }
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)
