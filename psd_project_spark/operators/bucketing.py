"""Co-located bucketed joins: pay the fact-table shuffle ONCE at
write time, never again at query time.

The missing storage-layout member of the scale toolkit (the persisted
indexes cover probe-style access; this covers the big-fact⋈big-fact
equi-join): ``orders`` and ``lineitem`` are written as BUCKETED,
sorted Spark catalog tables on their join key — Spark's hash-bucketed
table layout, the open-source equivalent of a co-partitioned
warehouse table pair — and the join then runs with ZERO exchange on
either side: bucket i of lineitem joins bucket i of orders, already
co-located at file level.

At 100 TB this is THE pattern for repeated fact-fact joins: the
bucketed write is one data-sized shuffle paid once per snapshot;
every subsequent join (daily revenue rollups, order-line
reconciliation) reads co-located buckets with map-side joins —
``tests/test_round9_ops.py`` pins the plan differential (bucketed
plan: no exchange below the join; raw-parquet plan: both sides
shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.sources.registry import load_table

#: Bucket count for the co-located pair. Both sides MUST agree —
#: Spark only elides the exchange when bucket counts match. At 100 TB
#: pick buckets ≈ total-bytes / (HDFS-block-sized file per bucket per
#: writer); 8 keeps sf-scale files non-trivial.
N_BUCKETS = 8

_DEC = "decimal(27,15)"

#: One live table root per (session, sf_dir): ``scratch_dir`` RECLAIMS
#: the previous directory each time it's called for a prefix, while
#: the catalog's tableExists gate skips the rewrite — calling it per
#: invocation would delete the files out from under the standing
#: catalog entries (bench and the driver invoke every query at least
#: twice per session). Memoizing keeps files and catalog coherent for
#: the session; atexit still sweeps the dir. The memo re-mints when
#: the dir has vanished (an explicit scratch sweep can reclaim it
#: mid-session), and the build gate checks the FILES, not just the
#: catalog, for the same reason.
_ROOTS: dict[str, str] = {}


def _table_root(key: str) -> str:
    import os

    from psd_project_spark.functions.caching import scratch_dir

    root = _ROOTS.get(key)
    if root is None or not os.path.isdir(root):
        _ROOTS[key] = scratch_dir(f"bucketed_tables_{key}")
    return _ROOTS[key]


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write (or overwrite) the co-located ``orders``/``lineitem``
    table pair for ``sf_dir`` and return their catalog names.

    Each side is ``repartition(N_BUCKETS, key)`` before the bucketed
    write — repartition's hash IS the bucketing hash (Murmur3 on the
    column value), so every write task holds exactly one bucket's rows
    and each bucket lands as ONE file (the bucketed-write smallfile
    trap: without it every task writes a sliver of every bucket).
    Tables are EXTERNAL (explicit path under the session scratch
    root); the in-memory catalog entry carries the bucket spec that
    lets the planner elide the join exchange."""
    import hashlib

    from psd_project_spark.sources.registry import source_fingerprint

    # sf_dir + source-data fingerprint (the index-dir staleness
    # contract): regenerated source data mints new table names, never
    # silently serves stale buckets
    fp = source_fingerprint(sf_dir, "lineitem")
    key = hashlib.md5(f"{sf_dir}:{fp}".encode()).hexdigest()[:8]
    root = _table_root(key)
    names = (f"bkt_orders_{key}", f"bkt_lineitem_{key}")
    specs = (
        (
            names[0],
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus"
            ),
            "o_orderkey",
        ),
        (
            names[1],
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            "l_orderkey",
        ),
    )
    import os

    for name, df, bkey in specs:
        tpath = f"{root}/{name}"
        # reuse only when BOTH halves agree: the catalog entry exists
        # AND its committed files are still on disk (a scratch sweep
        # can reclaim the dir while the catalog entry stands)
        if spark.catalog.tableExists(name) and os.path.exists(
            os.path.join(tpath, "_SUCCESS")
        ):
            continue
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.repartition(N_BUCKETS, F.col(bkey))
            .write.mode("overwrite")
            .option("path", tpath)
            .bucketBy(N_BUCKETS, bkey)
            .sortBy(bkey)
            .saveAsTable(name)
        )
    return names


def bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-orderstatus revenue over the co-located pair: the
    lineitem⋈orders equi-join runs exchange-free (bucketing already
    co-located both sides on the join key); the only shuffle in the
    plan is the 3-row groupBy(o_orderstatus) AFTER the join. Oracle:
    the same join/rollup over the raw parquet — a hash-match proves
    bucketed write + catalog round-trip + exchange-free join ≡ the
    straightforward shuffle join, and the plan test proves the
    exchanges are actually gone."""
    orders_t, lineitem_t = _bucketed_pair(spark, sf_dir)
    # merge hint: at test SFs Catalyst would broadcast the tiny orders
    # side, which hides the property this query demonstrates; at the
    # 100 TB target both sides are fact-sized and sort-merge is the
    # strategy Catalyst picks unhinted — the hint makes the showcased
    # plan SF-independent (it never changes results)
    ob = spark.table(orders_t).hint("merge")
    lb = spark.table(lineitem_t)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lb.join(ob, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum(revenue.cast(_DEC)).cast("double"), 6
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderstatus")
    )


BUCKETED_JOIN_ORACLE = """
SELECT o_orderstatus,
       CAST(CAST(round(CAST(CAST(CAST(CAST(sum(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS STRING) AS DECIMAL(27,15))) AS STRING) AS DOUBLE) AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES = {
    "bucketed_join_roundtrip": (bucketed_join_roundtrip, BUCKETED_JOIN_ORACLE),
}
