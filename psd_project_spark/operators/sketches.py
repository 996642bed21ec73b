"""Mergeable-sketch rollups — the incremental-aggregation primitive.

At 100 TB you cannot recount distincts over a growing window: you
persist per-partition (here: per-day) sketches and MERGE them — the
union is register-wise max, so it is associative, commutative, and
deterministic. This module exercises Spark's Apache DataSketches HLL
surface (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``, Spark 3.5+) in exactly that shape:

    events → per-(event_type, day) HLL sketch      (the stored state)
           → union per event_type → reach estimate (the readout)

No DuckDB oracle — DuckDB's approx_count_distinct is a different HLL
implementation (different registers/params), so estimates differ by
construction; the driver records the rows-only check, like the other
two sketch queries. What IS exact and pinned by
tests/test_sketches.py:

- merge-identity: estimate(union of per-day sketches) equals
  estimate(one sketch over the raw union) EXACTLY — HLL union is
  lossless over register maxima, deterministic, order-independent;
- the estimate lands within the configured error band of the exact
  distinct count (lgConfigK=14 ⇒ ~1% rse).

Reference scope note: the reference engine has no sketch surface at
all (StreamingJob.java keeps exact per-window state); this is §2.9
extension surface, same family as ``approx_distinct_users``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.sources.registry import load_table

#: log2 of HLL register count: 2^14 registers ≈ 1% relative std error.
HLL_LGK = 14


def _daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
    )
    return e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"),
    )


def hll_reach_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user reach per event_type from MERGED per-day sketches.

    Plan shape at scale: the daily groupBy is the only wide shuffle of
    raw data (map-side partial sketch combine — sketches, not user ids,
    cross the exchange; the stored daily state is sketch-only, no
    distinct-aggregate expansion rides along); the rollup then moves
    one ~2^14-register sketch per (event_type, day) — kilobytes —
    regardless of corpus size.  ``sum_daily_distinct_approx`` (the sum
    of per-day sketch ESTIMATES, derived from the same stored
    sketches) rides along to show the sum-of-dailies ≠ distinct-reach
    gap the mergeable sketch exists to close.
    """
    daily = _daily_sketches(spark, sf_dir)
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("reach_approx"),
            F.sum(F.hll_sketch_estimate("sk")).alias("sum_daily_distinct_approx"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "hll_reach_rollup": (hll_reach_rollup, None),
}
