"""Slowly-changing-dimension (type 2) history: point-in-time
validity intervals from an event log.

The standard warehouse materialization a feature store or training
snapshotter needs ("what was this user's value AS OF time T?"): each
(user, event) becomes a row with ``[valid_from, valid_to)`` bounds,
where ``valid_to`` is the NEXT event's timestamp for that user (NULL
= still current). An as-of lookup is then a plain range predicate —
or, combined with :mod:`range_join` bucketing, an equi-join.

Plan shape: ONE hash exchange on ``user_id`` feeds a per-user
``lead()`` window — user_id is high-cardinality, so the window's sort
is per-user-sized and the exchange is the scale-out axis; nothing
else in the plan is data-sized. Ordering ties (same-user same-ts
events exist in the log) break by ``event_id`` in BOTH engines, so
the interval chain is deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psd_project_spark.sources.registry import load_table


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("valid_to", F.lead("ts").over(w))
        .select(
            "user_id",
            "event_id",
            F.col("ts").alias("valid_from"),
            "valid_to",
            "value",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


SCD2_ORACLE = """
SELECT user_id, event_id,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       value,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          IS NULL) AS is_current
FROM events
ORDER BY user_id, valid_from, event_id
"""


QUERIES = {
    "scd2_history": (scd2_history, SCD2_ORACLE),
}
