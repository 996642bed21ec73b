"""Parquet table registry for the driver-provided test tables.

All engine queries load inputs through :func:`load_table` so that
table-specific normalization happens in exactly one place:

- ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
  cannot read natively. We read it as a raw long
  (``spark.sql.legacy.parquet.nanosAsLong``) and expose:
  ``ts`` (TimestampType, truncated to microseconds — identical to
  DuckDB's ``CAST(ts AS TIMESTAMP)``) plus ``ts_ns`` (the raw
  nanosecond epoch long) for exact arithmetic.

At 100 TB these reads stay scan-friendly: no action is triggered here,
so Catalyst still prunes columns and pushes filters into the parquet
scan of whatever query is composed on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.session import ensure_conf

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table, normalized for engine use."""
    ensure_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Raw ns epoch → µs TimestampType; integer DIV avoids the double
        # round-trip that loses precision above 2^53 ns.
        # ts_ns is truncated to µs-aligned ns: DuckDB (the oracle) reads
        # TIMESTAMP(NANOS) parquet at µs precision, so exact-parity
        # arithmetic must not see sub-µs digits either.
        df = (
            df.withColumnRenamed("ts", "_raw_ns")
            .withColumn("ts", F.expr("timestamp_micros(_raw_ns DIV 1000)"))
            .withColumn("ts_ns", F.expr("(_raw_ns DIV 1000) * 1000"))
            .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
        )
    return df


def spread_small(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition a small (often single-file → single-partition) input
    so per-row-expensive work (signature UDFs, hashing) uses every core.
    One tiny round-robin shuffle; at real scale inputs already arrive
    in many partitions and this is a no-op decision for the caller."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register all tables as temp views for ``spark.sql`` queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


#: DuckDB-side prelude mirroring the events normalization. Oracle SQL
#: strings that touch ``events`` should select from this CTE body so
#: both engines see microsecond timestamps.
EVENTS_ORACLE_CTE = (
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, "
    "epoch_ns(ts) AS ts_ns, user_id, event_type, value, props FROM events"
)
