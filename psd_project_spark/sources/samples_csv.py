"""CSV sample source — the reference's S1/S2 operators, Spark-first.

The reference reads ``test_samples.csv`` line-by-line and drops any
line that fails to parse as 6 doubles (header, junk) — silently
(``streamProcessing/psd/src/main/java/psd/StreamingJob.java:433``
``readTextFile`` + ``:61-81`` ``Splitter.flatMap`` with the
``NumberFormatException → return`` guard at ``:75-77``).

Spark mapping: a declared all-``DoubleType`` schema with
``mode=DROPMALFORMED`` reproduces the silent drop in the CSV reader
itself (JVM-side, pushdown-friendly) — but, unlike the reference, the
engine *counts* what it dropped (SURVEY.md §2.8 #5): a malformed row
at 100 TB is a data-quality signal, not noise. The count comes from a
second pass over a ``PERMISSIVE`` read with a corrupt-record column —
only used when the caller asks, so the hot path stays one scan.

Streaming variant: same schema/options through ``readStream`` — the
micro-batch planner applies the identical parse, so batch and stream
agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from psd_project_spark.config import DEFAULT_CONFIG


def samples_schema(n_assets: int | None = None) -> StructType:
    n = n_assets or len(DEFAULT_CONFIG.weights)
    return StructType([StructField(f"r{i + 1}", DoubleType()) for i in range(n)])


def read_samples_csv(
    spark: SparkSession, path: str, n_assets: int | None = None
) -> DataFrame:
    """Batch CSV read with the reference's silent-drop parse semantics."""
    return (
        spark.read.schema(samples_schema(n_assets))
        .option("mode", "DROPMALFORMED")
        .csv(path)
        # DROPMALFORMED keeps rows where *some* field parsed; the
        # reference drops a line if *any* field fails (Splitter parses
        # all six or emits nothing) — enforce that stricter contract.
        .na.drop("any")
    )


def count_malformed(
    spark: SparkSession, path: str, n_assets: int | None = None
) -> int:
    """How many input lines the parse dropped (metrics pass)."""
    schema = samples_schema(n_assets).add("_corrupt", "string")
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    cols = [f.name for f in samples_schema(n_assets).fields]
    bad = F.col("_corrupt").isNotNull()
    for c in cols:
        bad = bad | F.col(c).isNull()
    return df.filter(bad).count()


def stream_samples_csv(
    spark: SparkSession, path: str, n_assets: int | None = None
) -> DataFrame:
    """Streaming variant (S1): same schema and drop semantics."""
    return (
        spark.readStream.schema(samples_schema(n_assets))
        .option("mode", "DROPMALFORMED")
        .csv(path)
        .na.drop("any")
    )


def with_portfolio(df: DataFrame, weights: tuple[float, ...] | None = None) -> DataFrame:
    """P1: the weighted portfolio column (StreamingJob.java:174-180)."""
    w = weights or DEFAULT_CONFIG.weights
    combo = sum(
        (F.col(f"r{i + 1}") * F.lit(wi) for i, wi in enumerate(w)), F.lit(0.0)
    )
    return df.withColumn("portfolio", combo)
