"""Registry query for the custom Python DataSource (sources/
python_datasource.py).

``psd_samples_source`` reads the generator THROUGH the DataSource API
(partition-parallel executor-side generation) and reduces each series
to order-independent integer-quantized aggregates. The oracle is a
GOLDEN VALUES table: the source is a pure function of
``(n, seed, partitions)`` — no testdata dependency — so the expected
aggregates are computed once from the same function
(tools/gen_psd_samples_golden.py regenerates them; a drift means the
generator or the chunking contract changed, which is exactly what the
oracle exists to catch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.sources import python_datasource

#: The pinned read options — the golden literals below are THEIR output.
N, SEED, PARTS = 10000, 7, 8

_SERIES = ["a1", "a2", "a3", "a4", "a5", "a6", "portfolio"]


def psd_samples_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series (n, min, max, quantized-sum) over the generated feed.

    ``sum_q12 = Σ floor(v·1e12 + 0.5)`` is an exact int64 fold —
    order- and partitioning-independent, so the answer is identical at
    any parallelism (the determinism contract the golden oracle pins).
    ``sf_dir`` is unused: this source generates, it does not read."""
    python_datasource.register(spark)
    df = (
        spark.read.format("psd_samples")
        .option("n", N)
        .option("seed", SEED)
        .option("partitions", PARTS)
        .load()
    )
    stack = ", ".join(f"'{s}', {s}" for s in _SERIES)
    long = df.select(
        F.expr(f"stack({len(_SERIES)}, {stack}) AS (series, value)")
    )
    return (
        long.groupBy("series")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.sum(F.floor(F.col("value") * 1e12 + 0.5)).alias("sum_q12"),
        )
        .orderBy("series")
    )


# Golden aggregates of the pure generator function at (n=10000, seed=7,
# partitions=8) — regenerate with tools/gen_psd_samples_golden.py.
PSD_SAMPLES_ORACLE = """
SELECT * FROM (VALUES
  ('a1', CAST(10000 AS BIGINT), CAST('-0.09999404883965253' AS DOUBLE), CAST('0.09999612601786356' AS DOUBLE), CAST(-3292758622026 AS BIGINT)),
  ('a2', CAST(10000 AS BIGINT), CAST('-0.09998706582091653' AS DOUBLE), CAST('0.09992933239528277' AS DOUBLE), CAST(10884611079369 AS BIGINT)),
  ('a3', CAST(10000 AS BIGINT), CAST('-0.09998579667216416' AS DOUBLE), CAST('0.09998251269756078' AS DOUBLE), CAST(-6742926802274 AS BIGINT)),
  ('a4', CAST(10000 AS BIGINT), CAST('-0.0999890084486113' AS DOUBLE), CAST('0.09997456998837864' AS DOUBLE), CAST(9424069661224 AS BIGINT)),
  ('a5', CAST(10000 AS BIGINT), CAST('-0.09999117567001756' AS DOUBLE), CAST('0.09997694857125991' AS DOUBLE), CAST(1332813665020 AS BIGINT)),
  ('a6', CAST(10000 AS BIGINT), CAST('-0.09998223100524099' AS DOUBLE), CAST('0.09998711243523681' AS DOUBLE), CAST(-5643904248005 AS BIGINT)),
  ('portfolio', CAST(10000 AS BIGINT), CAST('-0.07981641326847469' AS DOUBLE), CAST('0.08341993266851168' AS DOUBLE), CAST(1218927205182 AS BIGINT))
) AS t(series, n, min_v, max_v, sum_q12)
ORDER BY series
"""

QUERIES = {
    "psd_samples_source": (psd_samples_source, PSD_SAMPLES_ORACLE),
}
