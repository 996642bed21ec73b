"""Fuzzy (edit-distance) string-similarity join with blocking.

The string analog of the embedding/minhash similarity joins in
operators/dedup.py: find name pairs within a small Levenshtein radius
without ever forming the full cross product. Scale design:

1. **Dedupe to the value domain first** — distances depend only on the
   distinct strings, so the quadratic step runs on ``|domain|`` rows
   (with multiplicities carried along), not on the table.
2. **Block on a cheap invariant** (here: the trailing token) so the
   candidate set is Σ|block|² instead of |domain|². Real corpora swap
   in length buckets or character n-gram keys — same plan shape:
   equi-join on block key, then the distance residual.
3. The distance itself is the built-in JVM ``levenshtein`` —
   codegen'd, no Python. Pair multiplicity (``n_part_pairs``) comes
   from the carried counts, so expanding back to row pairs is never
   materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.sources.registry import load_table

MAX_DIST = 3


def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-name pairs sharing their noun token with edit distance ≤ 3,
    with the number of underlying part-row pairs each name pair covers."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("noun", F.split(F.col("p_name"), " ").getItem(1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("n").alias("n_a"), "noun"
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("n").alias("n_b"), "noun"
    )
    out = (
        a.join(b, "noun")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("int")
        )
        .filter(F.col("dist") <= MAX_DIST)
        .select(
            "name_a",
            "name_b",
            "dist",
            (F.col("n_a") * F.col("n_b")).alias("n_part_pairs"),
        )
        .orderBy("name_a", "name_b")
    )
    return out


FUZZY_ORACLE = f"""
WITH names AS (
  SELECT p_name, count(*) AS n, string_split(p_name, ' ')[2] AS noun
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
       a.n * b.n AS n_part_pairs
FROM names a JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {MAX_DIST}
ORDER BY name_a, name_b
"""


QUERIES = {
    "fuzzy_name_match": (fuzzy_name_match, FUZZY_ORACLE),
}
