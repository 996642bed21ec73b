"""Training-sequence packing: the concat-and-chunk step of an LLM
pretraining data pipeline.

Documents are tokenized (whitespace token count — the engine's
deterministic stand-in for a real tokenizer, as in
``bpe_encode_stats``), concatenated in a deterministic order within
hash shards, and cut into fixed-length training sequences
(``PACK_SEQ_LEN``). The query reports per-(shard, bin) packing stats:
how many docs start in each sequence, their token mass, and how many
straddle a sequence boundary — the numbers a data engineer reads to
size packing efficiency and boundary-crossing loss masking.

Plan shape for 100 TB: packing is embarrassingly parallel across
``PACK_SHARDS`` hash shards (at scale: thousands); within a shard the
running token cumsum is ONE window over the shard's docs — the
deterministic order (doc_id) is the price of reproducible packing, and
the window sort runs per shard, never globally. No Python anywhere;
the whole operator is three codegen expressions and one windowed sum.

No reference analog (SURVEY.md §2.9 extension class); the packing
recipe (shard → concat in stable order → fixed-length chunks) is the
standard public pretraining practice (e.g. GPT/T5-style span packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.functions import text as T
from psd_project_spark.sources.registry import load_table

#: Fixed training-sequence length (tokens per packed sequence). 512
#: keeps the fixture corpora multi-bin with real boundary crossings at
#: every SF the driver checks (sf0.01's ~1.7k-token shards would all
#: fit one 2048 bin, leaving the crossing logic unexercised).
PACK_SEQ_LEN = 512
#: Hash shards packed independently — the scale-out axis.
PACK_SHARDS = 16


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(shard, bin) packing stats for the documents corpus.

    ``bin`` is the training sequence a document STARTS in under
    concat-and-chunk packing of its shard's running token stream;
    ``n_crossing`` counts docs straddling a sequence boundary (their
    spans need cross-sequence loss masking). All integer arithmetic —
    the DuckDB oracle matches bit-for-bit."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(
            F.expr(f"size({T.tokens_expr()})"), F.lit(0)
        ).alias("nt"),
    )
    sharded = d.select(
        F.expr(f"CAST(doc_id % {PACK_SHARDS} AS INT)").alias("shard"),
        "doc_id",
        "nt",
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sharded.withColumn("cum", F.sum("nt").over(w))
    binned = cum.select(
        "shard",
        "nt",
        F.expr(f"CAST(floor((cum - nt) / {PACK_SEQ_LEN}) AS BIGINT)").alias(
            "bin"
        ),
        F.expr(
            f"nt > 0 AND floor((cum - 1) / {PACK_SEQ_LEN}) > "
            f"floor((cum - nt) / {PACK_SEQ_LEN})"
        ).alias("crossing"),
    )
    return (
        binned.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum(F.col("crossing").cast("long")).alias("n_crossing"),
        )
        .orderBy("shard", "bin")
    )


PACK_SEQUENCES_ORACLE = f"""
WITH d AS (
  SELECT doc_id, coalesce(len({T.tokens_sql()}), 0) AS nt FROM documents
), sharded AS (
  SELECT CAST(doc_id % {PACK_SHARDS} AS INT) AS shard, doc_id, nt FROM d
), cums AS (
  SELECT shard, doc_id, nt,
         sum(nt) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM sharded
), binned AS (
  SELECT shard, nt,
         CAST(floor((cum - nt) / {PACK_SEQ_LEN}) AS BIGINT) AS bin,
         (nt > 0 AND floor((cum - 1) / {PACK_SEQ_LEN}) >
                     floor((cum - nt) / {PACK_SEQ_LEN})) AS crossing
  FROM cums
)
SELECT shard, bin, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN crossing THEN 1 ELSE 0 END) AS BIGINT)
         AS n_crossing
FROM binned
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {
    "pack_sequences": (pack_sequences, PACK_SEQUENCES_ORACLE),
}
