"""Deterministic epoch reshuffling: training-data ORDER as an operator.

LLM training wants a different document order every epoch, but the
order must be DETERMINISTIC (resume mid-epoch after a crash, reproduce
a run bit-exactly, shard consistently across data-parallel workers)
and cannot be materialized as a stored permutation at 100 TB. The
standard fix (public knowledge — hash-based shuffling as in e.g.
tf.data / Megatron data orderings): order epoch ``e`` by
``md5(seed:e:doc_id)`` — a keyed hash every engine computes
identically — and cut the ordered stream into fixed-size global
batches. Same seed → same order, any suffix of the epoch is
recomputable from the hash alone, and the order is independent of
physical row placement.

Plan shape: one hash-ordered rank per epoch. The naive
``row_number() OVER (PARTITION BY epoch ORDER BY h)`` puts every row
of an epoch through ONE task — the exact single-window bottleneck
functions/prefix.py exists to remove — so the rank runs as the
chunk-parallel exact prefix sum (hash-prefix chunking is monotone in
the hash order by construction). The oracle keeps the straightforward
one-window mirror; integer-count addition makes the two forms
bit-identical.

The reference has no notion of data ordering at all (its pipeline is
a single pass in arrival order, StreamingJob.java:433-437); this
extends the repo's training-pipeline tier (sampling/packing/mixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.sources.registry import load_table

#: Epochs materialized by the registry query (the per-epoch cost is
#: what matters; 3 proves the orders differ and stay deterministic).
SHUFFLE_EPOCHS = 3

#: Documents per global batch. At 100 TB this is the data-parallel
#: global batch in documents; the batch id is a pure function of the
#: exact rank, so any worker can locate its shard without coordination.
SHUFFLE_BATCH_DOCS = 32

#: Run seed — part of the hash key, so a new seed is a new epoch-0
#: order without touching any stored state.
SHUFFLE_SEED = 42


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(epoch, doc_id, batch_id) for every document in every epoch:
    the full training-order manifest for ``SHUFFLE_EPOCHS`` epochs.
    Oracle: the one-window ``row_number()`` mirror over the identical
    md5 keys — a hash-match proves the chunk-parallel rank IS the
    sequential order, batch cuts included."""
    from psd_project_spark.functions.prefix import (
        chunked_rank,
        hex_chunk_col,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e = d.withColumn(
        "epoch",
        F.explode(F.expr(f"sequence(0L, {SHUFFLE_EPOCHS - 1}L)")),
    ).withColumn(
        "_h",
        F.md5(
            F.concat_ws(
                ":",
                F.lit(str(SHUFFLE_SEED)),
                F.col("epoch"),
                F.col("doc_id"),
            )
        ),
    )
    ranked = chunked_rank(
        e,
        ["epoch"],
        ["_h", "doc_id"],
        hex_chunk_col("_h"),
        "rank",
    )
    return (
        ranked.select(
            "epoch",
            "doc_id",
            F.expr(f"(rank - 1) DIV {SHUFFLE_BATCH_DOCS}")
            .cast("long")
            .alias("batch_id"),
        )
        .orderBy("epoch", "batch_id", "doc_id")
    )


EPOCH_SHUFFLE_ORACLE = f"""
WITH e AS (
  SELECT doc_id, epoch
  FROM documents, generate_series(0, {SHUFFLE_EPOCHS - 1}) AS g(epoch)
), h AS (
  SELECT doc_id, epoch,
         md5('{SHUFFLE_SEED}' || ':' || epoch || ':' || doc_id) AS hk
  FROM e
)
SELECT epoch, doc_id,
       CAST((row_number() OVER (PARTITION BY epoch ORDER BY hk, doc_id)
             - 1) // {SHUFFLE_BATCH_DOCS} AS BIGINT) AS batch_id
FROM h
ORDER BY epoch, batch_id, doc_id
"""


QUERIES = {
    "epoch_shuffle": (epoch_shuffle, EPOCH_SHUFFLE_ORACLE),
}
