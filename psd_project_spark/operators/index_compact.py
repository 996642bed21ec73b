"""Per-bucket compaction for the persisted bucket-partitioned indexes.

Incremental appends (``minhash_index_incremental`` /
``ann_index_incremental``) accumulate one file per batch per bucket;
at 100 TB that decays probe latency (per-file open cost on object
storage). Compaction is a PER-BUCKET rewrite — read only the
multi-file buckets, rewrite each as one file via dynamic partition
overwrite — never a full-index rebuild, and untouched buckets keep
their files byte-identical. Probe results are invariant (pinned by
tests/test_round5_ops.py::test_compaction_preserves_probe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def multi_file_buckets(path: str) -> list[str]:
    """Relative bucket dirs (e.g. ``band_id=3/bucket=17``) holding more
    than one parquet part file."""
    out = []
    for root, _dirs, files in os.walk(path):
        parts = [f for f in files if f.endswith(".parquet")]
        if len(parts) > 1:
            out.append(os.path.relpath(root, path))
    return sorted(out)


def compact_index(
    spark: SparkSession, path: str, partition_cols: list[str], schema: str
) -> int:
    """Rewrite every multi-file bucket of a partitioned index as one
    file. Returns the number of buckets compacted.

    Uses dynamic partition overwrite so ONLY the buckets present in
    the rewrite frame are replaced — the per-bucket rewrite contract:
    cost tracks the appended-to buckets, not the index size."""
    buckets = multi_file_buckets(path)
    if not buckets:
        return 0
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        hot = (
            spark.read.option("basePath", path)
            .schema(schema)
            .parquet(*[f"{path}/{b}" for b in buckets])
        )
        (
            hot.repartition(max(1, len(buckets) // 4), *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(buckets)


def compact_minhash_index(spark: SparkSession, path: str) -> int:
    return compact_index(
        spark,
        path,
        ["band_id", "bucket"],
        "doc_train long, band_key string, band_id int, bucket int",
    )


def compact_ann_index(spark: SparkSession, path: str) -> int:
    return compact_index(
        spark,
        path,
        ["band", "bkey"],
        "vec_id long, _v array<double>, band int, bkey int",
    )
