"""Deletion from persisted indexes: the lifecycle verb a real
training-data pipeline cannot ship without.

The persisted band index (operators/dedup.py) has build / append /
compact / probe; this module adds DELETE — the right-to-be-forgotten
path: remove a set of documents from the standing index without a
rebuild, rewriting ONLY the ``(band_id, bucket)`` partitions the
deleted documents' bands hash into. Deletion cost tracks the deleted
docs' band volume (|delete set| × LSH_BANDS dirs at most,
manifest-intersected), never the index size — the same per-bucket
discipline as compaction (operators/index_compact.py), pointed at
removal instead of consolidation.

Why band recomputation, not an index scan: a deletion request arrives
with the documents (or their stored signatures); recomputing their
band keys yields the exact affected partition set up front. Scanning
the index for matching ids would read every bucket — the full-scan
shape this layout exists to avoid.

The reference has no index or deletion story at all (its pipeline is
a single streaming pass, StreamingJob.java:433-437); this extends the
repo's own index tier."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.functions import text as T
from psd_project_spark.functions.caching import transient_cache
from psd_project_spark.operators.dedup import (
    _SIG_SQL,
    _band_frame,
    _minhash_index_dir,
    _probe_minhash_index,
    _with_bucket,
    _with_signatures,
    _write_minhash_index,
)
from psd_project_spark.sources.registry import load_table


def delete_from_minhash_index(
    spark: SparkSession, path: str, del_docs: DataFrame
) -> int:
    """Remove ``del_docs`` (rows with ``doc_id``, ``_sh`` — the
    signature frame slice for the deletion set) from the persisted
    band index at ``path``. Returns the number of affected partitions.

    Per-partition rewrite via dynamic partition overwrite: the
    deleted docs' bands name the affected ``(band_id, bucket)`` dirs
    (distinct-collect, bounded by |delete set| × LSH_BANDS and by the
    manifest intersection); those dirs are read back, the deleted ids
    anti-joined away (broadcast — the delete set is small by nature),
    and survivors rewritten in place. A partition whose EVERY row
    belonged to deleted docs produces no output rows — dynamic
    overwrite never touches it — so emptied dirs are removed
    explicitly and the partition manifest refreshed, keeping
    manifest-pruned probes truthful.

    Durability: callers run this inside the shared
    ``build_base_plus_delta`` protocol (marker strictly last), so a
    crash mid-delete leaves a directory that fails the gate and
    rebuilds — deleted data cannot silently resurface half-removed."""
    import os
    import shutil

    from psd_project_spark.operators.index_compact import (
        _rewrite,
        list_partitions,
        write_partition_manifest,
    )

    del_bands = _with_bucket(_band_frame(del_docs))
    affected = sorted(
        {
            (int(r["band_id"]), int(r["bucket"]))
            for r in del_bands.select("band_id", "bucket")
            .distinct()
            .collect()
        }
    )
    present = list_partitions(path)
    dirs = [
        f"band_id={b}/bucket={k}"
        for b, k in affected
        if f"band_id={b}/bucket={k}" in present
    ]
    if not dirs:
        return 0
    del_ids = del_docs.select(F.col("doc_id").alias("doc_train")).distinct()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        back = (
            spark.read.option("basePath", path)
            .schema("doc_train long, band_key string, band_id int, bucket int")
            .parquet(*[f"{path}/{d}" for d in dirs])
        )
        survivors = back.join(F.broadcast(del_ids), "doc_train", "left_anti")
        # partitions that keep at least one row (bounded collect:
        # ≤ |dirs|) — the rest were emptied by the delete
        kept = {
            f"band_id={int(r['band_id'])}/bucket={int(r['bucket'])}"
            for r in survivors.select("band_id", "bucket")
            .distinct()
            .collect()
        }
        if kept:
            _rewrite(
                survivors,
                path,
                ["band_id", "bucket"],
                max(1, len(kept) // 4),
            )
        for d in dirs:
            if d not in kept:
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    write_partition_manifest(path)
    return len(dirs)


def minhash_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index DELETE lifecycle as one driver-verified query: build
    the full train index (``overwrite``), DELETE the takedown set
    (train docs with ``doc_id % 7 == 3``) via per-partition rewrites,
    then probe with the eval split. The oracle is the full screen over
    the REDUCED corpus (``cross_dedup_minhash`` with the deleted docs
    excluded from the train side), so a hash-match proves
    **build + delete + probe ≡ rebuild-without-the-deleted** — the
    GDPR guarantee, verified at the driver: no deleted document can
    surface as a candidate, and no surviving candidate is lost.

    Durability rides the shared ``build_base_plus_delta`` protocol
    with the deletion as the second mutation — the completion marker
    lands strictly after the delete commits, so a crash mid-delete
    rebuilds instead of serving a half-deleted index."""
    from psd_project_spark.operators.index_compact import (
        build_base_plus_delta,
    )

    path = _minhash_index_dir(sf_dir) + "_del"
    sigs = transient_cache(
        _with_signatures(load_table(spark, sf_dir, "documents"), spark)
    )
    is_eval = F.col("doc_id") % 50 == 0
    is_del = (~is_eval) & (F.col("doc_id") % 7 == 3)
    build_base_plus_delta(
        path,
        lambda: _write_minhash_index(sigs.filter(~is_eval), path, "overwrite"),
        lambda: delete_from_minhash_index(spark, path, sigs.filter(is_del)),
    )
    return _probe_minhash_index(spark, sf_dir, sigs, path)


#: ``cross_dedup_minhash``'s oracle over the reduced corpus: the train
#: side additionally excludes the deleted split. The probe/verify
#: chain is otherwise identical — deleted docs cannot be candidates,
#: every surviving pair must still be found.
MINHASH_DELETE_ORACLE = f"""
WITH sigs AS ({_SIG_SQL}),
bands AS (
  SELECT doc_id, b AS band_id, {T.band_key_sql('sig', 'b')} AS band_key
  FROM sigs, generate_series(0, {T.LSH_BANDS - 1}) AS g(b)
),
eb AS (SELECT doc_id AS doc_eval, band_id, band_key FROM bands WHERE doc_id % 50 = 0),
tb AS (SELECT doc_id AS doc_train, band_id, band_key FROM bands
       WHERE doc_id % 50 <> 0 AND doc_id % 7 <> 3),
cand AS (SELECT DISTINCT doc_train, doc_eval FROM tb JOIN eb USING (band_id, band_key)),
j AS (
  SELECT c.doc_eval, CAST(CAST(round(CAST(CAST({T.exact_jaccard_sql('st.s', 'se.s')} AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE) AS jac
  FROM cand c
  JOIN sigs st ON st.doc_id = c.doc_train
  JOIN sigs se ON se.doc_id = c.doc_eval
),
per_eval AS (
  SELECT doc_eval, count(*) AS n_candidates,
         CAST(sum(CASE WHEN jac >= {T.JACCARD_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_near_dups,
         max(jac) AS max_jaccard
  FROM j GROUP BY 1
)
SELECT e.doc_eval,
       coalesce(p.n_candidates, 0) AS n_candidates,
       coalesce(p.n_near_dups, 0) AS n_near_dups,
       coalesce(p.max_jaccard, 0.0) AS max_jaccard
FROM (SELECT doc_id AS doc_eval FROM documents WHERE doc_id % 50 = 0) e
LEFT JOIN per_eval p USING (doc_eval)
"""


QUERIES = {
    "minhash_index_delete": (minhash_index_delete, MINHASH_DELETE_ORACLE),
}
