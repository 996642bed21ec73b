"""Custom Python DataSource (psd_samples): batch determinism,
partition parallelism, and streaming offset-replay contract.
The value-level check is the golden oracle via test_oracle_parity."""

import time

from pyspark.sql import functions as F

from psd_project_spark.sources import python_datasource


def _read(spark, **opts):
    python_datasource.register(spark)
    r = spark.read.format("psd_samples")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_deterministic_and_bounded(spark):
    a = _read(spark, n=2000, seed=11, partitions=4).orderBy("seq").collect()
    b = _read(spark, n=2000, seed=11, partitions=4).orderBy("seq").collect()
    assert a == b and len(a) == 2000
    assert [r["seq"] for r in a] == list(range(2000))
    for r in a[:200]:
        for c in ("a1", "a2", "a3", "a4", "a5", "a6"):
            assert -0.1 <= r[c] <= 0.1

    diff = _read(spark, n=2000, seed=12, partitions=4).orderBy("seq").collect()
    assert diff != a  # seed actually matters


def test_batch_partitions_honored(spark):
    df = _read(spark, n=1000, partitions=5)
    assert df.rdd.getNumPartitions() == 5
    # chunking covers every seq exactly once
    assert df.select(F.count_distinct("seq")).collect()[0][0] == 1000


def test_stream_batches_are_deterministic_and_contiguous(spark):
    python_datasource.register(spark)
    q = (
        spark.readStream.format("psd_samples")
        .option("seed", 11)
        .option("rows_per_batch", 500)
        .load()
        .writeStream.format("memory")
        .queryName("psd_samples_stream")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) FROM psd_samples_stream").collect()[0][0]
            if n >= 1500:
                break
            time.sleep(0.5)
        rows = spark.sql(
            "SELECT * FROM psd_samples_stream ORDER BY seq LIMIT 1000"
        ).collect()
    finally:
        q.stop()
    assert [r["seq"] for r in rows] == list(range(1000))
    # first 1000 rows of the stream == first 1000 rows of batch mode with
    # the same seed and matching chunk size (same per-batch generation)
    batch = (
        _read(spark, n=1000, seed=11, partitions=2)
        .orderBy("seq")
        .collect()
    )
    assert rows == batch


def test_stream_replay_between_offsets(spark):
    """Checkpoint-recovery contract: re-reading an offset range must
    regenerate identical rows."""
    r = python_datasource.PsdSamplesStreamReader({"seed": "11", "rows_per_batch": "500"})
    it1, nxt = r.read({"rows": 0})
    first = list(it1)
    assert nxt == {"rows": 500} and len(first) == 500
    replay = list(r.readBetweenOffsets({"rows": 0}, {"rows": 500}))
    assert replay == first
    # partial-range replay inside one batch
    it2, nxt2 = r.read(nxt)
    second = list(it2)
    part = list(r.readBetweenOffsets({"rows": 500}, {"rows": 700}))
    assert part == second[:200]
