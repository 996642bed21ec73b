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


def test_stream_through_count_window_matches_batch(spark):
    """The reference's full topology — generator feed → 7-series
    unpivot → sliding count-window measures — run END-TO-END from the
    custom streaming source through the stateful operator, compared
    row-for-row against the batch window path over the identical
    generated rows (stream batch b == batch-mode chunk b by the seed
    contract)."""
    from pyspark.sql import functions as F

    from psd_project_spark.functions.measures import windowed_measures
    from psd_project_spark.streaming.count_window import (
        streaming_count_window_measures,
    )

    python_datasource.register(spark)
    batch_rows, want_batches = 400, 3
    horizon = batch_rows * want_batches
    stack = "stack(7, 'a1', a1, 'a2', a2, 'a3', a3, 'a4', a4, 'a5', a5, 'a6', a6, 'p', portfolio) AS (series, value)"

    stream = (
        spark.readStream.format("psd_samples")
        .option("seed", 5)
        .option("rows_per_batch", batch_rows)
        .load()
        .select(F.col("seq").alias("sample_seq"), F.expr(stack))
    )
    out = streaming_count_window_measures(
        stream,
        key_cols=["series"],
        order_col="sample_seq",
        value_col="value",
        window_size=30,
        digits=9,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("psd_e2e")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    expected_rows = 7 * (horizon - 29)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if (
                spark.sql("SELECT count(*) FROM psd_e2e").collect()[0][0]
                >= expected_rows
            ):
                break
            time.sleep(0.5)
        got = (
            spark.sql(f"SELECT * FROM psd_e2e WHERE seq <= {horizon}")
            .orderBy("series", "seq")
            .collect()
        )
    finally:
        q.stop()

    batch_src = _read(
        spark, n=horizon, seed=5, partitions=want_batches
    ).select(F.col("seq").alias("sample_seq"), F.expr(stack))
    want = (
        windowed_measures(
            batch_src, ["series"], "sample_seq", "value", 30, digits=9
        )
        .orderBy("series", "seq")
        .collect()
    )
    assert len(got) == len(want) == expected_rows
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


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
