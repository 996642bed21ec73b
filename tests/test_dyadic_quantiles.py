"""Rank-error guarantee of the dyadic quantile sketch (VERDICT r04 #5).

The sketch claims a WORST-CASE rank error of 2·b·n/k on ANY
distribution — so the pin is on adversarial inputs (point masses,
heavy tails, near-duplicates, adversarial gaps), not just the
benign fixture prices. Rank error is measured against the value's
true rank INTERVAL (ties make a range of correct ranks).
"""

import math
import random

import pytest

from psd_project_spark.operators.freq_sketch import (
    DQS_B,
    DQS_K,
    dyadic_quantile_frame,
)

N = 20_000
QS = (0.1, 0.5, 0.9)


def _distributions():
    rng = random.Random(42)
    yield "uniform", [rng.uniform(0, 1000) for _ in range(N)]
    yield "lognormal_heavy_tail", [
        min(math.exp(rng.gauss(5, 2)), 5e7) for _ in range(N)
    ]
    yield "point_mass", [123.45] * N
    yield "two_point", [0.0 if i % 10 else 777.77 for i in range(N)]
    # 99% of mass crammed into a tiny interval next to a huge outlier
    # range — the classic equi-width-histogram killer
    yield "crammed_plus_outliers", (
        [100.0 + rng.uniform(0, 0.01) for _ in range(N - N // 100)]
        + [rng.uniform(0, 5e7) for _ in range(N // 100)]
    )
    # adversarial dyadic boundary: all mass just left and right of a
    # high dyadic split point
    yield "dyadic_boundary", (
        [2**20 / 100 - 0.01 * rng.random() for _ in range(N // 2)]
        + [2**20 / 100 + 0.01 * rng.random() for _ in range(N // 2)]
    )


def _cell_rank_error(values, est, cell, target_rank):
    """Rank error of the reported GRID CELL [est, est+cell): the sketch
    answers at grid resolution, so every value inside the cell is part
    of the correct-rank interval."""
    lo = sum(1 for v in values if v < est) + 1
    hi = sum(1 for v in values if v < est + cell)
    if lo <= target_rank <= hi:
        return 0
    return min(abs(target_rank - lo), abs(target_rank - hi))


@pytest.mark.parametrize("name,values", list(_distributions()))
def test_rank_error_bounded_on_adversarial_distributions(
    spark, name, values
):
    df = spark.createDataFrame(
        [("g", v) for v in values], "g string, v double"
    )
    row = dyadic_quantile_frame(df, "g", "v").collect()[0]
    n = len(values)
    bound = math.ceil(2 * DQS_B * n / DQS_K)
    cell = 1.0 / 100  # the DQS_GRID cell width
    for q in QS:
        est = row[f"q{int(q * 100)}_est"]
        target = math.ceil(q * n)
        err = _cell_rank_error(values, est, cell, target)
        assert err <= bound, (name, q, est, err, bound)


def test_sketch_is_partition_order_free(spark):
    """The sketch state is order-free integer sums: any partitioning /
    input order must produce the identical result (the mergeability
    contract that lets shards/days combine by addition)."""
    rng = random.Random(7)
    values = [rng.gauss(500, 200) for _ in range(5000)]
    df = spark.createDataFrame(
        [("g", v) for v in values], "g string, v double"
    )
    a = dyadic_quantile_frame(df.repartition(13), "g", "v").collect()
    shuffled = list(values)
    rng.shuffle(shuffled)
    df2 = spark.createDataFrame(
        [("g", v) for v in shuffled], "g string, v double"
    )
    b = dyadic_quantile_frame(df2.repartition(3), "g", "v").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bounded_state(spark):
    """n_nodes must respect the k·(b+1) state bound even under the
    crammed-adversarial input."""
    rng = random.Random(9)
    values = [100.0 + rng.uniform(0, 0.01) for _ in range(N)]
    df = spark.createDataFrame(
        [("g", v) for v in values], "g string, v double"
    )
    row = dyadic_quantile_frame(df, "g", "v").collect()[0]
    assert 0 < row["n_nodes"] <= DQS_K * (DQS_B + 1)


def test_streaming_sketch_rank_error_and_state_bound(spark):
    """The streaming form answers at leaf resolution 2^SVQ_LMIN grid
    cells with rank error ≤ 2·(B−LMIN)·n/K — checked against the raw
    parquet values — and its node count respects the hard state bound
    that makes an unbounded value stream safe."""
    import pyarrow.parquet as pq

    from psd_project_spark.operators.freq_sketch import (
        SVQ_B,
        SVQ_GRID,
        SVQ_K,
        SVQ_LMIN,
        stream_value_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    rows = stream_value_quantiles(spark, sf).collect()
    t = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"])
    by_type = {}
    for et, v in zip(t["event_type"].to_pylist(), t["value"].to_pylist()):
        by_type.setdefault(et, []).append(v)
    cell = (1 << SVQ_LMIN) / SVQ_GRID
    state_bound = 1 << (SVQ_B - SVQ_LMIN + 1)
    for row in rows:
        values = by_type[row["event_type"]]
        n = len(values)
        assert row["n"] == n
        assert 0 < row["n_nodes"] <= state_bound
        bound = math.ceil(2 * (SVQ_B - SVQ_LMIN) * n / SVQ_K)
        for q in QS:
            est = row[f"q{int(q * 100)}_est"]
            err = _cell_rank_error(values, est, cell, math.ceil(q * n))
            assert err <= bound, (row["event_type"], q, est, err, bound)


def test_universe_guards_fail_loudly(spark):
    """NULL values or a value range beyond the 2^b grid must raise,
    never silently drop quantile mass (review finding r5)."""
    import pytest as _pytest

    df_null = spark.createDataFrame(
        [("g", 1.0), ("g", None)], "g string, v double"
    )
    with _pytest.raises(Exception, match="NULL value"):
        dyadic_quantile_frame(df_null, "g", "v").collect()
    df_wide = spark.createDataFrame(
        [("g", 0.0), ("g", 2.0**40)], "g string, v double"
    )
    with _pytest.raises(Exception, match="exceeds"):
        dyadic_quantile_frame(df_wide, "g", "v").collect()
