#!/usr/bin/env python
"""Reference-workload replay: the full 1M-sample alert pipeline.

Reproduces the reference's end-to-end run (SURVEY.md §6): 1,000,000
samples of 6 asset returns → weighted portfolio projection → 7 series
→ sliding count window (30, slide 1) → six risk measures per window →
reference-stats comparison → alerts. The reference executes this with
``parallelism(1)`` and an O(n²) per-window Gini loop — minutes of
sequential compute for ≈999,971 windows × 7 series.

Our engine runs the same workload through the numpy count-window scale
path (functions/measures_np.py) with overlapped-chunk parallelism:
7 series × 1M rows → ~7M windows, all cores busy. Prints ONE JSON
line: total seconds, windows evaluated, windows/sec, alerts raised.

Usage: python bench_replay.py  [env: REPLAY_ROWS=1000000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = int(os.environ.get("REPLAY_ROWS", "1000000"))
CHUNK_ROWS = 31_250
_CACHE = f"/tmp/psd_replay/samples_{N_ROWS}.parquet"

#: Reference model constants (dataGeneration/psd.R:4-21).
WEIGHTS = (0.2, 0.2, 0.2, 0.15, 0.15, 0.1)
MU = (0.002, 0.004, 0.003, 0.002, 0.001, 0.003)


def _ensure_fixture() -> None:
    """Seeded 6-asset return samples (plain normal, clipped ±0.1 — the
    replay measures throughput, not the Gibbs sampler)."""
    if os.path.exists(os.path.join(_CACHE, "_SUCCESS")) or os.path.exists(
        _CACHE
    ):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    r = np.clip(
        rng.normal(loc=MU, scale=0.03, size=(N_ROWS, 6)), -0.1, 0.1
    ).astype(np.float64)
    cols = {"seq": np.arange(1, N_ROWS + 1, dtype=np.int64)}
    for i in range(6):
        cols[f"r{i + 1}"] = r[:, i]
    os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
    pq.write_table(pa.table(cols), _CACHE, row_group_size=131_072)


def main() -> None:
    _ensure_fixture()

    from pyspark.sql import functions as F

    from psd_project_spark.config import DEFAULT_CONFIG
    from psd_project_spark.functions.measures import (
        grouped_measures,
        measures_to_long,
    )
    from psd_project_spark.functions.measures_np import windowed_measures_np
    from psd_project_spark.session import get_spark

    spark = get_spark(app_name="psd-replay")
    spark.read.parquet(_CACHE).count()  # FS cache + footers, like bench.py

    t0 = time.perf_counter()
    samples = spark.read.parquet(_CACHE)
    # P1: weighted portfolio as series 0, assets as series 1..6.
    portfolio = sum(
        (F.col(f"r{i + 1}") * F.lit(w) for i, w in enumerate(WEIGHTS)),
        F.lit(0.0),
    )
    wide = samples.withColumn("r0", portfolio)
    stack = ", ".join(f"{i}, r{i}" for i in range(7))
    long = wide.select(
        "seq", F.expr(f"stack(7, {stack}) as (series, value)")
    )
    # W1-W3 + A-M1..M6 over every series, overlapped-chunk parallel.
    measures = windowed_measures_np(
        long,
        key_cols=["series"],
        order_col="seq",
        value_col="value",
        window_size=DEFAULT_CONFIG.window_size,
        digits=None,
        chunk_rows=CHUNK_ROWS,
        seq_precomputed=True,
    )
    # S3 + P3: population stats per series → broadcast → alert predicate.
    stats = measures_to_long(
        grouped_measures(long, ["series"], "value", digits=9), ["series"]
    ).withColumnRenamed("value", "ref_value")
    mlong = measures_to_long(measures, ["series", "seq"])
    alerts = (
        mlong.join(F.broadcast(stats), ["series", "measure"])
        .filter(
            (F.col("value") < F.col("ref_value"))
            & (
                (F.col("ref_value") - F.col("value"))
                / (F.lit(1.0) + F.col("ref_value"))
                >= F.lit(DEFAULT_CONFIG.alert_threshold)
            )
        )
    )
    n_alerts, n_windows = (
        alerts.groupBy()
        .agg(
            F.count(F.lit(1)).alias("a"),
            (F.count_distinct("series", "seq")).alias("w"),
        )
        .collect()[0]
    )
    total_windows = 7 * (N_ROWS - DEFAULT_CONFIG.window_size + 1)
    dt = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "reference_replay",
                "value": dt,
                "unit": "sec",
                "rows": N_ROWS,
                "windows": total_windows,
                "windows_per_sec": round(total_windows / dt),
                "alerts": int(n_alerts),
                "alerted_windows": int(n_windows),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
