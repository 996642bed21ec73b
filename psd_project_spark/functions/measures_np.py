"""Vectorized batch count-window measures — the scale path for W1.

:func:`psd_project_spark.functions.measures.windowed_measures` (the
HOF form) evaluates ~150 interpreted lambda element-ops per window —
perfect as a semantics oracle and fine at test SF, but at millions of
windows the interpreted fold dominates. This module computes the same
thing through ``applyInPandas``: per key, a strided
``sliding_window_view`` + one ``np.sort`` per window row, then
:func:`psd_project_spark.streaming.count_window._measures_vectorized`
(every sum an ``np.cumsum`` — verified bit-identical to the ascending
left fold the HOF path and the DuckDB oracle use). Shares a single
shuffle shape with the HOF path: hash-partition by key, sort by seq.

For keys whose history is far larger than one task should hold (the
reference's single global series: 1M rows, SURVEY.md §6), pass
``chunk_rows``: each key is split into fixed-size seq ranges and the
last ``window_size − 1`` rows of every range are duplicated into the
next one (count windows are translation-invariant, so an overlapped
chunk computes its windows exactly). That turns one sequential
per-key task into ``rows/chunk_rows`` independent tasks — the
count-window analog of range-partitioned time windows, and the reason
this path scales to 100 TB of ordered history per key while the
reference is pinned to parallelism 1 (StreamingJob.java:431).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from psd_project_spark.config import MEASURES
from psd_project_spark.streaming.count_window import _measures_vectorized


def windowed_measures_np(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    window_size: int = 30,
    digits: int | None = 9,
    chunk_rows: int | None = None,
    seq_precomputed: bool = False,
) -> DataFrame:
    """Sliding count-window measures, numpy-vectorized.

    Output schema and values are identical to ``windowed_measures``:
    ``key_cols + (seq, mean, median, q10, tail_mean, sm1, sm2)``.

    ``seq_precomputed=True`` declares that ``order_col`` already *is*
    a contiguous 1-based per-key arrival sequence — skipping the
    ``row_number()`` pass, which would otherwise serialize each key
    into a single sort task before chunking can parallelize it.
    """
    keys = list(key_cols)
    if seq_precomputed:
        seqd = df.select(
            *keys,
            F.col(order_col).cast("long").alias("seq"),
            F.col(value_col).cast("double").alias("_v"),
        )
    else:
        worder = Window.partitionBy(*keys).orderBy(order_col)
        seqd = df.withColumn("seq", F.row_number().over(worder)).select(
            *keys, "seq", F.col(value_col).cast("double").alias("_v")
        )
    if chunk_rows:
        carry = window_size - 1
        if chunk_rows < carry:
            raise ValueError(
                f"chunk_rows ({chunk_rows}) must be >= window_size - 1 "
                f"({carry}): a window's history must fit in one "
                "preceding chunk"
            )
        main = seqd.withColumn("_chunk", F.expr(f"(seq - 1) DIV {chunk_rows}"))
        spill = seqd.filter(
            F.expr(f"(seq - 1) % {chunk_rows}") >= chunk_rows - carry
        ).withColumn("_chunk", F.expr(f"(seq - 1) DIV {chunk_rows} + 1"))
        grouped = main.unionByName(spill)
        group_cols = [*keys, "_chunk"]
    else:
        # High-cardinality keys: one applyInPandas GROUP per key pays
        # the per-group Python invocation price |keys| times (~0.4 ms
        # each — 10k users at sf0.1 made this the slowest registry
        # query at ~5 s while the numpy math itself is <0.5 s; the
        # same pitfall class as nearest_view_lag's round-2 fix).
        # Group by a COARSE hash bucket of the key instead — each key
        # still lands wholly in one group (bucket is a function of the
        # key), and the kernel loops per key inside the bucket: ~64
        # Python invocations total, semantics untouched.
        grouped = seqd.withColumn(
            "_chunk", F.pmod(F.xxhash64(*keys), F.lit(64)).cast("int")
        )
        group_cols = ["_chunk"]

    key_fields = [df.schema[k] for k in keys]
    schema = StructType(
        key_fields
        + [StructField("seq", LongType())]
        + [StructField(m, DoubleType()) for m in MEASURES]
    )

    def _one_key(g: "pd.DataFrame"):
        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view

        g = g.sort_values("seq", kind="mergesort")
        v = g["_v"].to_numpy(np.float64)
        if len(v) < window_size:
            return None
        seq = g["seq"].to_numpy(np.int64)
        ends = seq[window_size - 1 :]
        if chunk_rows:
            chunk = int(g["_chunk"].iloc[0])
            own = (ends - 1) // chunk_rows == chunk
        else:
            own = np.ones(len(ends), dtype=bool)
        if not own.any():
            return None
        windows = sliding_window_view(v, window_size)[own]
        s = np.sort(windows, axis=1)
        # digits=None: rounding happens JVM-side below. The kernel's
        # per-element decimal rounding loop costs more than all the
        # numpy math combined (~600k interpreted calls at sf0.1).
        cols = _measures_vectorized(s, None)
        out = {k: g[k].iloc[0] for k in keys}
        out["seq"] = ends[own]
        for name, c in zip(MEASURES, cols):
            out[name] = c
        return pd.DataFrame(out)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # chunked mode: the group IS one (key, chunk) → single pass;
        # bucketed mode: loop per key inside the coarse group
        # dropna=False: Spark's groupBy keeps NULL keys as a group, so
        # the pandas regroup must too — pandas' default dropna=True
        # would silently discard NULL-keyed rows and diverge from the
        # HOF path / oracle.
        parts = [
            p
            for _, g in pdf.groupby(keys, sort=False, dropna=False)
            if (p := _one_key(g)) is not None
        ]
        if not parts:
            return pd.DataFrame({f.name: [] for f in schema.fields})
        return pd.concat(parts, ignore_index=True)

    raw = grouped.groupBy(*group_cols).applyInPandas(kernel, schema)
    if digits is None:
        return raw
    # F.round on DoubleType is HALF_UP on the SHORTEST-DECIMAL
    # representation of the double (Scala BigDecimal(d) ==
    # Double.toString), exactly matching the HOF path's F.round by
    # construction. NOTE: _round_half_up (count_window.py) quantizes
    # Decimal(x) — the exact binary value — which can differ from the
    # shortest-repr convention on half-way boundary doubles; the
    # numpy-vs-HOF differential test pins agreement on real data, but
    # the conventions are not theoretically identical.
    return raw.select(
        *keys, "seq", *[F.round(F.col(m), digits).alias(m) for m in MEASURES]
    )
