"""Exact distributed prefix sums (two-level, chunk-parallel).

VERDICT r07 "What's wrong" #1: an exact per-group running total
(cumulative token mass, exact quota rank) expressed as ONE
``Window.partitionBy(group)`` puts every row of a group through a
single task — the head group's task is linear in the corpus at 100×.
The classic fix is a two-level prefix sum: split each group into
ordered chunks, cumsum locally per chunk in parallel, aggregate one
tiny total per chunk, turn those into exclusive offsets, and add the
offset back to every local cumsum. Integer sums make the composition
BIT-IDENTICAL to the single-window form (addition is associative on
longs), which is what lets the DuckDB oracles keep their
straightforward one-window mirrors.

Chunking here is DETERMINISTIC, not sampled: callers order by a
content hash (md5-derived — the repo's ``content_hash_col`` /
full-hex recipes), so a fixed-width prefix of the hash IS a balanced,
order-consistent chunk id — ``hk DIV (2^32/C)`` for the 8-hex bigint,
``conv(substring(h,1,2),16,10)`` for the full hex string. No
``repartitionByRange`` sampling pass, no dependence on physical
partition placement, same chunk for the same row on every run.

Plan shape: the input is transient-cached once (``functions/
caching.py`` — released at the next registry query) because the
diamond's two consumers would otherwise recompute the caller's whole
upstream pipeline (measured: neither static nor AQE exchange reuse
dedupes the branches here, and under AQE a cached plan's partitioning
is not propagated, so pre-repartitioning buys nothing either). From
the cache: the local cumsum window pays ONE data-sized exchange on
(group, chunk) — the same single shuffle of the same rows the
one-window form pays on (group) — and the chunk-totals aggregate is
map-side combined, so its exchange carries |groups|×C partial rows.
Offsets (|groups|×C rows) broadcast back. Parallelism = |groups|×C
tasks; no task ever sees more than ~1/C of a group. The spillable
cache holds the CALLER'S INPUT rows — for the quota callers the
survivor set, the same frame a single-window form would shuffle
anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_chunk_col(hk_col: str, chunks: int) -> Column:
    """Chunk id for the repo's 8-hex content-hash bigint (uniform on
    [0, 2^32)): integer ``DIV`` by the chunk width — monotone
    non-decreasing in ``hk``, so chunk boundaries respect any ordering
    that leads with ``hk``. Pure integer arithmetic (no float
    division-then-floor boundary risk)."""
    width = -(-(1 << 32) // chunks)  # ceil: guarantees chunk < chunks
    return F.expr(f"{hk_col} DIV {width}").cast("int")


def hex_chunk_col(h_col: str, hex_chars: int = 2) -> Column:
    """Chunk id for a full lowercase-hex hash STRING ordered
    lexicographically: the integer value of its first ``hex_chars``
    characters. Equal-length lowercase hex orders identically as
    string and as number, so the chunk is monotone in the string
    ordering."""
    return F.conv(F.substring(F.col(h_col), 1, hex_chars), 16, 10).cast(
        "int"
    )


def chunked_cumsum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    chunk: Column,
    value: Column,
    out: str,
) -> DataFrame:
    """``out`` = exact running sum of ``value`` over each ``part_cols``
    group in ``order_cols`` order — bit-identical to
    ``F.sum(value).over(Window.partitionBy(*part_cols)
    .orderBy(*order_cols).rowsBetween(unboundedPreceding, currentRow))``
    for integer values, but chunk-parallel.

    ``chunk`` MUST be monotone non-decreasing w.r.t. ``order_cols``
    within every group (callers derive it from the leading order
    column's hash prefix — :func:`hash_chunk_col` /
    :func:`hex_chunk_col`), and ``order_cols`` must totally order rows
    within a group (include a unique tiebreak column)."""
    from psd_project_spark.functions.caching import transient_cache

    pre = transient_cache(df.withColumn("_chunk", chunk))
    w_local = (
        Window.partitionBy(*part_cols, "_chunk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pre.withColumn("_lcum", F.sum(value).over(w_local))
    totals = pre.groupBy(*part_cols, "_chunk").agg(
        F.sum(value).alias("_ctot")
    )
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_coff", F.coalesce(F.sum("_ctot").over(w_off), F.lit(0))
    ).drop("_ctot")
    return (
        local.join(F.broadcast(offsets), [*part_cols, "_chunk"])
        .withColumn(out, (F.col("_coff") + F.col("_lcum")).cast("long"))
        .drop("_chunk", "_lcum", "_coff")
    )


def chunked_rank(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    chunk: Column,
    out: str,
) -> DataFrame:
    """``out`` = exact ``row_number()`` over each group in
    ``order_cols`` order (1-based), as the count prefix sum — the rank
    twin of :func:`chunked_cumsum` with the same chunk contract."""
    return chunked_cumsum(
        df, part_cols, order_cols, chunk, F.lit(1), out
    )
