"""Physical-plan introspection: the engine's scale properties, testable.

The reference has no optimizer (SURVEY.md §4.1) — here the optimizer IS
the engine, so its load-bearing decisions must be observable and
regression-tested, not assumed:

- small dims broadcast (no shuffle of the big side),
- filters/columns reach the parquet scan (PushedFilters / ReadSchema),
- hot expressions run inside WholeStageCodegen,
- partitioned layouts prune at the source (PartitionFilters).

`tests/test_plan_shapes.py` pins each of these for representative
registry queries; a rewrite that silently de-optimizes a plan fails CI
rather than shipping a 100×-slower-at-100TB regression.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan actually selected (post-AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text: operator tree + per-node details
    (PushedFilters, ReadSchema, PartitionFilters live here)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet source accepted for row-group/page skipping,
    across all scans in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-pruning predicates applied at file listing time."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each scan actually reads (column pruning proof):
    one list per scan node's ReadSchema."""
    cols: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        body = m.group(1)
        cols.append(
            [f.split(":")[0].strip() for f in body.split(",") if f.strip()]
        )
    return cols


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen spans — 0 means the whole plan fell
    back to interpreted execution (a per-row perf cliff). Under AQE the
    codegen annotations only exist on the *final* plan, so by default
    the query is executed (noop sink) before inspecting. Spans appear
    as ``WholeStageCodegen (N)`` in formatted plans and as ``*(N)``
    operator prefixes in simple plan strings; count both."""
    if execute:
        # .collect() (not a noop write — that plans a separate query
        # execution) so THIS df's AQE plan reaches isFinalPlan=true.
        df.collect()
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df)))
    ids |= set(re.findall(r"\*\((\d+)\)", executed_plan(df)))
    return len(ids)
