"""Central query registry: aggregates every operator module's queries.

Each operator module exposes ``QUERIES: dict[name, (callable,
oracle_sql | None)]`` where the callable is ``(spark, sf_dir) ->
DataFrame`` and the SQL (when present) is the DuckDB-equivalent used by
the correctness driver. ``__spark_entry__.py`` re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "psd_project_spark.operators.risk",
    "psd_project_spark.operators.relational",
    "psd_project_spark.operators.relational_tpch",
    "psd_project_spark.operators.relational_tpch3",
    "psd_project_spark.operators.analytics_extra",
    "psd_project_spark.operators.timeseries",
    "psd_project_spark.operators.fuzzy_join",
    "psd_project_spark.operators.behavior",
    "psd_project_spark.operators.governance",
    "psd_project_spark.operators.text_analysis",
    "psd_project_spark.operators.text_curation",
    "psd_project_spark.operators.dedup",
    "psd_project_spark.operators.sampling",
    "psd_project_spark.operators.similarity",
    "psd_project_spark.operators.multimodal",
    "psd_project_spark.operators.scalar_functions",
    "psd_project_spark.operators.skew",
    "psd_project_spark.sources.jsonl",
    "psd_project_spark.sources.orc",
    "psd_project_spark.streaming.jobs",
    "psd_project_spark.streaming.foreach_sink",
)


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    import importlib

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, entry in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = entry
    return out


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _collect().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _collect().items() if sql is not None
    }
