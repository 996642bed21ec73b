"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (all six risk measures of the
reference engine in aggregate form over lineitem — SURVEY.md §7 M0).
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB-equivalent SQL; see
``psd_project_spark/registry.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from psd_project_spark import registry as _registry
from psd_project_spark.operators.risk import measures_agg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return measures_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
