"""Driver-replica test: every queries() entry vs its DuckDB oracle.

This mirrors what the correctness driver does at sf0.01 (row count +
column names + values). Float columns must match exactly — the engine's
decimal-summation / fixed-fold-order design makes both paths produce
identical doubles.
"""

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tests.oracle_utils import check_query_vs_oracle

ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    sdf = check_query_vs_oracle(spark, name, SF_DIR, rel=0.0)
    assert len(sdf) > 0, f"{name} returned no rows at {SF_DIR}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
