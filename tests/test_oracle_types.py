"""Type-class parity between every oracle and its Spark query.

The correctness driver hash-compares VALUES INCLUDING THEIR DTYPE, so a
DuckDB HUGEINT (what DuckDB returns for sum(int)) against a Spark
BIGINT fails the hash even when the numbers are identical — this was
the only source of red rows in round 1.  Every oracle must CAST integer
sums to BIGINT and date_trunc outputs to TIMESTAMP.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR as SF_SMALL_DIR
from tests.oracle_utils import duck_connection

_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "date": "date", "boolean": "bool", "binary": "bin",
}

_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "REAL": "float", "DOUBLE": "float",
    "VARCHAR": "str", "DATE": "date", "BOOLEAN": "bool", "BLOB": "bin",
}


def _spark_class(dt) -> str:
    s = dt.simpleString()
    if s.startswith("timestamp"):
        return "ts"
    if s.startswith("decimal"):
        return "float"
    return _SPARK_CLASS.get(s, s)


def _duck_class(t: str) -> str:
    t = t.upper()
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.startswith("DECIMAL"):
        return "float"
    return _DUCK_CLASS.get(t, t.lower())


@pytest.fixture(scope="module")
def duck() -> duckdb.DuckDBPyConnection:
    return duck_connection(SF_SMALL_DIR)


def test_no_hugeint_in_any_oracle(duck):
    """DuckDB sum(int) → HUGEINT; Spark sum(int) → BIGINT.  Any HUGEINT
    output column will hash-mismatch in the driver despite equal values."""
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        desc = duck.execute(f"DESCRIBE (\n{sql}\n)").fetchall()
        huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in t.upper()]
        if huge:
            offenders[name] = huge
    assert not offenders, f"uncast integer aggregates: {offenders}"


def test_oracle_type_classes_match_spark(spark, duck):
    """Column-by-column type-class (int/float/str/ts/date/bool) parity.
    Spark schemas are lazy — no job runs, so this covers all oracles fast."""
    qs = entrymod.queries()
    mismatches = {}
    for name, sql in entrymod.oracle_sql().items():
        sfields = {
            f.name: _spark_class(f.dataType)
            for f in qs[name](spark, SF_SMALL_DIR).schema.fields
        }
        dfields = {
            c: _duck_class(t)
            for c, t, *_ in duck.execute(f"DESCRIBE (\n{sql}\n)").fetchall()
        }
        diffs = [
            (c, sfields[c], dfields[c])
            for c in sfields
            if c in dfields and sfields[c] != dfields[c]
        ]
        if set(sfields) != set(dfields):
            diffs.append(("COLUMNS", sorted(sfields), sorted(dfields)))
        if diffs:
            mismatches[name] = diffs
    assert not mismatches, f"type-class drift vs oracle: {mismatches}"
