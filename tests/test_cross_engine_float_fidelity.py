"""Pin the three cross-engine float-fidelity mechanisms (round 5).

Every oracle in this repo canonicalizes double↔decimal traffic through
strings. These micro-tests document WHY, by asserting the raw DuckDB
divergence still exists (if a DuckDB upgrade fixes it, these start
failing and the canonicalization can be retired deliberately) and that
the canonical forms match Spark semantics exactly. If someone
"simplifies" an oracle back to direct casts, test_parity_scale's
sf0.1 battery is the backstop — but this file explains the mechanism.
"""

import duckdb


def test_double_to_decimal_cast_divergence_and_fix():
    """DuckDB rounds the exact binary value; Spark rounds the shortest
    decimal repr. The string hop restores shortest-repr semantics."""
    direct, hop = duckdb.sql(
        "SELECT CAST(113299.99::DOUBLE AS DECIMAL(27,15)), "
        "CAST(CAST(113299.99::DOUBLE AS STRING) AS DECIMAL(27,15))"
    ).fetchone()
    assert str(hop) == "113299.990000000000000"
    assert direct != hop  # the raw divergence this repo works around


def test_round_on_double_divergence_and_fix():
    """DuckDB round(double, d) multiplies in double space and can flip
    the last digit near scaled half boundaries; decimal-space round of
    the shortest repr is Spark's F.round semantics."""
    # 65.9175449525 round-trips exactly (its shortest repr ends ...525)
    raw, fixed = duckdb.sql(
        "SELECT round(65.9175449525::DOUBLE, 9), "
        "CAST(round(CAST(CAST(65.9175449525::DOUBLE AS STRING) "
        "AS DECIMAL(38,21)), 9) AS DOUBLE)"
    ).fetchone()
    assert fixed == 65.917544953  # HALF_UP on the shortest repr
    assert raw == 65.917544952  # the multiply-in-double artifact


def test_decimal_to_double_cast_divergence_and_fix():
    """DuckDB's decimal→double cast is not correctly rounded (float
    division by 10^scale); decimal→string→double parses correctly
    rounded — BigDecimal.doubleValue semantics, which Spark's direct
    cast already has."""
    direct, hop = duckdb.sql(
        "SELECT CAST(CAST('12478115489.070000000000000' AS DECIMAL(27,15)) AS DOUBLE), "
        "CAST(CAST(CAST('12478115489.070000000000000' AS DECIMAL(27,15)) AS STRING) AS DOUBLE)"
    ).fetchone()
    assert hop == float("12478115489.07")  # correctly rounded
    assert direct != hop  # 1-2 ulp off — the raw divergence


def test_double_string_roundtrip_is_identity():
    """The hops are safe to over-apply: double→string→double is the
    identity (shortest round-trip repr) — so wrapping an
    already-double expression changes nothing."""
    vals = duckdb.sql(
        "SELECT v, CAST(CAST(v AS STRING) AS DOUBLE) FROM (VALUES "
        "(12478115489.070002::DOUBLE), (0.1::DOUBLE), (-27.6045703125::DOUBLE), "
        "(1.7976931348623157e308::DOUBLE), (5e-324::DOUBLE)) t(v)"
    ).fetchall()
    for v, rt in vals:
        assert v == rt, (v, rt)
