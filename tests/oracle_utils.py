"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query callable and its DuckDB oracle SQL over the same
parquet tables and asserts row-count, column-name, and value equality
(floats must match to near-bit precision — the engine is designed so
both paths produce identical doubles; see functions/measures.py).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Timestamps → ISO strings so tz/unit representations compare equal.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, rel: float = 0.0):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            for i, (x, y) in enumerate(zip(av, bv)):
                if math.isnan(x) and math.isnan(y):
                    continue
                if rel == 0.0:
                    assert x == y, f"col {c} row {i}: {x!r} != {y!r}"
                else:
                    assert math.isclose(x, y, rel_tol=rel, abs_tol=rel), (
                        f"col {c} row {i}: {x!r} !~ {y!r}"
                    )
        else:
            mism = (av.astype(str) != bv.astype(str))
            assert not mism.any(), (
                f"col {c}: {int(mism.sum())} mismatches, first at row "
                f"{mism.idxmax()}: {av[mism.idxmax()]!r} != {bv[mism.idxmax()]!r}"
            )


def check_query_vs_oracle(spark, name: str, sf_dir: str, rel: float = 0.0):
    """Run __spark_entry__.queries()[name] against oracle_sql()[name]."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, sf_dir).toPandas()
    assert sql is not None, f"no oracle for {name}"
    con = duck_connection(sf_dir)
    ddf = con.execute(sql).fetchdf()
    compare_frames(sdf, ddf, rel=rel)
    return sdf
