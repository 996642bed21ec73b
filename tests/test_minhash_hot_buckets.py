"""Hot-bucket guard inside dedup_minhash_lsh (VERDICT r04 #6).

The raw banded-LSH operator must degrade gracefully under exact
replication — the pathological input where every copy group shares all
band keys — WITHOUT a pipeline-order convention the caller must know.
The guard is a semantics-preserving shingle-set collapse, so the
deliberate-replication differential here checks EXACT equality against
the DuckDB oracle (the raw band self-join) on a 5×-replicated corpus,
not just "it finished".
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replicated_docs(tmp_path_factory):
    """sf0.001 documents replicated 5× with shifted doc_ids — every
    LSH bucket deliberately 5× hot with exact copies."""
    d = tmp_path_factory.mktemp("hotdocs")
    t = pq.read_table(f"{SMALL}/documents.parquet")
    off = pc.max(t["doc_id"]).as_py() + 1
    parts = []
    for rep in range(5):
        r = t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(t["doc_id"], rep * off),
        )
        parts.append(r)
    pq.write_table(pa.concat_tables(parts), str(d / "documents.parquet"))
    return str(d)


def test_raw_lsh_exact_under_replication(spark, replicated_docs):
    from psd_project_spark.operators.dedup import (
        DEDUP_MINHASH_ORACLE,
        dedup_minhash_lsh,
    )

    got = dedup_minhash_lsh(spark, replicated_docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{replicated_docs}/documents.parquet'"
    )
    want = con.execute(DEDUP_MINHASH_ORACLE).fetchdf()
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    b = b.astype(a.dtypes.to_dict())
    # replication must actually bite: each original pair appears 25×,
    # plus within-copy-group pairs — far more than the base corpus
    assert len(a) == len(b) > 100
    assert a.equals(b)


def test_collapse_keeps_band_join_replication_free(spark, replicated_docs):
    """The band self-join must run over distinct shingle sets: its
    input row count at 5× replication equals the base corpus's (the
    guard's whole point — candidate generation tracks DISTINCT
    content, not copies)."""
    from pyspark.sql import functions as F

    from psd_project_spark.functions.caching import release_transient
    from psd_project_spark.operators.dedup import (
        _with_signatures,
        _minhash_pairs,
    )
    from psd_project_spark.sources.registry import load_table

    def n_groups(sf_dir):
        sigs = _with_signatures(load_table(spark, sf_dir, "documents"), spark)
        return (
            sigs.select(F.md5(F.to_json(F.array_sort("_sh"))).alias("g"))
            .distinct()
            .count()
        )

    base, hot = n_groups(SMALL), n_groups(replicated_docs)
    assert hot == base  # exact copies collapse to the same groups
    release_transient()
