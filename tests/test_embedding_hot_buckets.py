"""Hot-group guard inside dedup_embedding_lsh (round 6).

Same contract as tests/test_minhash_hot_buckets.py, ported to vectors:
under exact replication every copy of an embedding shares all band
keys, so the un-guarded band self-join and pandas-UDF verify grow
quadratically in the replication factor (the worst r05
SCALE_EXPERIMENT entry, 4.2× at 10×). The guard collapses identical
vectors (grouping on the raw array — exact float equality, no hash
key) before banding and expands pairs afterwards; it is
semantics-preserving, so the differential here checks EXACT equality
against the DuckDB oracle (the raw band self-join over the FULL
replicated corpus) on a 5×-replicated corpus.
"""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replicated_embeddings(tmp_path_factory):
    """sf0.001 embeddings replicated 5× with shifted vec_ids — every
    LSH bucket deliberately 5× hot with byte-identical vectors."""
    d = tmp_path_factory.mktemp("hotvecs")
    t = pq.read_table(f"{SMALL}/embeddings.parquet")
    off = pc.max(t["vec_id"]).as_py() + 1
    parts = []
    for rep in range(5):
        r = t.set_column(
            t.schema.get_field_index("vec_id"),
            "vec_id",
            pc.add(t["vec_id"], rep * off),
        )
        parts.append(r)
    pq.write_table(pa.concat_tables(parts), str(d / "embeddings.parquet"))
    return str(d)


def test_emb_lsh_exact_under_replication(spark, replicated_embeddings):
    from psd_project_spark.operators.similarity import (
        DEDUP_EMB_LSH_ORACLE,
        dedup_embedding_lsh,
    )

    got = dedup_embedding_lsh(spark, replicated_embeddings).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{replicated_embeddings}/embeddings.parquet'"
    )
    want = con.execute(DEDUP_EMB_LSH_ORACLE).fetchdf()
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    b = b.astype(a.dtypes.to_dict())
    # replication must actually bite: every vector gains C(5,2) = 10
    # within-copy pairs at cosine 1.0, plus each base pair appears 25×
    n_vecs = len(pq.read_table(f"{SMALL}/embeddings.parquet"))
    assert len(a) == len(b) >= n_vecs * 10
    assert a.equals(b)


def test_collapse_keeps_banding_replication_free(spark, replicated_embeddings):
    """Banding/verify input must track DISTINCT vectors: the collapsed
    group count at 5× replication equals the base corpus's."""
    from psd_project_spark.functions.caching import release_transient
    from psd_project_spark.operators.similarity import _embeddings

    def n_groups(sf_dir):
        return _embeddings(spark, sf_dir).groupBy("_v").count().count()

    base, hot = n_groups(SMALL), n_groups(replicated_embeddings)
    assert hot == base
    release_transient()
