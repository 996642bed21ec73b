"""ANN quality: recall of the approximate paths vs brute-force truth.

Oracle parity proves each ANN query computes its own definition
exactly; this test pins the part an oracle can't — that the
approximation is a GOOD one. Ground truth is ``knn_cosine`` (exact
top-k); recall@5 is measured per query against each ANN variant.
The corpus is deterministic (seeded synthetic), so recall is a fixed
number — floors sit below the measured values with slack only for
future parameter tweaks.

The LSH path is pinned at TWO corpus sizes because its banding is
adaptive (similarity.adaptive_band_bits / ANN_B_TABLE): sf0.01
(n=500 → r=4, B=8; measured 0.72 mean / 0.6 min) and sf0.1
(n=2000 → r=6, B=16 capped at ANN_B_MAX; measured 0.52 / 0.4 — the
documented recall cost of capping B instead of growing signature
memory without bound).
"""

import pytest

from psd_project_spark.registry import queries
from tests.conftest import SF_DIR_MID

SF_DIR_BIG = "/root/testdata/sf0.1"
ANN_K = 5


def _truth(spark, sf_dir):
    t = {}
    for r in queries()["knn_cosine"](spark, sf_dir).collect():
        if r["rank"] <= ANN_K:
            t.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return t


@pytest.fixture(scope="module")
def truth(spark):
    return _truth(spark, SF_DIR_MID)


@pytest.mark.parametrize(
    "name,mean_floor,min_floor",
    [("ann_lsh_cosine", 0.6, 0.4), ("ivf_ann_cosine", 0.8, 0.5)],
)
def test_ann_recall(spark, truth, name, mean_floor, min_floor):
    got = {}
    for r in queries()[name](spark, SF_DIR_MID).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ]
    mean = sum(recalls) / len(recalls)
    assert mean >= mean_floor, (name, mean, recalls)
    assert min(recalls) >= min_floor, (name, recalls)


def test_lsh_recall_at_second_banding_setting(spark):
    """The adaptive layout actually changes at sf0.1 (r=6, B=16) —
    assert that first, then pin recall at that second setting."""
    from psd_project_spark.operators.similarity import (
        ANN_B_TABLE,
        adaptive_band_bits,
    )

    n = spark.read.parquet(SF_DIR_BIG + "/embeddings.parquet").count()
    r = adaptive_band_bits(n)
    assert (r, ANN_B_TABLE[r]) != (4, 8), "expected a different layout at sf0.1"

    truth = _truth(spark, SF_DIR_BIG)
    got = {}
    for row in queries()["ann_lsh_cosine"](spark, SF_DIR_BIG).collect():
        got.setdefault(row["query_id"], set()).add(row["neighbor_id"])
    recalls = [
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ]
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.4, (mean, recalls)
    assert min(recalls) >= 0.2, recalls


def test_band_rule_python_equals_sql():
    """adaptive_band_bits / ANN_B_TABLE and their SQL CASE forms are
    generated from the same constants — prove they agree on every
    corpus size around each breakpoint."""
    import duckdb

    from psd_project_spark.operators.similarity import (
        ANN_B_TABLE,
        _band_bits_case_sql,
        _n_bands_case_sql,
        adaptive_band_bits,
    )

    con = duckdb.connect()
    sizes = [1, 2, 63, 64, 127, 128, 129, 500, 511, 512, 513,
             2000, 4096, 4097, 8192, 8193, 10**6]
    for n in sizes:
        r_sql, nb_sql = con.execute(
            f"SELECT {_band_bits_case_sql(str(n))}, "
            f"{_n_bands_case_sql(_band_bits_case_sql(str(n)))}"
        ).fetchone()
        r_py = adaptive_band_bits(n)
        assert (r_sql, nb_sql) == (r_py, ANN_B_TABLE[r_py]), (
            n, r_sql, nb_sql, r_py
        )


def test_kmeans_inertia_monotone(spark):
    """Lloyd's iterations must never increase inertia (each assign and
    each re-mean step is individually optimal)."""
    from psd_project_spark.operators.similarity import kmeans_embeddings
    from tests.conftest import SF_DIR

    rep = sorted(
        kmeans_embeddings(spark, SF_DIR).collect(),
        key=lambda r: r["iteration"],
    )
    assert len(rep) == 3
    inertias = [r["inertia"] for r in rep]
    assert all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:])), inertias
    assert all(r["n_active_clusters"] >= 1 for r in rep)
