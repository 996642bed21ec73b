"""ANN quality: recall of the approximate paths vs brute-force truth.

Oracle parity proves each ANN query computes its own definition
exactly; this test pins the part an oracle can't — that the
approximation is a GOOD one. Ground truth is ``knn_cosine`` (exact
top-k); recall@5 is measured per query against each ANN variant.
The corpus is deterministic (seeded synthetic), so recall is a fixed
number — floors sit below the measured values (LSH 0.72 mean / 0.6
min; IVF 0.92 / 0.6) with slack only for future parameter tweaks.
"""

import pytest

from psd_project_spark.registry import queries
from tests.conftest import SF_DIR_MID

ANN_K = 5


@pytest.fixture(scope="module")
def truth(spark):
    t = {}
    for r in queries()["knn_cosine"](spark, SF_DIR_MID).collect():
        if r["rank"] <= ANN_K:
            t.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return t


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
