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
    [("ann_lsh_cosine", 0.6, 0.4), ("ivf_ann_cosine", 0.8, 0.5),
     # the persisted-index lifecycle paths inherit ivf_ann_cosine's
     # recall by construction (same quantizer, same probe rule) —
     # pinned here so a layout/probe change that silently drops cells
     # shows up as a recall regression, not just an oracle mismatch
     ("ivf_index_search", 0.8, 0.5),
     ("ivf_index_compaction", 0.8, 0.5)],
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


def _pair_truth(spark, sf_dir, threshold):
    """Exact 1-NN pairs at/above the cosine threshold (the strongest
    pairs an all-pairs dedup must find), from dedup_embedding_1nn."""
    truth = {}
    for r in queries()["dedup_embedding_1nn"](spark, sf_dir).collect():
        if r["cosine"] >= threshold:
            key = (min(r["vec_id"], r["nn_id"]), max(r["vec_id"], r["nn_id"]))
            truth[key] = max(truth.get(key, 0.0), r["cosine"])
    return truth


def _scurve(cosine):
    """Theoretical banded-LSH pair recall at a given cosine for the
    pair layout (sign-hyperplane LSH: P[bit match] = 1 − θ/π)."""
    import math

    from psd_project_spark.operators.similarity import (
        PAIR_BAND_BITS,
        PAIR_N_BANDS,
    )

    p_bit = 1.0 - math.acos(max(-1.0, min(1.0, cosine))) / math.pi
    return 1.0 - (1.0 - p_bit**PAIR_BAND_BITS) ** PAIR_N_BANDS


@pytest.mark.parametrize("sf_dir", [SF_DIR_MID, SF_DIR_BIG])
def test_embedding_lsh_pair_recall_matches_scurve(spark, sf_dir):
    """dedup_embedding_lsh recall pinned against dedup_embedding_1nn
    truth at BOTH SFs (VERDICT r03 #6). This synthetic corpus has no
    real duplicates (max cosine ≈ 0.5), so at the calibrated 0.4
    threshold the S-curve predicts low recall (~0.10) — the pin is
    that measured recall tracks the THEORY (the banding behaves as
    designed), not an absolute floor that only holds for planted dups
    (covered by test_embedding_lsh_recovers_planted_duplicates)."""
    from psd_project_spark.operators.similarity import EMB_PAIR_THRESHOLD

    truth = _pair_truth(spark, sf_dir, EMB_PAIR_THRESHOLD)
    assert len(truth) >= 30, "corpus no longer exercises the threshold"
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in queries()["dedup_embedding_lsh"](spark, sf_dir).collect()
    }
    measured = len(truth.keys() & lsh) / len(truth)
    expected = sum(_scurve(c) for c in truth.values()) / len(truth)
    assert 0.4 * expected <= measured <= 2.5 * expected, (
        sf_dir, measured, expected,
    )


def test_embedding_lsh_recovers_planted_duplicates(spark):
    """The production claim (docstring: ~90% recall at dup cosine
    ≥ 0.95): plant a perturbed near-duplicate of every 4th vector and
    require the band self-join (the identical operator machinery via
    _pair_band_candidates) to surface ≥ 80% of the planted pairs."""
    import numpy as np

    from psd_project_spark.operators.similarity import (
        _embeddings,
        _pair_band_candidates,
    )

    base = _embeddings(spark, SF_DIR_MID).collect()
    rng = np.random.default_rng(7)
    rows, planted = [], []
    for r in base:
        v = np.asarray(r["_v"], dtype=np.float64)
        rows.append((int(r["vec_id"]), [float(x) for x in v]))
        if r["vec_id"] % 4 == 0:
            dup_id = int(r["vec_id"]) + 1_000_000
            noise = rng.normal(0.0, 1.0, v.shape)
            w = v / np.linalg.norm(v) + 0.18 * noise / np.linalg.norm(noise)
            cos = float(
                v @ w / (np.linalg.norm(v) * np.linalg.norm(w))
            )
            assert cos >= 0.95, cos  # perturbation keeps it a near-dup
            rows.append((dup_id, [float(x) for x in w]))
            planted.append((int(r["vec_id"]), dup_id))
    e = spark.createDataFrame(rows, "vec_id long, _v array<double>")
    cand = {
        (r["vec_a"], r["vec_b"])
        for r in _pair_band_candidates(e).collect()
    }
    recall = sum(1 for p in planted if p in cand) / len(planted)
    assert recall >= 0.8, recall
