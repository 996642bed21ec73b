"""Cross-operator consistency properties for the round-3 operators.

The DuckDB oracles (tests/test_oracle_parity.py) pin engine parity;
these tests pin SEMANTIC relationships between operators — the checks
a user of the pipeline would rely on (SemDeDup recall vs the exact
1-NN baseline, bigram counts vs token counts, exact-quota mix
arithmetic) — so a shared bug in an operator/oracle pair cannot
survive unnoticed.
"""

import pyspark.sql.functions as F

from psd_project_spark.operators.dedup import (
    COSINE_DUP_THRESHOLD,
    dedup_embedding_1nn,
)
from psd_project_spark.operators.sampling import (
    TARGET_MIX,
    source_mix_rebalance,
)
from psd_project_spark.operators.similarity import SEMDEDUP_T, semantic_dedup
from psd_project_spark.operators.text_analysis import (
    doc_stats,
    ngram_familiarity,
)
from tests.conftest import SF_DIR


def test_semantic_dedup_consistent_with_exact_1nn(spark):
    """Every exact near-dup PAIR (1-NN cosine ≥ threshold) whose two
    vectors land in the same cell must have its higher-id member
    pruned — within a cell, SemDeDup misses nothing the exact pass
    finds. Across cells misses are expected (the documented recall
    trade-off); report-only here, pinned loosely as a floor."""
    assert SEMDEDUP_T == COSINE_DUP_THRESHOLD
    sem = semantic_dedup(spark, SF_DIR).select("vec_id", "cell", "pruned")
    nn = (
        dedup_embedding_1nn(spark, SF_DIR)
        .filter(F.col("is_near_dup"))
        .select("vec_id", "nn_id")
    )
    cells = sem.select("vec_id", "cell")
    pairs = (
        nn.join(cells, "vec_id")
        .join(
            cells.select(
                F.col("vec_id").alias("nn_id"), F.col("cell").alias("nn_cell")
            ),
            "nn_id",
        )
        .withColumn("same_cell", F.col("cell") == F.col("nn_cell"))
        # the keep-lowest-id rule prunes the higher id of a dup pair
        .withColumn("victim", F.greatest("vec_id", "nn_id"))
    )
    flagged = pairs.join(
        sem.select(F.col("vec_id").alias("victim"), "pruned"), "victim"
    ).cache()
    same_cell_missed = flagged.filter(
        F.col("same_cell") & ~F.col("pruned")
    ).count()
    assert same_cell_missed == 0
    total = flagged.select("victim").distinct().count()
    if total == 0:
        # Driver-regenerated testdata currently plants no embedding
        # near-dups (corpus-wide max cosine ≈ 0.5) — then NOTHING may
        # be pruned: a false positive would be a real bug.
        assert sem.filter(F.col("pruned")).count() == 0
        return
    caught = (
        flagged.filter(F.col("pruned")).select("victim").distinct().count()
    )
    recall = caught / total
    # cross-cell misses allowed; floor chosen well under the observed
    # value so testdata regeneration noise cannot flake it
    assert recall >= 0.3, f"SemDeDup recall vs exact 1-NN collapsed: {recall}"


def test_ngram_familiarity_counts_match_doc_stats(spark):
    """n_bigrams must equal n_tokens − 1 for every doc with ≥ 2 tokens
    (bigrams are counted with multiplicity, one per adjacent pair)."""
    fam = ngram_familiarity(spark, SF_DIR).select("doc_id", "n_bigrams")
    toks = doc_stats(spark, SF_DIR).select("doc_id", "n_tokens")
    joined = toks.join(fam, "doc_id", "left")
    bad = joined.filter(
        (F.col("n_tokens") >= 2)
        & (F.coalesce("n_bigrams", F.lit(0)) != F.col("n_tokens") - 1)
    ).count()
    assert bad == 0
    assert joined.filter(F.col("n_bigrams").isNotNull()).count() > 0


def test_source_mix_rebalance_quota_arithmetic(spark):
    """Kept counts must equal floor(scale · w) exactly, the binding
    language must keep ALL its docs, and the kept mix must match the
    target proportions to within the floor() rounding (1 doc)."""
    out = source_mix_rebalance(spark, SF_DIR).cache()
    rows = (
        out.groupBy("lang", "n_lang", "target_n")
        .agg(F.sum(F.col("kept").cast("long")).alias("n_kept"))
        .collect()
    )
    mix = dict(TARGET_MIX)
    scale = min(r["n_lang"] / mix[r["lang"]] for r in rows)
    total_kept = sum(r["n_kept"] for r in rows)
    for r in rows:
        assert r["n_kept"] == int(scale * mix[r["lang"]]) == r["target_n"]
        assert r["n_kept"] <= r["n_lang"]
        # proportion within one floor() step of the target share
        assert abs(r["n_kept"] - mix[r["lang"]] * total_kept) <= len(rows)
    assert any(r["n_kept"] == r["n_lang"] for r in rows), (
        "no binding language — scale computation is wrong"
    )
