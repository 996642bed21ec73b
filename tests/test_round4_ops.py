"""Round-4 operators: semantic invariants beyond oracle parity.

Oracle parity (driver + tests/test_oracle_parity.py) proves each
operator computes its own definition exactly; these tests pin that the
definitions MEAN something: DSIR weights actually separate the target
split, tokenizer stats respect their arithmetic bounds, the trainer
and encoder agree on the merge model."""

import pytest

from psd_project_spark.registry import queries
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def qs():
    return queries()


def test_dsir_separates_target_language(spark, qs):
    """The entire point of DSIR: documents from the target split must
    score higher on average than off-target documents (their bigrams
    are what the target model was fit on)."""
    from psd_project_spark.operators.text_analysis import DSIR_TARGET_LANG

    rows = [
        r
        for r in qs["dsir_weights"](spark, SF_DIR).collect()
        if r["dsir_weight"] is not None
    ]
    tgt = [r["dsir_weight"] for r in rows if r["lang"] == DSIR_TARGET_LANG]
    off = [r["dsir_weight"] for r in rows if r["lang"] != DSIR_TARGET_LANG]
    assert tgt and off
    mean_t, mean_o = sum(tgt) / len(tgt), sum(off) / len(off)
    assert mean_t > mean_o + 0.5, (mean_t, mean_o)


def test_dsir_weight_is_finite_and_bounded(spark, qs):
    import math

    for r in qs["dsir_weights"](spark, SF_DIR).collect():
        if r["dsir_weight"] is not None:
            assert math.isfinite(r["dsir_weight"])
            # |per-bigram weight| ≤ ln of corpus size ≈ 15; docs have
            # ≤ ~200 bigrams at this SF
            assert abs(r["dsir_weight"]) < 15 * 200


def test_bpe_encode_stats_bounds(spark, qs):
    """Tokenizer arithmetic: ≥1 token per word (merges only shrink
    toward 1), ≤ chars tokens per word, and the ratios agree with the
    counts they were derived from."""
    rows = qs["bpe_encode_stats"](spark, SF_DIR).collect()
    assert rows
    nonempty = [r for r in rows if r["n_words"] > 0]
    assert nonempty
    for r in nonempty:
        assert r["n_tokens"] >= r["n_words"]  # fertility ≥ 1
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] >= 1.0
        assert (
            abs(r["fertility"] - r["n_tokens"] / r["n_words"]) < 1e-6
        )
    empty = [r for r in rows if r["n_words"] == 0]
    for r in empty:
        assert r["n_tokens"] == 0 and r["fertility"] is None


def test_bpe_encoder_uses_trainer_merges(spark, qs):
    """Applying one more merge can only reduce token counts; with the
    trained merges applied, the corpus-wide token total must sit
    strictly below the unmerged character total (the merges fired) and
    above the word total."""
    from pyspark.sql import functions as F

    agg = (
        qs["bpe_encode_stats"](spark, SF_DIR)
        .agg(
            F.sum("n_words").alias("w"),
            F.sum("n_tokens").alias("t"),
        )
        .collect()[0]
    )
    merges = qs["bpe_vocab_train"](spark, SF_DIR).collect()
    total_merged_pairs = sum(r["pair_count"] for r in merges)
    # every applied merge occurrence removes exactly one token vs the
    # char-level segmentation, so tokens < chars iff pair_count > 0
    assert total_merged_pairs > 0
    assert agg["w"] < agg["t"]


def test_cms_overestimate_bound(spark, qs):
    """CMS guarantees: never underestimates; overestimate of any probed
    token is at most the total count mass over the width (loose
    deterministic bound: every colliding token adds its full count;
    with d rows the min cuts it further — assert the classical
    2N/w envelope with margin)."""
    from pyspark.sql import functions as F

    from psd_project_spark.functions import text as T
    from psd_project_spark.operators.freq_sketch import CMS_W
    from psd_project_spark.sources.registry import load_table

    rows = qs["cms_heavy_hitters"](spark, SF_DIR).collect()
    assert len(rows) == 20
    total = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(F.expr(T.tokens_expr())).alias("t"))
        .count()
    )
    for r in rows:
        assert r["cms_n"] >= r["exact_n"]
        assert r["cms_n"] - r["exact_n"] <= 2 * total / CMS_W, r


def test_moments_quantile_sketch_accuracy(spark, qs):
    """Center within 1%, tails within the documented moment-only
    envelope (~35%) on the near-uniform price data — plus exactness on
    a synthetic Gaussian where the estimator is unbiased."""
    import numpy as np

    from psd_project_spark.operators.freq_sketch import _mq_stages

    rows = {r["l_returnflag"]: r
            for r in qs["moments_quantile_sketch"](spark, SF_DIR).collect()}
    import duckdb

    con = duckdb.connect()
    ex = con.execute(
        f"""SELECT l_returnflag,
              quantile_cont(l_extendedprice, 0.1) q10,
              quantile_cont(l_extendedprice, 0.5) q50,
              quantile_cont(l_extendedprice, 0.9) q90
            FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1"""
    ).df()
    for _, e in ex.iterrows():
        r = rows[e["l_returnflag"]]
        assert abs(r["q50_est"] - e["q50"]) / e["q50"] < 0.02
        assert abs(r["q10_est"] - e["q10"]) / e["q10"] < 0.35
        assert abs(r["q90_est"] - e["q90"]) / e["q90"] < 0.35

    # Gaussian data: the estimator is exact up to sampling noise
    rng = np.random.default_rng(11)
    xs = rng.normal(100.0, 15.0, 20000)
    mu, sigma = xs.mean(), xs.std()
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    from pyspark.sql import functions as F

    g = df.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("DECIMAL(38,12)")).alias("s1"),
        F.sum((F.col("x") * F.col("x")).cast("DECIMAL(38,12)")).alias("s2"),
        F.sum(
            (F.col("x") * F.col("x") * F.col("x")).cast("DECIMAL(38,12)")
        ).alias("s3"),
    )
    for name, expr_ in _mq_stages():
        g = g.selectExpr("*", f"{expr_} AS {name}")
    got = g.collect()[0]
    true_q10, true_q50, true_q90 = np.quantile(xs, [0.1, 0.5, 0.9])
    assert abs(got["q50_est"] - true_q50) / abs(true_q50) < 0.01
    assert abs(got["q10_est"] - true_q10) / abs(true_q10) < 0.02
    assert abs(got["q90_est"] - true_q90) / abs(true_q90) < 0.02
