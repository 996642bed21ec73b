"""Round-8 operator tests: chunk-parallel exact prefix sums (the
VERDICT r07 #1 fix), classifier evaluation, and lifecycle additions."""

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from psd_project_spark.functions.prefix import (
    chunked_cumsum,
    chunked_rank,
    hash_chunk_col,
    hex_chunk_col,
)
from psd_project_spark.functions.text import content_hash_col
from psd_project_spark.plans import executed_plan
from tests.conftest import SF_DIR


def _window_lines(plan: str) -> list[str]:
    # operator lines look like "   +- Window [sum(...) ...], [keys], [order]"
    return [ln for ln in plan.splitlines() if "Window [" in ln]


# --- functions/prefix.py ------------------------------------------------------


def _hashed_groups(spark):
    """Groups of very different sizes (401 / 23 / 23 rows) keyed by the
    repo's content hash — the chunk derivation's real input shape."""
    rows = [
        (g, i, (i * 7919 + ord(g)) % 97 + 1)
        for g in ("a", "b", "c")
        for i in range(401 if g == "a" else 23)
    ]
    return spark.createDataFrame(
        rows, "grp string, id long, val int"
    ).withColumn("hk", content_hash_col("id"))


def test_chunked_cumsum_equals_single_window(spark):
    """Bit-exact differential: the two-level chunk-parallel prefix sum
    ≡ one global window per group (integer sums are associative)."""
    df = _hashed_groups(spark)
    got = (
        chunked_cumsum(
            df,
            ["grp"],
            ["hk", "id"],
            hash_chunk_col("hk", 8),
            F.col("val"),
            "cum",
        )
        .select("grp", "id", "cum")
        .toPandas()
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("hk", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = (
        df.withColumn("cum", F.sum("val").over(w).cast("long"))
        .select("grp", "id", "cum")
        .toPandas()
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_chunked_rank_equals_row_number(spark):
    df = _hashed_groups(spark)
    got = (
        chunked_rank(df, ["grp"], ["hk", "id"], hash_chunk_col("hk", 8), "rk")
        .select("grp", "id", "rk")
        .toPandas()
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    w = Window.partitionBy("grp").orderBy("hk", "id")
    want = (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .select("grp", "id", "rk")
        .toPandas()
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_hash_chunk_col_bounds_and_monotone(spark):
    """Chunk ids stay inside [0, chunks) over the hash key's full
    [0, 2^32) range — including the extremes — and are monotone."""
    hks = [0, 1, (1 << 31), (1 << 32) - 2, (1 << 32) - 1]
    df = spark.createDataFrame([(h,) for h in hks], "hk long")
    out = (
        df.withColumn("c", hash_chunk_col("hk", 64))
        .orderBy("hk")
        .toPandas()
    )
    assert out["c"].between(0, 63).all(), out
    assert out["c"].is_monotonic_increasing


def test_hex_chunk_col_matches_string_order(spark):
    """hex_chunk_col is monotone w.r.t. the lexicographic order of the
    full lowercase-hex hash string (equal-length hex sorts the same as
    its numeric value)."""
    df = spark.createDataFrame(
        [(str(i),) for i in range(300)], "s string"
    ).withColumn("h", F.md5("s"))
    out = (
        df.withColumn("c", hex_chunk_col("h"))
        .orderBy("h")
        .toPandas()
    )
    assert out["c"].between(0, 255).all()
    assert out["c"].is_monotonic_increasing


def test_budget_prefix_plan_has_no_per_source_window(spark):
    """VERDICT r07 #1 'done' criterion: no corpus-sized single-task
    Window — every Window in the selection plan is chunk- or
    salt-partitioned (the offsets window over the tiny per-chunk
    totals orders BY the chunk and is |sources|x|chunks| rows)."""
    from psd_project_spark.operators.quality_classifier import (
        _budget_prefix,
    )

    rows = [(i, "s%d" % (i % 3), 1 + i % 9, 10_000) for i in range(600)]
    sized = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens int, budget_tokens long"
    ).withColumn("hk", content_hash_col("doc_id"))
    plan = executed_plan(_budget_prefix(sized))
    wins = _window_lines(plan)
    assert wins, plan
    for ln in wins:
        assert ("_chunk" in ln) or ("salt" in ln), ln


# --- per-epoch driver-state bounds (VERDICT r07 "What's wrong" #2) -----------


def test_stream_ann_search_oversized_epoch_fails_cleanly(spark, tmp_path):
    from psd_project_spark.operators.similarity import _search_batch_fn

    e = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, _v array<double>",
    )
    fn = _search_batch_fn(e, str(tmp_path / "idx"), str(tmp_path / "out"),
                          max_epoch_rows=3)
    batch = spark.createDataFrame(
        [(100 + i, [float(i), 2.0]) for i in range(5)],
        "vec_id long, _v array<double>",
    )
    with pytest.raises(RuntimeError, match="query vectors"):
        fn(batch, 0)


def test_stream_crawl_screen_oversized_epoch_fails_cleanly(spark, tmp_path):
    from psd_project_spark.operators.exact_substr import _screen_batch_fn

    fn = _screen_batch_fn(
        str(tmp_path / "idx"), set(), str(tmp_path / "out"),
        max_epoch_docs=2,
    )
    batch = spark.createDataFrame(
        [(i, "some words here " * 12) for i in range(4)],
        "doc_id long, text string",
    )
    with pytest.raises(RuntimeError, match="documents"):
        fn(batch, 0)


# --- classifier evaluation tier -----------------------------------------------


def test_classifier_eval_counts_and_bounds(spark):
    """Confusion cells partition each source's docs; P/R/F1 land in
    [0,1]; the global confusion totals match the score query."""
    from psd_project_spark.operators.quality_classifier import (
        quality_classifier_eval,
        quality_classifier_score,
    )

    ev = quality_classifier_eval(spark, SF_DIR).toPandas()
    assert (ev["tp"] + ev["fp"] + ev["fn"] + ev["tn"] == ev["n_docs"]).all()
    for c in ("precision", "recall", "f1"):
        assert ev[c].between(0.0, 1.0).all(), ev[[c]]
    sc = quality_classifier_score(spark, SF_DIR).toPandas()
    assert int(ev["tp"].sum() + ev["fp"].sum()) == int(sc["keep"].sum())
    assert int(ev["tp"].sum() + ev["fn"].sum()) == int(sc["label"].sum())
    assert int(ev["n_docs"].sum()) == len(sc)


def test_calibration_bins_partition_corpus(spark):
    from psd_project_spark.operators.quality_classifier import (
        quality_calibration,
        quality_classifier_score,
    )

    cal = quality_calibration(spark, SF_DIR).toPandas()
    sc = quality_classifier_score(spark, SF_DIR).toPandas()
    assert cal["bin"].between(0, 9).all()
    assert cal["bin"].is_unique
    assert int(cal["n_docs"].sum()) == len(sc)
    # each bin's mean score sits inside the bin's score interval
    for _, row in cal.iterrows():
        lo, hi = row["bin"] / 10.0, (row["bin"] + 1) / 10.0
        assert lo - 1e-6 <= row["mean_score"] <= hi + 1e-6, row
        assert abs(
            row["gap"] - round(abs(row["mean_score"] - row["pos_rate"]), 6)
        ) < 1e-9
    # the table carries real calibration signal: the top bin's
    # empirical positive rate beats the bottom bin's
    if len(cal) > 1:
        srt = cal.sort_values("bin")
        assert srt["pos_rate"].iloc[-1] > srt["pos_rate"].iloc[0]


def test_model_memo_returns_trained_weights(spark):
    """_model ≡ _train on first use and serves the memo after."""
    from psd_project_spark.operators import quality_classifier as qc

    feat = qc._feature_frame(spark, SF_DIR)
    w1, b1, rep1 = qc._model(SF_DIR, feat)
    # a second call must not retrain: poison _train and ask again
    orig = qc._train
    qc._train = lambda *_: (_ for _ in ()).throw(
        AssertionError("memo miss: _train re-ran")
    )
    try:
        w2, b2, rep2 = qc._model(SF_DIR, feat)
    finally:
        qc._train = orig
    assert w1 == w2 and b1 == b2 and rep1 == rep2
    w3, b3, rep3 = qc._train(feat)
    assert w1 == w3 and b1 == b3 and rep1 == rep3


def test_source_mix_rebalance_plan_chunked(spark):
    """The retired 'price of exactness' per-lang sort stays retired:
    every Window in the plan carries the chunk column."""
    from psd_project_spark.operators.sampling import source_mix_rebalance

    plan = executed_plan(source_mix_rebalance(spark, SF_DIR))
    wins = _window_lines(plan)
    assert wins, plan
    for ln in wins:
        assert "_chunk" in ln, ln
