"""Substring-level exact dedup (ExactSubstr class): crafted fixtures
with PLANTED repeated spans, oracle parity, and edge semantics.

The operator's contract (exact_substr.py): a position is duplicated
iff its verbatim k-gram occurs ≥ 2 times corpus-wide (cross-doc OR
intra-doc); maximal regions merge overlap-or-adjacent coverage.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.oracle_utils import compare_frames, duck_connection

K = 8  # keep in sync with EXACT_SUBSTR_K (asserted below)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def test_k_constant_in_sync():
    from psd_project_spark.operators.exact_substr import EXACT_SUBSTR_K

    assert EXACT_SUBSTR_K == K


def test_planted_cross_doc_span(spark):
    """A 12-token span planted in two docs: each doc reports one span
    of exactly 12 tokens (12-8+1 = 5 duplicated anchor positions)."""
    from psd_project_spark.operators.exact_substr import exact_substr_report

    shared = _words("dup", 12)
    rows = [
        (1, _words("a", 10) + " " + shared + " " + _words("b", 10)),
        (2, _words("c", 7) + " " + shared + " " + _words("d", 15)),
        (3, _words("clean", 40)),
    ]
    got = (
        exact_substr_report(_docs(spark, rows))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for doc, start_len in ((1, 10), (2, 7)):
        r = got.loc[doc]
        assert r.n_spans == 1
        assert r.dup_tokens == 12
        assert r.max_span_tokens == 12
        assert r.n_dup_anchors == 12 - K + 1
    assert got.loc[3].n_spans == 0 and got.loc[3].dup_tokens == 0


def test_planted_span_bounds(spark):
    """Span bounds are token positions (1-based, inclusive)."""
    from psd_project_spark.operators.exact_substr import exact_substr_spans

    shared = _words("dup", K)  # minimal: exactly one anchor
    rows = [
        (1, _words("a", 5) + " " + shared + " " + _words("b", 3)),
        (2, shared),
    ]
    spans = (
        exact_substr_spans(_docs(spark, rows))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert spans.loc[1].span_start == 6 and spans.loc[1].span_end == 6 + K - 1
    assert spans.loc[2].span_start == 1 and spans.loc[2].span_end == K
    assert (spans.span_tokens == K).all() and (spans.n_anchors == 1).all()


def test_intra_doc_repetition_counts(spark):
    """ExactSubstr criterion includes repetition WITHIN one doc: a doc
    that repeats its own k-gram (and no other doc shares it) is still
    flagged."""
    from psd_project_spark.operators.exact_substr import exact_substr_report

    rep = _words("x", K)
    rows = [(1, rep + " " + _words("gap", K) + " " + rep)]
    got = exact_substr_report(_docs(spark, rows)).toPandas().iloc[0]
    assert got.n_spans == 2
    assert got.dup_tokens == 2 * K
    assert got.n_dup_anchors == 2


def test_adjacent_and_overlapping_spans_merge(spark):
    """Two duplicated 8-gram positions ≤ k apart merge into ONE
    maximal region; a gap > k splits."""
    from psd_project_spark.operators.exact_substr import exact_substr_spans

    long_shared = _words("dup", 20)  # 13 overlapping anchors, one region
    rows = [
        (1, long_shared + " " + _words("a", 9)),
        (2, _words("b", 9) + " " + long_shared),
    ]
    spans = exact_substr_spans(_docs(spark, rows)).toPandas()
    assert len(spans) == 2  # one merged region per doc
    assert (spans.span_tokens == 20).all()
    assert (spans.n_anchors == 13).all()


def test_short_docs_emit_no_phantom_positions(spark):
    """Docs shorter than k produce NO anchors (the sequence-counts-down
    guard): identical short docs must not be flagged."""
    from psd_project_spark.operators.exact_substr import exact_substr_report

    short = _words("s", K - 1)
    got = (
        exact_substr_report(_docs(spark, [(1, short), (2, short)]))
        .toPandas()
    )
    assert len(got) == 2
    assert (got.n_spans == 0).all() and (got.dup_tokens == 0).all()


def test_full_coverage_doc(spark):
    """A doc that is entirely a copy reports dup_frac == 1.0."""
    from psd_project_spark.operators.exact_substr import exact_substr_report

    text = _words("w", 30)
    got = (
        exact_substr_report(_docs(spark, [(1, text), (2, text)]))
        .toPandas()
    )
    assert (got.dup_frac == 1.0).all()
    assert (got.dup_tokens == 30).all()


@pytest.mark.parametrize("seed", [7, 11])
def test_randomized_differential_vs_oracle(spark, seed):
    """Random corpora with injected copies: Spark ≡ DuckDB bit-for-bit
    on a corpus that is NOT the shared testdata (differential against
    crafted adversarial inputs, the test_packing discipline)."""
    import random

    import duckdb

    from psd_project_spark.operators.exact_substr import (
        EXACT_SUBSTR_ORACLE,
        exact_substr_report,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]  # small vocab → chance dups
    rows = []
    for doc in range(60):
        n = rng.randint(2, 60)
        rows.append((doc, " ".join(rng.choice(vocab) for _ in range(n))))
    # inject verbatim copies of random windows into later docs
    for doc in range(60, 80):
        src = rows[rng.randrange(60)][1].split()
        if len(src) > K:
            i = rng.randrange(len(src) - K)
            span = src[i : i + K + rng.randint(0, 4)]
        else:
            span = src
        filler = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        rows.append((doc, " ".join(filler + span + filler)))
    got = exact_substr_report(_docs(spark, rows)).toPandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    compare_frames(got, con.execute(EXACT_SUBSTR_ORACLE).fetchdf())


def test_cut_removes_planted_span_everywhere(spark):
    """exact_substr_cut removes ALL occurrences of a duplicated span
    (the conservative variant) and nothing else."""
    from psd_project_spark.operators.exact_substr import exact_substr_cut

    import tempfile

    shared = _words("dup", 12)
    rows = [
        (1, _words("a", 10) + " " + shared + " " + _words("b", 10)),
        (2, _words("c", 7) + " " + shared),
        (3, _words("clean", 40)),
    ]
    # exact_substr_cut reads via load_table → write a scratch corpus
    d = tempfile.mkdtemp(prefix="psd_escut_")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = exact_substr_cut(spark, d).toPandas().set_index("doc_id").sort_index()
    assert got.loc[1].clean_text == _words("a", 10) + " " + _words("b", 10)
    assert got.loc[2].clean_text == _words("c", 7)
    assert got.loc[3].clean_text == _words("clean", 40)
    assert got.loc[1].n_tokens_cut == 12 and got.loc[2].n_tokens_cut == 12
    assert got.loc[3].n_tokens_cut == 0


def test_cut_mass_consistent_with_report(spark):
    """Per doc, n_tokens_cut == the report's dup_tokens — the two
    registry queries agree on the removed mass."""
    from psd_project_spark.operators.exact_substr import (
        dedup_exact_substr,
        exact_substr_cut,
    )

    rep = (
        dedup_exact_substr(spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")["dup_tokens"]
        .sort_index()
    )
    cut = (
        exact_substr_cut(spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")["n_tokens_cut"]
        .sort_index()
    )
    assert (rep == cut).all()


def test_cut_oracle_parity(spark):
    from psd_project_spark.operators.exact_substr import (
        EXACT_SUBSTR_CUT_ORACLE,
        exact_substr_cut,
    )

    got = exact_substr_cut(spark, SF_DIR).toPandas()
    con = duck_connection(SF_DIR)
    compare_frames(got, con.execute(EXACT_SUBSTR_CUT_ORACLE).fetchdf())


def test_registry_query_oracle_parity(spark):
    from psd_project_spark.operators.exact_substr import (
        EXACT_SUBSTR_ORACLE,
        dedup_exact_substr,
    )

    got = dedup_exact_substr(spark, SF_DIR).toPandas()
    assert (got.n_spans > 0).any()  # the corpus genuinely has dups
    con = duck_connection(SF_DIR)
    compare_frames(got, con.execute(EXACT_SUBSTR_ORACLE).fetchdf())


def _scratch_corpus(spark, rows):
    import tempfile

    d = tempfile.mkdtemp(prefix="psd_decon_")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_decontaminate_substr_planted_leak(spark):
    """A span planted from the eval split (doc_id % 50 == 0) into a
    train doc is reported as a leaked region; train-train duplication
    WITHOUT an eval occurrence is NOT flagged (this operator screens
    against the eval set, it is not dedup); eval docs never appear in
    the output."""
    from psd_project_spark.operators.exact_substr import decontaminate_substr

    eval_span = _words("ev", 12)
    train_dup = _words("tt", 12)
    rows = [
        (0, _words("e", 5) + " " + eval_span),               # eval doc
        (1, _words("a", 10) + " " + eval_span + " " + _words("b", 4)),
        (2, _words("clean", 30)),
        (3, train_dup + " " + _words("c", 9)),               # train-train
        (4, _words("d", 9) + " " + train_dup),               # dup only
    ]
    got = (
        decontaminate_substr(spark, _scratch_corpus(spark, rows))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert sorted(got.index) == [1, 2, 3, 4]  # eval doc 0 excluded
    leak = got.loc[1]
    assert leak.n_spans == 1
    assert leak.leaked_tokens == 12
    assert leak.max_span_tokens == 12
    assert leak.n_leak_anchors == 12 - K + 1
    for doc in (2, 3, 4):
        assert got.loc[doc].n_spans == 0
        assert got.loc[doc].leaked_tokens == 0


def test_decontaminate_substr_oracle_parity(spark):
    from psd_project_spark.operators.exact_substr import (
        DECONTAMINATE_SUBSTR_ORACLE,
        decontaminate_substr,
    )

    got = decontaminate_substr(spark, SF_DIR).toPandas()
    con = duck_connection(SF_DIR)
    compare_frames(got, con.execute(DECONTAMINATE_SUBSTR_ORACLE).fetchdf())


# --- substr_index_incremental (persisted anchor index) -----------------------

def test_substr_index_matches_one_shot_screen(spark):
    """build + append + compact + pruned probe ≡ the one-shot
    full-corpus screen — the whole point of persisting the anchor
    table (same-oracle contract as minhash_index_incremental)."""
    import shutil

    from psd_project_spark.operators.exact_substr import (
        _substr_index_dir,
        decontaminate_substr,
        substr_index_incremental,
    )

    shutil.rmtree(_substr_index_dir(SF_DIR) + "_incr", ignore_errors=True)
    got = substr_index_incremental(spark, SF_DIR).toPandas()
    want = decontaminate_substr(spark, SF_DIR).toPandas()
    compare_frames(got, want)
    assert (got.n_spans > 0).any()  # the screen genuinely fires


def test_substr_index_reuses_gated_build(spark):
    """Second invocation must reuse the marker-gated index (no
    rebuild) and still produce identical results; compaction left
    every bucket single-file."""
    import os

    from psd_project_spark.operators.exact_substr import (
        _substr_index_dir,
        substr_index_incremental,
    )
    from psd_project_spark.operators.index_compact import (
        multi_file_buckets,
    )

    path = _substr_index_dir(SF_DIR) + "_incr"
    assert os.path.exists(os.path.join(path, "_DELTA_APPENDED"))
    assert multi_file_buckets(path) == []  # compaction ran
    before = {
        b: sorted(os.listdir(os.path.join(path, b)))
        for b in os.listdir(path)
        if b.startswith("bucket=")
    }
    again = substr_index_incremental(spark, SF_DIR).toPandas()
    after = {
        b: sorted(os.listdir(os.path.join(path, b)))
        for b in os.listdir(path)
        if b.startswith("bucket=")
    }
    assert before == after  # reused byte-identical, not rebuilt
    con = duck_connection(SF_DIR)
    from psd_project_spark.operators.exact_substr import (
        DECONTAMINATE_SUBSTR_ORACLE,
    )

    compare_frames(again, con.execute(DECONTAMINATE_SUBSTR_ORACLE).fetchdf())


def test_substr_index_crash_between_batches_rebuilds(spark):
    """A crash between base and delta leaves a dir that fails the
    marker gate — the next run rebuilds instead of serving a
    base-only index (the build_base_plus_delta contract applied to
    the anchor index)."""
    import os
    import shutil

    from psd_project_spark.operators.exact_substr import (
        DECONTAMINATE_SUBSTR_ORACLE,
        _substr_index_dir,
        _write_substr_index,
        _anchor_positions,
    )
    from psd_project_spark.operators import exact_substr as xs
    from psd_project_spark.sources.registry import load_table

    path = _substr_index_dir(SF_DIR) + "_incr"
    shutil.rmtree(path, ignore_errors=True)
    # simulate: base batch committed, then crash (no delta, no marker)
    docs = load_table(spark, SF_DIR, "documents")
    anchors = _anchor_positions(docs)
    from pyspark.sql import functions as SF

    is_eval = SF.col("doc_id") % 50 == 0
    is_delta = SF.col("doc_id") % 3 == 2
    _write_substr_index(
        anchors.filter(~is_eval & ~is_delta), path, "overwrite"
    )
    assert not os.path.exists(os.path.join(path, "_DELTA_APPENDED"))
    got = xs.substr_index_incremental(spark, SF_DIR).toPandas()
    assert os.path.exists(os.path.join(path, "_DELTA_APPENDED"))
    con = duck_connection(SF_DIR)
    compare_frames(got, con.execute(DECONTAMINATE_SUBSTR_ORACLE).fetchdf())
