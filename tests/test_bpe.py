"""Differential: ``bpe_vocab_train`` vs a plain-Python greedy BPE.

The DuckDB oracle (tests/test_oracle_parity.py) already pins engine
parity; this test pins the SEMANTICS against an independent
reference implementation — occurrence-weighted pair counts,
lexicographic tie-break, greedy left-to-right merge — so a bug shared
by both SQL formulations (e.g. a fold-order slip in the shared string
fold design) cannot slip through.
"""

import collections

import pyarrow.parquet as pq

from psd_project_spark.operators.text_analysis import (
    BPE_ROUNDS,
    bpe_vocab_train,
)
from tests.conftest import SF_DIR


def _python_bpe(texts: list[str], rounds: int) -> list[tuple[int, str, str, int]]:
    cnt: collections.Counter = collections.Counter()
    for t in texts:
        for w in t.strip().split(" "):
            cnt[w] += 1
    segs = {w: list(w) for w in cnt}
    merges = []
    for rnd in range(1, rounds + 1):
        pc: collections.Counter = collections.Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += cnt[w]
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, c))
        for w, syms in segs.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            segs[w] = out
    return merges


def test_bpe_matches_python_reference(spark):
    texts = (
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    expected = _python_bpe(texts, BPE_ROUNDS)
    got = sorted(
        (r["round"], r["sym_left"], r["sym_right"], r["pair_count"])
        for r in bpe_vocab_train(spark, SF_DIR).collect()
    )
    assert got == expected
    assert len({(l, r) for _, l, r, _ in got}) == BPE_ROUNDS


def test_bpe_symbol_init_guards_empty_word(spark):
    """ADVICE r03: Spark's sequence(1, 0) counts DOWN, so an unguarded
    symbol-array init turns a zero-length token into phantom syms
    ['',''] and a spurious ('','') pair — diverging from DuckDB's
    generate_series(1,0)=[]. The guard must yield [] exactly."""
    guarded = (
        "CASE WHEN length(word) >= 1 THEN "
        "transform(sequence(1, length(word)), i -> substring(word, i, 1)) "
        "ELSE cast(array() as array<string>) END"
    )
    rows = spark.sql(
        f"SELECT word, {guarded} AS syms "
        "FROM (VALUES (''), ('a'), ('ab')) t(word) ORDER BY word"
    ).collect()
    assert [r["syms"] for r in rows] == [[], ["a"], ["a", "b"]]
    # and the unguarded form really is the trap (documents why the
    # guard exists; if Spark ever fixes sequence(), this flags it)
    raw = spark.sql(
        "SELECT transform(sequence(1, length('')), i -> 'x') AS s"
    ).collect()[0]["s"]
    assert raw == ["x", "x"]
