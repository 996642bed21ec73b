"""Hypothesis guard for the shared text oracle fragments.

The engine's correctness story leans on `functions/text.py` generating
the SAME semantics twice (Spark expression + DuckDB SQL). Spark-vs-
DuckDB parity is pinned by the oracle suite; this file adds the THIRD,
independent implementation — plain Python over hypothesis-generated
token streams — and checks the DuckDB side against it, so a bug common
to both generated fragments (shared off-by-one, wrong dedup order,
band slicing slip) cannot hide. Pure DuckDB + Python: no Spark session,
so the property runs hundreds of examples in seconds.
"""

import hashlib

import duckdb
from hypothesis import given, settings, strategies as st

import psd_project_spark.functions.text as T

# Token alphabet kept tiny so collisions/duplicate shingles are common.
tokens_st = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=12
)


def _py_shingles(toks: list[str], k: int) -> list[str]:
    if len(toks) < k:
        return []
    out, seen = [], set()
    for i in range(len(toks) - k + 1):
        s = " ".join(toks[i : i + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _py_minhash(shingles: list[str]) -> list[int]:
    hints = [T.feature_hash32(s) for s in shingles]
    return [
        min((a * h + b) % T.HASH_M for h in hints)
        for a, b in zip(T.HASH_A, T.HASH_B)
    ]


def _py_band_keys(sig: list[int]) -> list[str]:
    out = []
    for band in range(T.LSH_BANDS):
        part = sig[band * T.LSH_ROWS : (band + 1) * T.LSH_ROWS]
        out.append(hashlib.md5("|".join(str(v) for v in part).encode()).hexdigest())
    return out


@given(tokens_st)
@settings(max_examples=200, deadline=None)
def test_duckdb_fragments_match_python_reference(toks):
    text = " ".join(toks)
    con = duckdb.connect()
    row = con.execute(
        f"""
        WITH t AS (SELECT ? AS text),
        sh AS (SELECT {T.shingles_sql(T.tokens_sql())} AS s FROM t),
        h AS (SELECT s, {T.hints_sql('s')} AS hints FROM sh),
        m AS (SELECT s, {T.minhash_sig_sql('hints')} AS sig FROM h)
        SELECT s, sig,
          [{', '.join(T.band_key_sql('sig', str(b)) for b in range(T.LSH_BANDS))}]
        FROM m
        """,
        [text],
    ).fetchone()
    duck_sh, duck_sig, duck_bands = row
    # DuckDB's string_split(trim(x), ' ') mirrors str.split(' ') on the
    # trimmed text (empty tokens preserved between doubled separators).
    py_toks = text.strip().split(" ")
    py_sh = _py_shingles(py_toks, T.SHINGLE_K)
    # SET equality, not list: DuckDB's list_distinct does not preserve
    # first-occurrence order (hypothesis found ['a','a','a','b'] →
    # ['a a b', 'a a a']). That is fine BY DESIGN — every downstream
    # consumer (min over hashes, set Jaccard, simhash sum) is
    # order-independent, which the sig/band assertions below prove.
    assert sorted(duck_sh) == sorted(py_sh)
    assert len(duck_sh) == len(set(duck_sh))
    if py_sh:
        assert list(duck_sig) == _py_minhash(py_sh)
        assert list(duck_bands) == _py_band_keys(_py_minhash(py_sh))


@given(st.lists(st.integers(0, 2**32), min_size=12, max_size=12),
       st.lists(st.integers(0, 2**32), min_size=12, max_size=12))
@settings(max_examples=100, deadline=None)
def test_est_jaccard_sql_matches_python(sa, sb):
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {T.est_jaccard_sql('?', '?')}".replace("?", "$sig_a", 1).replace(
            "?", "$sig_b", 1
        ),
        {"sig_a": sa, "sig_b": sb},
    ).fetchone()[0]
    expect = sum(1 for x, y in zip(sa, sb) if x == y) / float(T.MINHASH_K)
    assert got == expect
