"""Text primitives shared by the text-analysis / dedup / similarity ops.

Every primitive exists twice — a Spark ``Column`` expression and a
DuckDB SQL fragment — generated from the same constants so the engine
and the oracle cannot drift. All hashing is ``md5`` (identical
lowercase-hex output in both engines); ordering/tie-break rules are
explicit everywhere.

Scale notes (100 TB):

- Tokenization/shingling/minhashing are pure JVM expressions (no
  Python), run per-row inside whole-stage codegen, and never shuffle.
- MinHash-LSH candidate generation shuffles once on ``(band_id,
  band_key)`` — the standard banded-LSH join. Hot buckets (thousands of
  byte-identical docs) are the known skew case: cap bucket width or
  pre-drop exact dups (``dedup_exact``) before the LSH pass.
- SimHash is one 32-bit signature per doc; the pair join uses the
  pigeonhole halves trick (hamming ≤ 3 ⇒ one 16-bit half equal), so
  candidate generation is two equi-joins, never a cross product.
"""

from __future__ import annotations

import hashlib

#: Number of MinHash components and LSH banding layout (bands × rows).
MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS = 3
assert LSH_BANDS * LSH_ROWS == MINHASH_K

#: SimHash width in bits (one bit per leading md5 hex char).
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 3

#: Word-shingle width for near-dup features.
SHINGLE_K = 3

#: Jaccard thresholds.
MINHASH_EST_THRESHOLD = 0.5
JACCARD_THRESHOLD = 0.8

_HI_HEX = "('8','9','a','b','c','d','e','f')"


# --- tokens / shingles -------------------------------------------------------

def tokens_expr(text_col: str = "text") -> str:
    """Spark SQL: whitespace tokens (data is single-space separated)."""
    return f"split(trim({text_col}), ' ')"


def tokens_sql(text_col: str = "text") -> str:
    return f"string_split(trim({text_col}), ' ')"


def shingles_expr(toks: str, k: int = SHINGLE_K) -> str:
    """Spark SQL: distinct k-word shingles of a token array (1-based)."""
    joined = " , ' ', ".join(f"element_at({toks}, i + {j})" for j in range(k))
    return (
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> concat({joined}))) "
        f"ELSE cast(array() as array<string>) END"
    )


def shingles_sql(toks: str, k: int = SHINGLE_K) -> str:
    joined = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_distinct(list_transform(generate_series(1, len({toks}) - {k - 1}), "
        f"i -> {joined})) "
        f"ELSE [] END"
    )


# --- MinHash signatures ------------------------------------------------------

def minhash_sig_expr(shingles: str, k: int = MINHASH_K) -> str:
    """Spark SQL: K seeded-md5 min-hashes (lexicographic min of hex)."""
    return (
        f"transform(sequence(0, {k - 1}), s -> "
        f"array_min(transform({shingles}, x -> md5(concat(cast(s as string), ':', x)))))"
    )


def minhash_sig_sql(shingles: str, k: int = MINHASH_K) -> str:
    # Lambda vars deliberately obscure: DuckDB lambda parameters shadow
    # same-named columns of the enclosing query.
    return (
        f"list_transform(generate_series(0, {k - 1}), mh_k -> "
        f"list_aggregate(list_transform({shingles}, mh_x -> md5(mh_k::VARCHAR || ':' || mh_x)), 'min'))"
    )


def band_key_expr(sig: str, band: str, rows: int = LSH_ROWS) -> str:
    """Spark SQL: md5 over one band's signature slice. ``band`` is 0-based."""
    parts = " , '|', ".join(
        f"element_at({sig}, {band} * {rows} + {j + 1})" for j in range(rows)
    )
    return f"md5(concat({parts}))"


def band_key_sql(sig: str, band: str, rows: int = LSH_ROWS) -> str:
    parts = " || '|' || ".join(
        f"{sig}[{band} * {rows} + {j + 1}]" for j in range(rows)
    )
    return f"md5({parts})"


def est_jaccard_expr(sa: str, sb: str, k: int = MINHASH_K) -> str:
    """Spark SQL: fraction of agreeing signature components."""
    # cast: a bare 12.0 literal parses as DECIMAL in Spark SQL too.
    return (
        f"aggregate(zip_with({sa}, {sb}, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        f"0, (acc, v) -> acc + v) / cast({float(k)} as double)"
    )


def est_jaccard_sql(sa: str, sb: str, k: int = MINHASH_K) -> str:
    # CAST: a bare 12.0 literal is DECIMAL in DuckDB and would make the
    # whole expression decimal-typed instead of double.
    return (
        f"list_sum(list_transform(generate_series(1, {k}), "
        f"i -> CASE WHEN {sa}[i] = {sb}[i] THEN 1 ELSE 0 END)) / CAST({float(k)} AS DOUBLE)"
    )


def exact_jaccard_expr(sha: str, shb: str) -> str:
    """Spark SQL: |A∩B| / |A∪B| over distinct-shingle arrays."""
    return (
        f"cast(size(array_intersect({sha}, {shb})) as double) "
        f"/ size(array_union({sha}, {shb}))"
    )


def exact_jaccard_sql(sha: str, shb: str) -> str:
    return (
        f"len(list_intersect({sha}, {shb}))::DOUBLE "
        f"/ len(list_distinct(list_concat({sha}, {shb})))"
    )


# --- SimHash -----------------------------------------------------------------

def simhash_expr(features: str, bits: int = SIMHASH_BITS) -> str:
    """Spark SQL: bit j = sign of Σ_feature (±1 by md5 hex digit j)."""
    return (
        f"concat_ws('', transform(sequence(1, {bits}), j -> "
        f"CASE WHEN aggregate({features}, 0, (acc, x) -> acc + "
        f"CASE WHEN substring(md5(x), j, 1) IN {_HI_HEX} THEN 1 ELSE -1 END) > 0 "
        f"THEN '1' ELSE '0' END))"
    )


def simhash_sql(features: str, bits: int = SIMHASH_BITS) -> str:
    return (
        f"array_to_string(list_transform(generate_series(1, {bits}), j -> "
        f"CASE WHEN list_sum(list_transform({features}, x -> "
        f"CASE WHEN substr(md5(x), j, 1) IN {_HI_HEX} THEN 1 ELSE -1 END)) > 0 "
        f"THEN '1' ELSE '0' END), '')"
    )


def hamming_expr(sa: str, sb: str, bits: int = SIMHASH_BITS) -> str:
    """Spark SQL: hamming distance between two bit-string signatures."""
    return (
        f"aggregate(transform(sequence(1, {bits}), j -> "
        f"CASE WHEN substring({sa}, j, 1) = substring({sb}, j, 1) THEN 0 ELSE 1 END), "
        f"0, (acc, v) -> acc + v)"
    )


def hamming_sql(sa: str, sb: str, bits: int = SIMHASH_BITS) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {bits}), "
        f"j -> CASE WHEN substr({sa}, j, 1) = substr({sb}, j, 1) THEN 0 ELSE 1 END)) AS BIGINT)"
    )


# --- deterministic sign hyperplanes (embedding LSH) --------------------------

def hyperplane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """±1 hyperplane components derived from md5 — identical constants
    are inlined into the Spark plan and the oracle SQL, so both engines
    bucket identically without needing numeric hex conversion in SQL."""
    planes: list[list[float]] = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"p{j}_{i}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) >= 8 else -1.0)
        planes.append(row)
    return planes
