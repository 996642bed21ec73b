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


# --- 32-bit feature hashing + MinHash signatures -----------------------------
#
# One md5 per feature, reduced to a 32-bit int (first 8 hex chars);
# the K MinHash components are universal-hash transforms of that int:
#     h_k = (A_k·h + B_k) mod HASH_M
# This replaces the earlier per-seed re-hash (K md5 per feature) that
# made signature computation K× more expensive; the constants are
# deterministic (md5-derived) and inlined into both engines. A_k < 2^20
# and h < 2^32 keep every product < 2^52 — exact in int64 (and in
# numpy int64 on the Spark side).

HASH_M = 4_294_967_311  # prime > 2^32


def _hash_constants(k: int) -> tuple[list[int], list[int]]:
    a, b = [], []
    for i in range(k):
        a.append(int(hashlib.md5(f"mh_a_{i}".encode()).hexdigest()[:5], 16) | 1)
        b.append(int(hashlib.md5(f"mh_b_{i}".encode()).hexdigest()[:5], 16))
    return a, b


HASH_A, HASH_B = _hash_constants(MINHASH_K)


def feature_hash32(feature: str) -> int:
    """Python reference of the shared 32-bit feature hash."""
    return int(hashlib.md5(feature.encode()).hexdigest()[:8], 16)


def content_hash_col(id_col):
    """Spark Column: the repo's content-hash recipe — md5 of the id's
    string form, first 8 hex chars as a bigint (DuckDB twin:
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::BIGINT``).
    Centralized because the Spark expression and the oracle SQL must
    stay a bit-exact pair; every in-repo consumer of the 8-hex-conv
    recipe goes through this helper (sampling.py / governance.py
    migrated in round 8 — ``source_mix_rebalance`` is NOT a consumer:
    it orders by the FULL md5 hex string, a different recipe)."""
    from pyspark.sql import functions as F

    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")


def hints_sql(features: str) -> str:
    """DuckDB: features → 32-bit ints (identical to feature_hash32)."""
    return (
        f"list_transform({features}, fh_x -> "
        f"('0x' || substr(md5(fh_x), 1, 8))::BIGINT)"
    )


def minhash_sig_sql(hints: str, k: int = MINHASH_K) -> str:
    """DuckDB: K universal-hash minima over the feature-hash list."""
    comps = ", ".join(
        f"list_aggregate(list_transform({hints}, mh_h -> "
        f"({HASH_A[i]} * mh_h + {HASH_B[i]}) % {HASH_M}), 'min')"
        for i in range(k)
    )
    return f"[{comps}]"


def band_key_expr(sig: str, band: str, rows: int = LSH_ROWS) -> str:
    """Spark SQL: md5 over one band's signature slice. ``band`` is 0-based."""
    parts = " , '|', ".join(
        f"cast(element_at({sig}, {band} * {rows} + {j + 1}) as string)"
        for j in range(rows)
    )
    return f"md5(concat({parts}))"


def band_key_sql(sig: str, band: str, rows: int = LSH_ROWS) -> str:
    parts = " || '|' || ".join(
        f"{sig}[{band} * {rows} + {j + 1}]::VARCHAR" for j in range(rows)
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
# Bit j of the signature is the majority vote of bit j of the 32-bit
# feature hashes: '1' iff 2·|{h : (h >> j) & 1 = 1}| > |features|
# (equivalently, sign of the ±1 sum). One md5 per feature total — the
# earlier per-(bit, feature) md5 formulation cost 32× more.

def simhash_sql(hints: str, bits: int = SIMHASH_BITS) -> str:
    return (
        f"array_to_string(list_transform(generate_series(0, {bits - 1}), j -> "
        f"CASE WHEN 2 * list_sum(list_transform({hints}, sh_h -> (sh_h >> j) & 1)) "
        f"> len({hints}) THEN '1' ELSE '0' END), '')"
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
