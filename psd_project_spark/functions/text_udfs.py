"""Arrow-batched signature UDFs — the Spark half of the shared hashing.

MinHash/SimHash signatures need one md5 + O(K) integer ops per feature.
Catalyst's higher-order-function lambdas are *interpreted* (not
whole-stage-codegen), which made the expression form ~1-3µs per
element-op — 200+ s for 5k docs at 32 hash bits. Here the same math
runs as hashlib (C) + numpy over Arrow batches: ~3 orders faster, and
trivially parallel across partitions. The DuckDB oracle mirrors the
identical integer definitions from :mod:`psd_project_spark.functions.
text` (``feature_hash32`` / ``minhash_sig_sql`` / ``simhash_sql``), so
results stay bit-identical.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from psd_project_spark.functions.text import (
    HASH_A,
    HASH_B,
    HASH_M,
    MINHASH_K,
    SIMHASH_BITS,
)

_A = np.asarray(HASH_A, dtype=np.int64)[:, None]
_B = np.asarray(HASH_B, dtype=np.int64)[:, None]


def _hash32(features: list[str]) -> np.ndarray:
    return np.asarray(
        [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in features],
        dtype=np.int64,
    )


def make_shingles_udf(k: int):
    """Arrow-batched distinct k-word shingles of a text column.

    Same strings, same first-occurrence order as the expression form
    ``shingles_expr(tokens_expr())`` (split on single spaces after
    space-trim, ``' '.join`` of each k-window, dict-dedup ==
    ``array_distinct``) — pinned by tests/test_text_differential.py.

    Exists because ``explode(<HOF-computed array>)`` re-evaluates the
    *interpreted* lambda per OUTPUT row (~50× per doc): a full-corpus
    shingle explode took ~9 s at sf0.1 through Catalyst's interpreter
    vs <0.5 s here. The HOF fragments remain the DuckDB-oracle half.
    """

    @F.pandas_udf(ArrayType(StringType()))
    def shingles(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                # Match the expression form: HOFs propagate NULL.
                out.append(None)
                continue
            toks = t.strip(" ").split(" ")
            n = len(toks)
            if n >= k:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + k]) for i in range(n - k + 1)
                        )
                    )
                )
            else:
                out.append([])
        return pd.Series(out)

    return shingles


#: Shared instance for the default near-dup shingle width.
shingles_udf = make_shingles_udf(3)


@F.pandas_udf(ArrayType(LongType()))
def minhash_sig_udf(features: pd.Series) -> pd.Series:
    """K universal-hash minima per row of feature lists."""
    out = []
    for feats in features:
        feats = list(feats)
        if not feats:
            out.append([None] * MINHASH_K)
            continue
        h = _hash32(feats)[None, :]
        hk = (_A * h + _B) % HASH_M  # (K, n) — products < 2^52, exact
        out.append(hk.min(axis=1).tolist())
    return pd.Series(out)


@F.pandas_udf(StringType())
def simhash_udf(features: pd.Series) -> pd.Series:
    """Majority-vote bit signature over 32-bit feature hashes."""
    js = np.arange(SIMHASH_BITS, dtype=np.int64)[None, :]
    out = []
    for feats in features:
        feats = list(feats)
        if not feats:
            out.append("0" * SIMHASH_BITS)
            continue
        h = _hash32(feats)[:, None]
        bits = (h >> js) & 1  # (n, bits)
        maj = 2 * bits.sum(axis=0) > len(feats)
        out.append("".join("1" if m else "0" for m in maj))
    return pd.Series(out)
