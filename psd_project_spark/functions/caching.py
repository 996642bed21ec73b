"""Per-query scratch caches with deterministic release.

Several operators cache an intermediate (signature tables, exploded
n-grams, cell assignments) that feeds BOTH the returned lazy DataFrame
and other branches of the same query — so it cannot be unpersisted
inside the operator (the caller has not materialized yet), but leaving
it cached forever accumulates session-lifetime memory (the
``dedup_embedding_lsh`` leak class, ADVICE r03).

:func:`transient_cache` caches the frame AND registers it;
:func:`release_transient` unpersists everything registered. The query
registry (`registry.py`) calls ``release_transient`` on every query
entry, so a scratch cache lives exactly from its query's construction
until the NEXT query starts — long enough for any consumer to
materialize the result, never longer. (Queries run serially per
session in every harness — driver, bench, pytest — which is what makes
next-entry release safe.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRANSIENT: list[DataFrame] = []


def transient_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` for the duration of the current query."""
    df = df.cache()
    _TRANSIENT.append(df)
    return df


def release_transient() -> int:
    """Unpersist every scratch cache from prior queries; returns how
    many were released. Never raises (a stopped session just drops)."""
    n = 0
    while _TRANSIENT:
        df = _TRANSIENT.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


# --- session-scoped scratch directories --------------------------------------

_SCRATCH: dict[str, str] = {}
_SCRATCH_ATEXIT = False


def scratch_dir(prefix: str) -> str:
    """Session-scoped scratch directory (ADVICE r06 #2): registry
    queries that need a disk store (sketch stores, streaming sink +
    checkpoint dirs) previously ``mkdtemp``'d per INVOCATION and never
    removed — the bench/driver loops invoke each query repeatedly, so
    /tmp accumulated parquet stores for the whole session. One live
    scratch dir per prefix: minting the next invocation's dir removes
    the previous one (queries run serially per session — the same
    property that makes next-entry :func:`release_transient` safe, and
    the prior invocation's result was collected before the next query
    started), and an ``atexit`` hook removes whatever is live when the
    interpreter exits."""
    global _SCRATCH_ATEXIT
    import atexit
    import shutil
    import tempfile

    old = _SCRATCH.pop(prefix, None)
    if old is not None:
        shutil.rmtree(old, ignore_errors=True)
    path = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH[prefix] = path
    if not _SCRATCH_ATEXIT:
        atexit.register(_cleanup_scratch)
        _SCRATCH_ATEXIT = True
    return path


def _cleanup_scratch() -> None:
    import shutil

    while _SCRATCH:
        _, path = _SCRATCH.popitem()
        shutil.rmtree(path, ignore_errors=True)
