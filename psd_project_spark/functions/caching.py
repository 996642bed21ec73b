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
