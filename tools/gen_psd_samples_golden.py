#!/usr/bin/env python
"""Regenerate the golden VALUES table for the psd_samples_source
oracle (sources/python_ds_query.py). Pure function of the generator
code — run only after intentionally changing the sample model or the
chunk-seed contract."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from psd_project_spark.sources.python_datasource import _chunk_rows, _gen_chunk
from psd_project_spark.sources.python_ds_query import N, PARTS, SEED, _SERIES


def main() -> None:
    rows = []
    for p, (start, cnt) in enumerate(_chunk_rows(N, PARTS)):
        rows.extend(_gen_chunk(start, cnt, SEED, p))
    a = np.array([r[1:] for r in rows], dtype=np.float64)
    print("SELECT * FROM (VALUES")
    lines = []
    for i, nm in enumerate(_SERIES):
        v = a[:, i]
        q = np.floor(v * 1e12 + 0.5).astype(np.int64)
        lines.append(
            f"  ('{nm}', CAST({len(v)} AS BIGINT), CAST('{v.min()!r}' AS DOUBLE), "
            f"CAST('{v.max()!r}' AS DOUBLE), CAST({q.sum()} AS BIGINT))"
        )
    print(",\n".join(lines))
    print(") AS t(series, n, min_v, max_v, sum_q12)\nORDER BY series")


if __name__ == "__main__":
    main()
