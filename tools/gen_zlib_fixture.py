#!/usr/bin/env python
"""Regenerate the content-addressed zlib fixture used by the
compression_ratio oracle.

DuckDB has no zlib, so the oracle reads precomputed compressed sizes
from a parquet fixture keyed by md5(text) — content-addressed, so it is
valid for any SF whose documents it covers and silently-stale entries
are impossible (a changed text changes its key; the oracle's inner join
then drops rows and the row-count check fails loudly).

Run after any testdata regeneration:  python tools/gen_zlib_fixture.py
"""

from __future__ import annotations

import hashlib
import os
import zlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "zlib_by_md5.parquet")

#: Must match the level in operators/behavior.py::_cr_kernel.
ZLIB_LEVEL = 6


def build_rows() -> dict[str, int]:
    rows: dict[str, int] = {}
    con = duckdb.connect()
    for sf in SF_DIRS:
        for (text,) in con.execute(
            f"SELECT text FROM '{sf}/documents.parquet'"
        ).fetchall():
            raw = text.encode("utf-8")
            key = hashlib.md5(raw).hexdigest()
            if key not in rows:
                rows[key] = len(zlib.compress(raw, ZLIB_LEVEL))
    return rows


def main() -> None:
    rows = build_rows()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    keys = sorted(rows)
    pq.write_table(
        pa.table(
            {
                "text_md5": pa.array(keys, pa.string()),
                "n_compressed": pa.array([rows[k] for k in keys], pa.int32()),
            }
        ),
        OUT,
    )
    print(f"wrote {len(keys)} unique docs -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
