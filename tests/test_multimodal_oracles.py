"""Pins for the multimodal oracle precondition and the stubbed decoder.

The media_features / media_resize / frame_sample oracles all rely on
the corpus being pure ASCII (byte k == code point of character k, so
DuckDB string functions mirror Spark's byte-level kernels exactly).
Pin that property so a testdata regeneration that breaks it fails HERE
with a clear message instead of as an opaque oracle mismatch.
"""

import duckdb
import pytest

from psd_project_spark.operators.multimodal import _decode_media
from tests.conftest import SF_DIR, SF_DIR_MID


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MID])
def test_corpus_is_pure_ascii(sf_dir):
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE octet_length(encode(text)) != length(text)"
    ).fetchone()[0]
    assert n == 0, (
        f"{n} non-ASCII documents in {sf_dir}: the media_* oracles' "
        "char==byte equivalence no longer holds — revisit them"
    )


def test_decoder_stub_contract():
    assert _decode_media(b"abc") == b"abc"
    with pytest.raises(NotImplementedError):
        _decode_media(b"abc", codec="jpeg")
