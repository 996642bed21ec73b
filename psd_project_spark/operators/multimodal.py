"""Multimodal (binary) column operators — LLM-pipeline extension.

Images/audio/video are **opaque ``binary`` columns with typed
metadata**; all Spark-side plumbing here is real (schema, Arrow batch
transfer, ``mapInPandas`` signatures, partition-preserving plans) while
the actual media decode is STUBBED — the container has no image/audio
libraries, so the decoder falls back to a deterministic fake (clearly
marked below) and raises ``NotImplementedError`` if a real codec path
is requested.

The test corpus has no binary table, so ``media_catalog`` manufactures
one deterministically from ``documents`` (UTF-8 payload standing in
for encoded media; metadata derived from doc_id) — the point is the
column/typing/plumbing discipline, not the pixels.

Queries:

- ``media_catalog``  — binary payload + typed metadata projection;
  exact DuckDB oracle (encode/octet_length/md5 agree on blobs).
- ``media_features`` — Arrow-batched ``mapInPandas`` "decode +
  feature-extract" over the binary column. Deterministic fake decoder
  ⇒ reproducible output, but byte-level feature math is not
  SQL-expressible, so this entry has **no oracle** (driver records the
  weaker rows-only check, as the contract allows for such ops).
- ``frame_sample``   — fixed-stride "frame sampling": slices the
  payload into frame-sized chunks and emits every k-th chunk with its
  index + md5 — the exact plumbing a video pipeline needs (explode of
  per-frame rows, stable ordering), with byte-slicing standing in for
  codec frame extraction. Exact DuckDB oracle over blob slices.

Scale notes (100 TB of media): payloads stay in executor memory one
Arrow batch at a time (``mapInPandas`` streams batches; never collect);
metadata-only queries prune the payload column at the parquet scan
(check ``ReadSchema`` — that's why metadata lives in top-level columns,
not inside the blob). Feature extraction is embarrassingly parallel;
partitioning by source file keeps locality.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from psd_project_spark.sources.registry import load_table

#: Fake media geometry derived from doc_id (deterministic, oracle-able).
_W_MOD, _H_MOD = 640, 480

#: Frame sampling parameters: frame size in bytes, take every k-th frame.
FRAME_BYTES = 32
FRAME_STRIDE = 4


def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media table: opaque binary payload + typed metadata."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        (F.col("doc_id") % _W_MOD + 1).cast("int").alias("width"),
        (F.col("doc_id") % _H_MOD + 1).cast("int").alias("height"),
        F.md5(payload).alias("payload_md5"),
    )


MEDIA_CATALOG_ORACLE = f"""
SELECT doc_id,
  'image/fake' AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(doc_id % {_W_MOD} + 1 AS INT) AS width,
  CAST(doc_id % {_H_MOD} + 1 AS INT) AS height,
  md5(text) AS payload_md5
FROM documents
"""
# (DuckDB md5 only takes VARCHAR; it hashes the UTF-8 bytes, which are
# exactly the encode() payload Spark hashes.)


# --- media_features (mapInPandas, STUBBED decoder) ---------------------------

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
        StructField("payload_md5", StringType()),
    ]
)


def _decode_media(payload: bytes, codec: str = "fake") -> bytes:
    """STUB — media decode. The container ships no image/audio codecs.

    ``codec='fake'`` returns the payload unchanged (deterministic fake
    decode); any real codec raises until a decoder library is wired in.
    """
    if codec == "fake":
        return payload
    raise NotImplementedError(
        f"media codec {codec!r} requires an image/audio library that is "
        "not available in this environment; plug one in here."
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over the binary column."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = _decode_media(bytes(payload))
            rows.append(
                (
                    int(doc_id),
                    len(raw),
                    raw[0] if raw else None,
                    raw[-1] if raw else None,
                    int(sum(raw) % 997),
                    hashlib.md5(raw).hexdigest(),
                )
            )
        yield pd.DataFrame(
            rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
        )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return media.mapInPandas(_extract_features, schema=FEATURES_SCHEMA)


# The corpus is pure ASCII (pinned by tests/test_multimodal_oracles.py),
# so byte k of the payload == code point of character k and DuckDB can
# mirror the byte-level feature math exactly: ascii() for first/last
# byte, a per-character HOF sum for byte_sum_mod, md5 of the text for
# the payload hash. Integer-only — no float convention anywhere.
MEDIA_FEATURES_ORACLE = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CASE WHEN length(text) = 0 THEN NULL
       ELSE CAST(ascii(substring(text, 1, 1)) AS INT) END AS first_byte,
  CASE WHEN length(text) = 0 THEN NULL
       ELSE CAST(ascii(substring(text, length(text), 1)) AS INT) END AS last_byte,
  CAST(coalesce(list_sum(list_transform(generate_series(1, length(text)),
       i -> ascii(substring(text, i, 1)))), 0) % 997 AS BIGINT) AS byte_sum_mod,
  md5(text) AS payload_md5
FROM documents
"""


# --- frame_sample ------------------------------------------------------------

def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ``FRAME_STRIDE``-th ``FRAME_BYTES``-sized payload slice.

    Byte slicing stands in for codec frame extraction; the plumbing
    (per-frame explode with stable frame indexes, per-frame hashes) is
    the real thing. Pure JVM expressions — no Python.
    """
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("_payload")
    ).withColumn("_n_frames", F.ceil(F.octet_length("_payload") / F.lit(FRAME_BYTES)))
    frames = media.select(
        "doc_id",
        F.explode(
            # CASE guard (the BPE/chunking pattern): a zero-byte
            # payload would make sequence(0, -1, stride) THROW in
            # Spark, where the oracle's generate_series(0,-1) is
            # empty. Fixtures have no empty docs; latent otherwise.
            F.expr(
                f"CASE WHEN _n_frames >= 1 THEN "
                f"sequence(0, cast(_n_frames - 1 as int), {FRAME_STRIDE}) "
                f"ELSE cast(array() as array<int>) END"
            )
        ).alias("frame_idx"),
        F.col("_payload"),
    )
    chunk = F.expr(f"substring(_payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})")
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length(chunk).cast("long").alias("frame_bytes"),
        F.md5(chunk).alias("frame_md5"),
    )


# DuckDB substring/md5 only take VARCHAR; the corpus is pure ASCII
# (octet_length == length for every doc, all SFs), so character slices
# of ``text`` are byte-identical to Spark's binary payload slices.
FRAME_SAMPLE_ORACLE = f"""
WITH m AS (
  SELECT doc_id, text AS payload,
         CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames
  FROM documents
), f AS (
  SELECT doc_id, payload,
    CAST(unnest(generate_series(0, n_frames - 1, {FRAME_STRIDE})) AS INT) AS frame_idx
  FROM m
)
SELECT doc_id, frame_idx,
  CAST(octet_length(encode(substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}))) AS BIGINT) AS frame_bytes,
  md5(substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM f
"""


# --- media_resize ------------------------------------------------------------

#: Keep every RESIZE_STRIDE-th byte (the stand-in for a real
#: image/audio resample, which plugs into the same UDF).
RESIZE_STRIDE = 4

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("resized_bytes", LongType()),
        StructField("resized", BinaryType()),
        StructField("resized_md5", StringType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched binary→binary resample: numpy stride view, no
    per-byte Python. A real image resize (PIL/np.interp on decoded
    pixels) drops into this exact signature — batch in, batch out,
    opaque bytes both ways."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            small = np.frombuffer(raw, dtype=np.uint8)[::RESIZE_STRIDE].tobytes()
            rows.append(
                (
                    int(doc_id),
                    len(raw),
                    len(small),
                    small,
                    hashlib.md5(small).hexdigest(),
                )
            )
        yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])


def media_resize_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full binary→binary form (includes the resized payload column) —
    the shape a downstream consumer reads. Not the registry entry:
    pandas-side value comparison cannot sort/hash raw byte columns
    (bytearray is unhashable), so the driver-facing projection below
    drops the payload and keeps its exact witnesses (length + md5).
    Exercised by tests/test_multimodal_oracles.py local recompute."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return media.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every payload to every 4th byte — the resize/resample
    slot of the multimodal pipeline (SURVEY.md §7 M5). The Spark
    plumbing (binary column in, binary column + size/hash metadata out,
    Arrow batches, partition-parallel) is real; the kernel is the
    deterministic byte-stride stand-in since this container ships no
    codecs. The registry projection carries the resized payload's exact
    witnesses (byte count + md5) rather than the raw bytes — see
    :func:`media_resize_binary`."""
    return media_resize_binary(spark, sf_dir).select(
        "doc_id", "orig_bytes", "resized_bytes", "resized_md5"
    )


# ASCII corpus ⇒ "every RESIZE_STRIDE-th byte" == every RESIZE_STRIDE-th
# character: rebuild the downsampled string with a step-ped
# generate_series and hash/measure it exactly as the kernel does.
MEDIA_RESIZE_ORACLE = f"""
WITH r AS (
  SELECT doc_id, octet_length(encode(text)) AS orig_bytes,
    array_to_string(list_transform(
      generate_series(1, length(text), {RESIZE_STRIDE}),
      i -> substring(text, i, 1)), '') AS resized_str
  FROM documents
)
SELECT doc_id,
  CAST(orig_bytes AS BIGINT) AS orig_bytes,
  CAST(octet_length(encode(resized_str)) AS BIGINT) AS resized_bytes,
  md5(resized_str) AS resized_md5
FROM r
"""


QUERIES = {
    "media_catalog": (media_catalog, MEDIA_CATALOG_ORACLE),
    "media_features": (media_features, MEDIA_FEATURES_ORACLE),
    "media_resize": (media_resize, MEDIA_RESIZE_ORACLE),
    "frame_sample": (frame_sample, FRAME_SAMPLE_ORACLE),
}
