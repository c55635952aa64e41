"""Multimodal query entries: binary-column metadata extraction through
the real mapInPandas plumbing, oracle-checked against plain SQL (the
fake-decode features are all SQL-expressible by construction —
octet_length / ascii / md5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..multimodal.binary_ops import (
    FRAME_BYTES,
    FRAME_STRIDE,
    HIST_BINS,
    RESIZE_W,
    attach_binary_payload,
    dispatch_modalities,
    extract_binary_meta,
    extract_byte_histogram,
    resize_payload,
    sample_frames,
)
from .registry import query


@query(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(ascii(substring(text, 1, 1)) AS INT) AS first_byte,
       md5(text) AS content_md5
FROM documents
""",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed metadata via Arrow-batched mapInPandas.

    The payload is the UTF-8 text bytes standing in for media bytes; the
    'decode' emits byte length, first byte, and content digest — each
    SQL-checkable, so this verifies the whole multimodal plumbing path
    (binary cast -> Arrow batches -> Python -> declared schema) exactly.
    ASCII-only corpus makes ascii(first char) == first byte.
    """
    docs = load_table(spark, "documents", sf_dir)
    return extract_binary_meta(attach_binary_payload(docs))


@query(
    "multimodal_resize",
    oracle=f"""
SELECT doc_id,
       CAST(i AS INT) AS px_idx,
       CAST(ascii(substring(text,
            CAST(1 + (i * octet_length(encode(text))) // {RESIZE_W} AS INT), 1)) AS INT) AS pixel
FROM documents CROSS JOIN (SELECT unnest(range(0, {RESIZE_W})) AS i) p
""",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 'resize' of the payload to a fixed 8-wide vector
    via mapInPandas (image-resize plumbing with the decoder stubbed as raw
    bytes). ASCII corpus makes byte i == ascii(char i), so the whole
    Arrow round-trip is value-checked in SQL. Surfaced one row per
    (doc_id, px_idx) — registry rule: no array output columns."""
    docs = load_table(spark, "documents", sf_dir)
    return resize_payload(attach_binary_payload(docs)).select(
        "doc_id", F.posexplode("pixels").alias("px_idx", "pixel")
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
SELECT doc_id,
       CAST(f AS INT) AS frame_no,
       md5(substring(text, CAST(f * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES})) AS frame_md5
FROM (
    SELECT doc_id, text,
           unnest(range(0, octet_length(encode(text)) // {FRAME_BYTES}, {FRAME_STRIDE})) AS f
    FROM documents
)
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped frame sampling: payload -> fixed 32-byte frames ->
    every 4th frame's digest, one output row per sampled frame (1->N
    fan-out inside mapInPandas). The md5-per-frame is SQL-checkable."""
    docs = load_table(spark, "documents", sf_dir)
    return sample_frames(attach_binary_payload(docs))


@query(
    "multimodal_modality_dispatch",
    oracle=f"""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       CASE doc_id % 3 WHEN 0 THEN 'byte_len' WHEN 1 THEN 'first_byte' ELSE 'n_frames' END AS feature,
       CAST(CASE doc_id % 3
            WHEN 0 THEN octet_length(encode(text))
            WHEN 1 THEN ascii(substring(text, 1, 1))
            ELSE octet_length(encode(text)) // {FRAME_BYTES} END AS BIGINT) AS feature_value
FROM documents
""",
)
def multimodal_modality_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-corpus routing: ONE mapInPandas stage dispatches each row to
    its modality's extractor (image/audio/video stand-ins) and emits a
    unified long-format feature frame — the shape that processes a
    heterogeneous 100 TB corpus in a single scan instead of one job per
    modality. Every branch's fake feature is SQL-expressible, so the
    whole dispatch path is value-checked."""
    docs = load_table(spark, "documents", sf_dir)
    return dispatch_modalities(attach_binary_payload(docs))


@query(
    "multimodal_byte_histogram",
    oracle=f"""
WITH bytes AS (
    SELECT doc_id,
           list_transform(range(1, octet_length(encode(text)) + 1),
               i -> ascii(substring(text, CAST(i AS INT), 1))) AS bs
    FROM documents
)
SELECT doc_id,
       CAST(b AS INT) AS bin,
       CAST(len(list_filter(bs, x -> x // 16 = b)) AS BIGINT) AS cnt
FROM bytes CROSS JOIN (SELECT unnest(range(0, {HIST_BINS})) AS b) bb
""",
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage: numpy bincount of payload byte values
    (>>4) per Arrow batch -> fixed 16-long feature vector, the slot a real
    embedding model occupies. Surfaced one row per (doc_id, bin) —
    registry rule: no array output columns."""
    docs = load_table(spark, "documents", sf_dir)
    return extract_byte_histogram(attach_binary_payload(docs)).select(
        "doc_id", F.posexplode("hist").alias("bin", "cnt")
    )
