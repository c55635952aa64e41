"""Multimodal query entries: binary-column metadata extraction through
the real mapInPandas plumbing, oracle-checked against plain SQL (the
fake-decode features are all SQL-expressible by construction —
octet_length / ascii / md5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..multimodal.binary_ops import attach_binary_payload, extract_binary_meta
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
