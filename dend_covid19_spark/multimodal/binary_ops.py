"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's stance for image/audio/video at 100 TB: store payloads as
``binary`` columns (or object-store URIs) beside typed metadata columns;
run decode / feature-extraction as Arrow-batched ``mapInPandas`` stages so
Python sees columnar batches, never rows.

The decode step itself is STUBBED here — the container has no
image/audio libraries — but everything Spark-side is real and tested:
schema handling, batch iteration, partition-preserving mapInPandas, and
deterministic fallback features. Swap ``_decode_stub`` for a real decoder
(PIL/librosa/ffmpeg) without touching the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, byte_len long, first_byte int, content_md5 string"
)


def _make_decode_stub():
    """Build the deterministic fake 'decode' used where a real media
    decoder would run. Built as a factory returning a nested function so
    UDF closures capture it *by value* (cloudpickle) — executors never
    need to import this package. Raises NotImplementedError for payloads
    we can't fake (where PIL/librosa/ffmpeg would be required)."""
    import hashlib

    def decode(payload: bytes) -> dict:
        if payload is None:
            raise NotImplementedError(
                "real media decode requires PIL/librosa/ffmpeg"
            )
        return {
            "byte_len": len(payload),
            "first_byte": payload[0] if payload else -1,
            "content_md5": hashlib.md5(payload).hexdigest(),
        }

    return decode


_decode_stub = _make_decode_stub()  # module-level handle for unit tests


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal payload: the UTF-8 bytes of ``text_col`` as an
    opaque binary column (stand-in for image/audio bytes)."""
    return df.withColumn("payload", F.col(text_col).cast("binary"))


def extract_binary_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    ``mapInPandas`` receives an iterator of pandas batches (no per-row
    Python overhead); output schema is declared so Catalyst plans the
    downstream without re-inference. At scale: partition-parallel, no
    shuffle, memory bounded by the Arrow batch size.
    """

    decode = _make_decode_stub()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": metas.map(lambda m: m["byte_len"]).astype("int64"),
                    "first_byte": metas.map(lambda m: m["first_byte"]).astype("int32"),
                    "content_md5": metas.map(lambda m: m["content_md5"]),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(extract, META_SCHEMA)
