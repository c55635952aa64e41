"""Real-bytes image decode: a genuine pure-Python BMP codec behind the
multimodal plumbing.

Every other multimodal stage fakes the decode (md5/length over the raw
payload — ``binary_ops._make_decode_stub``) because the container has no
PIL/ffmpeg. This module retires that stub for ONE payload class: 24-bit
uncompressed BMP (BITMAPINFOHEADER), which is fully decodable with
``struct`` alone. The pipeline is two Arrow-batched ``mapInPandas``
stages:

  1. ``encode_bmp_payload`` — synthesize a real BMP file per document:
     a BMP_W x BMP_H image whose gray level at pixel p is the
     nearest-neighbor sample of the document's UTF-8 bytes
     (``byte[(p * len) // (W*H)]``), stored as BGR = (g, g+1, g+2).
     The writer emits honest BMP structure: 14-byte file header,
     40-byte DIB header, BOTTOM-UP pixel rows, and 4-byte row padding
     (BMP_W = 5 -> 15 data bytes padded to 16 per row, so a decoder
     that ignores stride reads garbage).
  2. ``decode_bmp_rows`` — parse the header with ``struct.unpack``
     (magic, pixel-array offset, width, height, bpp), walk the pixel
     array honoring stride and bottom-up row order, and emit per-row
     green-channel sums. Nothing is carried from the encode side except
     the bytes: width/height/offset all come out of the parsed header,
     and the green channel is g+1 — so a decoder that misreads the
     offset, stride, row order, or channel order produces different
     values and fails the oracle.

The DuckDB oracle knows nothing about BMP: it restates the pixel
arithmetic directly over ``documents.text`` (ascii of the sampled char,
+1 for the green channel), which is exactly what makes the decode
REAL — the only way Spark matches is by correctly parsing the file it
wrote. Reference analog: the Spark NLP annotate stage
(/root/reference/airflow/dags/tasks/tweets.py:53-54) — the reference's
one heavy-decode step, here made byte-genuine instead of simulated.

At 100 TB the same two-stage shape holds: payload synthesis is replaced
by reading real media bytes off the lake; the decode stage stays an
Arrow-batched, partition-parallel mapInPandas with no shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

BMP_W = 5  # odd width on purpose: 15 data bytes -> stride 16 (padding real)
BMP_H = 4
_N_PX = BMP_W * BMP_H

_FILE_HDR = "<2sIHHI"  # magic, file size, reserved x2, pixel offset
_DIB_HDR = "<IiiHHIIiiII"  # size, w, h, planes, bpp, comp, imgsize, ppm x2, colors x2


def bmp_encode(gray: bytes, width: int = BMP_W, height: int = BMP_H) -> bytes:
    """Serialize a gray-level array (row-major, top-down, len w*h) as a
    real 24-bit BI_RGB BMP: BGR pixel (g, g+1, g+2), bottom-up rows,
    stride padded to 4 bytes."""
    if len(gray) != width * height:
        raise ValueError(f"need {width * height} gray bytes, got {len(gray)}")
    stride = (width * 3 + 3) & ~3
    px = bytearray()
    for r in reversed(range(height)):  # BMP stores rows bottom-up
        row = bytearray()
        for c in range(width):
            g = gray[r * width + c]
            row += bytes((g, (g + 1) % 256, (g + 2) % 256))
        row += b"\x00" * (stride - len(row))
        px += row
    off = struct.calcsize(_FILE_HDR) + struct.calcsize(_DIB_HDR)
    hdr = struct.pack(_FILE_HDR, b"BM", off + len(px), 0, 0, off)
    dib = struct.pack(
        _DIB_HDR, 40, width, height, 1, 24, 0, len(px), 2835, 2835, 0, 0
    )
    return bytes(hdr + dib + px)


def bmp_decode(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Parse a 24-bit uncompressed BMP: returns (width, height, rows)
    with rows top-down and each pixel a (b, g, r) tuple. Only header
    fields drive the walk — offset, dimensions, stride, and the
    negative-height top-down convention are all honored."""
    magic, _size, _r1, _r2, off = struct.unpack_from(_FILE_HDR, payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _dib, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB supported, got bpp={bpp}")
    stride = (w * 3 + 3) & ~3
    habs, top_down = abs(h), h < 0
    rows = []
    for rr in range(habs):
        src = rr if top_down else habs - 1 - rr
        base = off + src * stride
        rows.append(
            [tuple(payload[base + 3 * c : base + 3 * c + 3]) for c in range(w)]
        )
    return w, habs, rows


def encode_bmp_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stage 1: per document, nearest-neighbor-sample the UTF-8 bytes to
    BMP_W x BMP_H gray levels and write a genuine BMP file into a binary
    column. Arrow-batched, partition-parallel, no shuffle."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for txt in pdf[text_col]:
                # CORPUS PRECONDITION (fails loudly, never silently
                # diverges): the DuckDB oracle samples CHARACTERS
                # (substring/ascii) while this side samples UTF-8
                # BYTES — identical only for ASCII text; and an empty
                # doc has no byte to sample. A corpus change that
                # emits non-ASCII or empty docs must error here, not
                # hash-mismatch downstream.
                if not txt:
                    raise ValueError(
                        "encode_bmp_payload: empty document text — the "
                        "BMP row's corpus precondition (non-empty ASCII "
                        "docs) no longer holds"
                    )
                if not txt.isascii():
                    raise ValueError(
                        "encode_bmp_payload: non-ASCII document text — "
                        "byte sampling would diverge from the oracle's "
                        "character sampling"
                    )
                b = txt.encode("utf-8")
                gray = bytes(b[(p * len(b)) // _N_PX] for p in range(_N_PX))
                out.append(bmp_encode(gray))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "bmp": out})

    return df.select("doc_id", text_col).mapInPandas(encode, "doc_id long, bmp binary")


def decode_bmp_rows(df: DataFrame) -> DataFrame:
    """Stage 2: parse each BMP payload and emit one row per image row
    with the parsed width/height and the green-channel sum across that
    row's real pixels. All values derive from the parsed file."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, row_idx, ws, hs, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bmp"]):
                w, h, rows = bmp_decode(bytes(payload))
                for r, pixels in enumerate(rows):
                    ids.append(doc_id)
                    row_idx.append(r)
                    ws.append(w)
                    hs.append(h)
                    sums.append(sum(px[1] for px in pixels))  # green channel
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "row_idx": pd.Series(row_idx, dtype="int32"),
                    "w": pd.Series(ws, dtype="int32"),
                    "h": pd.Series(hs, dtype="int32"),
                    "row_g_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(
        decode, "doc_id long, row_idx int, w int, h int, row_g_sum bigint"
    )


RESIZE_OUT_W = 2
RESIZE_OUT_H = 2


def decode_bmp_resize(
    df: DataFrame, out_w: int = RESIZE_OUT_W, out_h: int = RESIZE_OUT_H
) -> DataFrame:
    """Stage 2 (resize variant): parse each BMP payload and
    nearest-neighbor-resize over the DECODED pixels — source pixel for
    output (r, c) is ((r*h)//out_h, (c*w)//out_w) of the parsed image,
    gray taken from the BLUE channel (the encoder's base level). The
    resize consumes only decoded pixel values and parsed dimensions, so
    a decoder that misreads stride/row-order/channels resizes the wrong
    image and fails the oracle. One row per (doc_id, out_r, out_c)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rr, cc, px = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bmp"]):
                w, h, rows = bmp_decode(bytes(payload))
                for r in range(out_h):
                    for c in range(out_w):
                        ids.append(doc_id)
                        rr.append(r)
                        cc.append(c)
                        px.append(rows[(r * h) // out_h][(c * w) // out_w][0])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "out_r": pd.Series(rr, dtype="int32"),
                    "out_c": pd.Series(cc, dtype="int32"),
                    "pixel": pd.Series(px, dtype="int32"),
                }
            )

    return df.mapInPandas(
        decode, "doc_id long, out_r int, out_c int, pixel int"
    )
