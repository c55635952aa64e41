"""Real-bytes VIDEO decode: a genuine YUV4MPEG2 (.y4m) codec — the
third media class off the byte-stub (after BMP and WAV), retiring the
fake decode for the frame-sampling row.

Y4M is a real, standard video container (ffmpeg/mpv play it): an ASCII
stream header ``YUV4MPEG2 W<w> H<h> F<n>:<d> ...\\n``, then per frame a
``FRAME[ params]\\n`` marker followed by raw planar YUV. This module
writes C444 (full-resolution U/V planes) and parses it back with the
header driving everything — a decoder that assumes dimensions, skips
the frame markers, or miscounts plane sizes reads garbage.

Two Arrow-batched ``mapInPandas`` stages, same shape as bmp.py/wav.py:

  1. ``encode_y4m_payload`` — per document, synthesize N_FRAMES frames
     of VID_W x VID_H: the Y plane at frame f, pixel p nearest-neighbor
     samples the UTF-8 bytes over the WHOLE video's pixel space
     (``byte[((f*wh + p) * len) // (N_FRAMES*wh)]``); U and V derive
     from Y as (y+1)%256 / (y+2)%256 — so plane ORDER matters and a
     decoder reading the wrong plane fails the oracle.
  2. ``decode_y4m_frames`` — parse the stream header (W/H/C tokens),
     walk the frame markers, slice the three planes by the PARSED
     geometry, and emit every FRAME_STRIDE-th frame's Y-plane sum —
     frame sampling over genuinely decoded video.

The DuckDB oracle restates only the byte arithmetic over
``documents.text``. CORPUS PRECONDITION: non-empty ASCII text
(asserted in the encoder, same discipline as the BMP/WAV rows).
Reference analog: the annotate stage's heavy decode
(/root/reference/airflow/dags/tasks/tweets.py:53-54).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

VID_W = 5
VID_H = 4
N_FRAMES = 4
FRAME_STRIDE = 2  # sample frames 0 and 2


def y4m_encode(
    y_frames: list[bytes], width: int = VID_W, height: int = VID_H
) -> bytes:
    """Serialize per-frame Y planes as a real YUV4MPEG2 C444 stream;
    U/V planes derive from Y ((y+1)%256, (y+2)%256)."""
    wh = width * height
    out = bytearray(f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C444\n".encode())
    for y in y_frames:
        if len(y) != wh:
            raise ValueError(f"need {wh} Y bytes per frame, got {len(y)}")
        out += b"FRAME\n"
        out += y
        out += bytes((b + 1) % 256 for b in y)  # U
        out += bytes((b + 2) % 256 for b in y)  # V
    return bytes(out)


def y4m_decode(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a C444 YUV4MPEG2 stream: returns (width, height,
    [Y plane per frame]). The header's W/H/C tokens drive the walk;
    frame markers are validated; rejects non-Y4M and non-C444."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    colorspace = "C420"  # Y4M default when the C tag is absent
    for tok in payload[:nl].split(b" ")[1:]:
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C"):
            colorspace = tok.decode()
    if w is None or h is None:
        raise ValueError("missing W/H in stream header")
    if colorspace != "C444":
        raise NotImplementedError(f"only C444 supported, got {colorspace}")
    wh = w * h
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"bad frame marker at offset {pos}")
        pos = fnl + 1
        if pos + 3 * wh > len(payload):
            raise ValueError("truncated frame payload")
        frames.append(payload[pos : pos + wh])  # Y plane only
        pos += 3 * wh  # skip U and V
    return w, h, frames


def encode_y4m_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stage 1: per document, nearest-neighbor-sample the UTF-8 bytes
    into N_FRAMES Y planes and write a genuine .y4m stream into a
    binary column. Arrow-batched, partition-parallel, no shuffle."""
    wh = VID_W * VID_H
    total = N_FRAMES * wh

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for txt in pdf[text_col]:
                if not txt:
                    raise ValueError(
                        "encode_y4m_payload: empty document text — the "
                        "corpus precondition (non-empty ASCII) no longer holds"
                    )
                if not txt.isascii():
                    raise ValueError(
                        "encode_y4m_payload: non-ASCII document text — "
                        "byte sampling would diverge from the oracle's "
                        "character sampling"
                    )
                b = txt.encode("utf-8")
                frames = [
                    bytes(
                        b[((f * wh + p) * len(b)) // total] for p in range(wh)
                    )
                    for f in range(N_FRAMES)
                ]
                out.append(y4m_encode(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "y4m": out})

    return df.select("doc_id", text_col).mapInPandas(encode, "doc_id long, y4m binary")


def decode_y4m_frames(df: DataFrame) -> DataFrame:
    """Stage 2: parse each .y4m stream and emit every FRAME_STRIDE-th
    frame's Y-plane sum with the parsed geometry — frame sampling over
    DECODED video. All values derive from the parsed stream."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fno, ws, hs, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["y4m"]):
                w, h, frames = y4m_decode(bytes(payload))
                for f in range(0, len(frames), FRAME_STRIDE):
                    ids.append(doc_id)
                    fno.append(f)
                    ws.append(w)
                    hs.append(h)
                    sums.append(sum(frames[f]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": pd.Series(fno, dtype="int32"),
                    "w": pd.Series(ws, dtype="int32"),
                    "h": pd.Series(hs, dtype="int32"),
                    "y_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(
        decode, "doc_id long, frame_no int, w int, h int, y_sum bigint"
    )


def decode_y4m_scene_cuts(df: DataFrame, cut_min_delta: int) -> DataFrame:
    """Per consecutive decoded frame pair, the sum of absolute Y-plane
    pixel differences (the classic scene-cut detector signal) and the
    cut flag — all values derive from the PARSED stream: header
    geometry, FRAME-marker walk, Y-plane slices."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fno, ws, hs, deltas = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["y4m"]):
                w, h, frames = y4m_decode(bytes(payload))
                for f in range(len(frames) - 1):
                    a, b = frames[f], frames[f + 1]
                    ids.append(doc_id)
                    fno.append(f)
                    ws.append(w)
                    hs.append(h)
                    deltas.append(sum(abs(x - y) for x, y in zip(b, a)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": pd.Series(fno, dtype="int32"),
                    "w": pd.Series(ws, dtype="int32"),
                    "h": pd.Series(hs, dtype="int32"),
                    "frame_delta": pd.Series(deltas, dtype="int64"),
                }
            )

    out = df.mapInPandas(
        decode, "doc_id long, frame_no int, w int, h int, frame_delta bigint"
    )
    from pyspark.sql import functions as F

    return out.withColumn("is_cut", F.col("frame_delta") > cut_min_delta)
