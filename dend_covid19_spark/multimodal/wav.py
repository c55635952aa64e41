"""Real-bytes audio decode: a genuine pure-Python WAV (RIFF) codec —
the second media class to retire the byte-stub decoder (after BMP,
multimodal/bmp.py).

Two Arrow-batched ``mapInPandas`` stages, same shape as the BMP row:

  1. ``encode_wav_payload`` — synthesize a real WAV file per document:
     N_SAMP signed 16-bit PCM mono samples at RATE Hz, where sample p
     nearest-neighbor-samples the document's UTF-8 bytes
     (``byte[(p * len) // N_SAMP]``) and maps it to the signed level
     ``(b - 96) * 256`` (negative for most ASCII — the signed int16
     round trip is exercised, an unsigned-unpacking decoder diverges).
     The writer emits honest RIFF structure: ``RIFF`` size header,
     ``WAVE`` form, a ``fmt `` chunk (PCM, mono, 16-bit, RATE), and —
     deliberately — an ODD-sized ``LIST`` metadata chunk between fmt
     and data. RIFF requires chunks to start on even offsets (odd
     payloads get a pad byte), so a decoder that assumes the canonical
     44-byte layout, skips chunk-walking, or ignores pad alignment
     reads garbage.
  2. ``decode_wav_resample`` — parse the RIFF/WAVE headers with
     ``struct``, WALK the chunk list honoring even-alignment to locate
     ``fmt `` and ``data``, validate PCM/mono/16-bit, unpack the
     little-endian int16 samples, then RESAMPLE over the DECODED
     samples: each output value averages two consecutive samples
     (2:1 downsample). Levels are multiples of 256, so pair averages
     are integer-exact — engine-portable with no floor ambiguity.

The DuckDB oracle knows nothing about RIFF: it restates the sample
arithmetic directly over ``documents.text`` (``(ascii(char_2j) +
ascii(char_2j1) - 192) * 128``), so Spark matches only by correctly
parsing the file it wrote. Reference analog: the Spark NLP annotate
stage's heavy decode (/root/reference/airflow/dags/tasks/tweets.py:53-54).

CORPUS PRECONDITION (asserted, like the BMP row): non-empty ASCII-only
text — byte sampling equals the oracle's character sampling only then.

At 100 TB: payload synthesis becomes reading real audio bytes off the
lake; the decode/resample stage stays an Arrow-batched,
partition-parallel mapInPandas with no shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RATE = 8000
N_SAMP = 8  # even: the 2:1 resample consumes sample pairs exactly
_LIST_PAYLOAD = b"INFOmeta1"  # 9 bytes — ODD on purpose: pad byte is real


def wav_encode(samples: list[int], rate: int = RATE) -> bytes:
    """Serialize signed 16-bit PCM mono samples as a real RIFF/WAVE
    file: fmt chunk, an odd-sized LIST chunk (forcing pad-aware chunk
    walking), then the data chunk."""
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} outside int16 range")
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)  # PCM mono 16-bit
    data = struct.pack(f"<{len(samples)}h", *samples)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    body = b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"LIST", _LIST_PAYLOAD) + chunk(
        b"data", data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[int, list[int]]:
    """Parse a PCM WAV: returns (sample_rate, samples). Walks the RIFF
    chunk list honoring even-offset alignment; only header fields drive
    the walk. Rejects non-RIFF/WAVE payloads and non-PCM / non-mono /
    non-16-bit formats."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))
    pos = 12
    rate: int | None = None
    data: bytes | None = None
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_code != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM mono 16-bit supported, got fmt={fmt_code} "
                    f"ch={channels} bits={bits}"
                )
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks start on even offsets
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return rate, list(struct.unpack(f"<{len(data) // 2}h", data))


def encode_wav_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stage 1: per document, nearest-neighbor-sample the UTF-8 bytes to
    N_SAMP signed PCM levels and write a genuine WAV file into a binary
    column. Arrow-batched, partition-parallel, no shuffle."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for txt in pdf[text_col]:
                if not txt:
                    raise ValueError(
                        "encode_wav_payload: empty document text — the "
                        "WAV row's corpus precondition (non-empty ASCII "
                        "docs) no longer holds"
                    )
                if not txt.isascii():
                    raise ValueError(
                        "encode_wav_payload: non-ASCII document text — "
                        "byte sampling would diverge from the oracle's "
                        "character sampling"
                    )
                b = txt.encode("utf-8")
                samples = [
                    (b[(p * len(b)) // N_SAMP] - 96) * 256 for p in range(N_SAMP)
                ]
                out.append(wav_encode(samples))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "wav": out})

    return df.select("doc_id", text_col).mapInPandas(encode, "doc_id long, wav binary")


def decode_wav_resample(df: DataFrame) -> DataFrame:
    """Stage 2: parse each WAV payload (chunk walk, PCM validation,
    int16 unpack) and 2:1-downsample the DECODED samples — one row per
    output sample with the parsed rate and count. All values derive
    from the parsed file."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, rates, counts, vals = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["wav"]):
                rate, samples = wav_decode(bytes(payload))
                for j in range(len(samples) // 2):
                    ids.append(doc_id)
                    idxs.append(j)
                    rates.append(rate)
                    counts.append(len(samples))
                    vals.append((samples[2 * j] + samples[2 * j + 1]) // 2)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "out_idx": pd.Series(idxs, dtype="int32"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(counts, dtype="int32"),
                    "resampled": pd.Series(vals, dtype="int32"),
                }
            )

    return df.mapInPandas(
        decode,
        "doc_id long, out_idx int, sample_rate int, n_samples int, resampled int",
    )


FRAME = 4  # samples per analysis frame (N_SAMP = 8 -> 2 frames per doc)


def decode_wav_features(df: DataFrame) -> DataFrame:
    """Stage 2 (feature extraction): parse each WAV payload with the
    same chunk-walking decoder, frame the DECODED samples into
    FRAME-sample windows, and emit the classic integer-exact audio
    features per frame — energy (sum of squared samples), zero-crossing
    count (strict sign changes between consecutive samples), and peak
    amplitude. All three are integer arithmetic over int16 levels, so
    the values are engine-portable with no float accumulation."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, ssq, zc, pk = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["wav"]):
                _rate, samples = wav_decode(bytes(payload))
                for f in range(len(samples) // FRAME):
                    w = samples[FRAME * f : FRAME * (f + 1)]
                    ids.append(doc_id)
                    fidx.append(f)
                    ssq.append(sum(x * x for x in w))
                    zc.append(
                        sum(1 for i in range(1, FRAME) if w[i - 1] * w[i] < 0)
                    )
                    pk.append(max(abs(x) for x in w))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "sum_sq": pd.Series(ssq, dtype="int64"),
                    "zero_crossings": pd.Series(zc, dtype="int32"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return df.mapInPandas(
        feats,
        "doc_id long, frame_idx int, sum_sq long, zero_crossings int, peak int",
    )
