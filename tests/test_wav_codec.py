"""Pure-Python WAV (RIFF) codec behind multimodal_decode_wav: honest
file structure (chunk walk, even-offset padding, signed little-endian
int16), malformed rejection. No Spark needed except the plumbing test."""

from __future__ import annotations

import struct

import pytest

from dend_covid19_spark.multimodal.wav import (
    N_SAMP,
    RATE,
    wav_decode,
    wav_encode,
)

_SAMPLES = [(7 * i + 3) * 97 - 12000 for i in range(N_SAMP)]  # mixed signs


def test_roundtrip_preserves_samples_and_rate():
    rate, samples = wav_decode(wav_encode(_SAMPLES))
    assert rate == RATE
    assert samples == _SAMPLES


def test_chunk_walk_is_real():
    """The encoder plants an odd-sized LIST chunk between fmt and data,
    so data does NOT sit at the canonical offset 44 — and RIFF pads odd
    chunks to even offsets. Verify the layout itself: a fixed-offset-44
    reader would misparse, and every chunk starts on an even offset."""
    payload = wav_encode(_SAMPLES)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    # canonical layout would put b"data" at 36; it must NOT be there
    assert payload[36:40] == b"fmt " or payload[36:40] != b"data"
    offsets = []
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        offsets.append((tag, pos, size))
        pos += 8 + size + (size % 2)
    tags = [t for t, _, _ in offsets]
    assert tags == [b"fmt ", b"LIST", b"data"]
    assert all(off % 2 == 0 for _, off, _ in offsets)
    list_size = next(s for t, _, s in offsets if t == b"LIST")
    assert list_size % 2 == 1  # the pad byte is genuinely exercised


def test_signed_samples_survive():
    """Negative levels must round-trip: an unsigned-unpacking decoder
    would return 65536 + s instead."""
    neg = [-32768, -1, 0, 1, 32767, -256, 256, -12345]
    assert wav_decode(wav_encode(neg))[1] == neg


def test_rejects_malformed():
    with pytest.raises(ValueError):
        wav_decode(b"OggS" + b"\x00" * 40)  # not RIFF
    payload = bytearray(wav_encode(_SAMPLES))
    payload[8:12] = b"AVI "  # RIFF but not WAVE
    with pytest.raises(ValueError):
        wav_decode(bytes(payload))
    # stereo fmt must be rejected (decoder validates, not assumes)
    payload = bytearray(wav_encode(_SAMPLES))
    struct.pack_into("<H", payload, 12 + 8 + 2, 2)  # channels=2 in fmt body
    with pytest.raises(NotImplementedError):
        wav_decode(bytes(payload))
    with pytest.raises(ValueError):
        wav_encode([40000])  # outside int16


def test_spark_stages_resample(spark):
    """Plumbing: encode stage emits parseable WAVs through Arrow; the
    decode stage's resampled values equal the direct byte arithmetic."""
    from dend_covid19_spark.multimodal.wav import (
        decode_wav_resample,
        encode_wav_payload,
    )

    texts = {1: "hello world this is a doc", 2: "abc"}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    enc = encode_wav_payload(df)
    payloads = {r.doc_id: bytes(r.wav) for r in enc.collect()}
    assert all(p[:4] == b"RIFF" for p in payloads.values())
    out = decode_wav_resample(enc).collect()
    assert {(r.sample_rate, r.n_samples) for r in out} == {(RATE, N_SAMP)}
    assert len(out) == len(texts) * (N_SAMP // 2)
    for r in out:
        b = texts[r.doc_id].encode()
        s = [(b[(p * len(b)) // N_SAMP] - 96) * 256 for p in range(N_SAMP)]
        assert r.resampled == (s[2 * r.out_idx] + s[2 * r.out_idx + 1]) // 2


def test_encoder_asserts_corpus_precondition(spark):
    from dend_covid19_spark.multimodal.wav import encode_wav_payload

    bad = spark.createDataFrame([(1, "héllo")], "doc_id long, text string")
    with pytest.raises(Exception, match="non-ASCII"):
        encode_wav_payload(bad).collect()
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(Exception, match="empty document"):
        encode_wav_payload(empty).collect()
