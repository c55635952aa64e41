"""Pure-Python YUV4MPEG2 codec behind multimodal_frame_sample_decoded:
header-driven geometry, frame-marker walk, plane order, malformed
rejection. No Spark needed except the plumbing test."""

from __future__ import annotations

import pytest

from dend_covid19_spark.multimodal.y4m import (
    FRAME_STRIDE,
    N_FRAMES,
    VID_H,
    VID_W,
    y4m_decode,
    y4m_encode,
)

_WH = VID_W * VID_H
_FRAMES = [bytes((13 * f + 7 * p + 3) % 200 for p in range(_WH)) for f in range(N_FRAMES)]


def test_roundtrip_preserves_frames_and_dims():
    w, h, frames = y4m_decode(y4m_encode(_FRAMES))
    assert (w, h) == (VID_W, VID_H)
    assert frames == _FRAMES


def test_header_drives_geometry():
    """A 3x2 stream must decode as 3x2 — the decoder may not assume the
    module constants."""
    small = [bytes(range(6)), bytes(range(6, 12))]
    w, h, frames = y4m_decode(y4m_encode(small, width=3, height=2))
    assert (w, h) == (3, 2)
    assert frames == small


def test_plane_order_is_real():
    """U and V derive from Y: byte-level check that the three planes
    sit in Y,U,V order after each FRAME marker — a decoder grabbing the
    wrong plane would return (y+1) or (y+2) sums."""
    payload = y4m_encode(_FRAMES[:1])
    nl = payload.find(b"\n")
    fnl = payload.find(b"\n", nl + 1)
    y = payload[fnl + 1 : fnl + 1 + _WH]
    u = payload[fnl + 1 + _WH : fnl + 1 + 2 * _WH]
    v = payload[fnl + 1 + 2 * _WH : fnl + 1 + 3 * _WH]
    assert y == _FRAMES[0]
    assert u == bytes((b + 1) % 256 for b in _FRAMES[0])
    assert v == bytes((b + 2) % 256 for b in _FRAMES[0])


def test_rejects_malformed():
    with pytest.raises(ValueError):
        y4m_decode(b"RIFF" + b"\x00" * 40)  # not Y4M
    good = y4m_encode(_FRAMES)
    with pytest.raises(ValueError):
        y4m_decode(good[: len(good) - 5])  # truncated frame payload
    # C420 (the Y4M default and common case) must be rejected, not
    # silently mis-sliced
    c420 = good.replace(b"C444", b"C420", 1)
    with pytest.raises(NotImplementedError):
        y4m_decode(c420)
    # a stream whose header lacks W is invalid
    no_w = good.replace(b" W5", b"", 1)
    with pytest.raises(ValueError):
        y4m_decode(no_w)
    with pytest.raises(ValueError):
        y4m_encode([b"\x00"])  # wrong plane size


def test_spark_stages_frame_sample(spark):
    from dend_covid19_spark.multimodal.y4m import (
        decode_y4m_frames,
        encode_y4m_payload,
    )

    texts = {1: "hello world this is a doc", 2: "abcd"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    enc = encode_y4m_payload(df)
    payloads = {r.doc_id: bytes(r.y4m) for r in enc.collect()}
    assert all(p.startswith(b"YUV4MPEG2") for p in payloads.values())
    out = decode_y4m_frames(enc).collect()
    sampled = list(range(0, N_FRAMES, FRAME_STRIDE))
    assert len(out) == len(texts) * len(sampled)
    total = N_FRAMES * _WH
    for r in out:
        b = texts[r.doc_id].encode()
        expect = sum(
            b[((r.frame_no * _WH + p) * len(b)) // total] for p in range(_WH)
        )
        assert (r.w, r.h, r.y_sum) == (VID_W, VID_H, expect)
