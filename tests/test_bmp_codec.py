"""Pure-Python BMP codec behind multimodal_decode_bmp: honest file
structure (padding, bottom-up rows, channel order, header-driven walk).
No Spark needed except the one plumbing test."""

from __future__ import annotations

import struct

import pytest

from dend_covid19_spark.multimodal.bmp import (
    BMP_H,
    BMP_W,
    bmp_decode,
    bmp_encode,
)


def _gray(n: int) -> bytes:
    return bytes((7 * i + 3) % 128 for i in range(n))


def test_roundtrip_preserves_pixels_and_dims():
    gray = _gray(BMP_W * BMP_H)
    payload = bmp_encode(gray)
    w, h, rows = bmp_decode(payload)
    assert (w, h) == (BMP_W, BMP_H)
    for r in range(h):
        for c in range(w):
            g = gray[r * BMP_W + c]
            assert rows[r][c] == (g, (g + 1) % 256, (g + 2) % 256)


def test_stride_padding_is_real():
    """BMP_W=5 -> 15 data bytes padded to 16 per row; a decoder that
    ignored stride would misalign every row after the first. Verify the
    file layout itself: pixel array length = stride * height, and the
    padding byte positions are zero."""
    payload = bmp_encode(_gray(BMP_W * BMP_H))
    off = struct.unpack_from("<2sIHHI", payload, 0)[4]
    stride = (BMP_W * 3 + 3) & ~3
    assert stride == 16 and stride != BMP_W * 3
    assert len(payload) - off == stride * BMP_H
    for r in range(BMP_H):
        pad = payload[off + r * stride + BMP_W * 3 : off + (r + 1) * stride]
        assert pad == b"\x00"


def test_rows_stored_bottom_up():
    """The FIRST stored row must be the LAST logical row — read raw
    bytes at the pixel offset and compare against the decoded top row."""
    gray = _gray(BMP_W * BMP_H)
    payload = bmp_encode(gray)
    off = struct.unpack_from("<2sIHHI", payload, 0)[4]
    first_stored_px = tuple(payload[off : off + 3])
    g_last_row = gray[(BMP_H - 1) * BMP_W]
    assert first_stored_px == (g_last_row, g_last_row + 1, g_last_row + 2)
    _, _, rows = bmp_decode(payload)
    assert rows[BMP_H - 1][0][0] == g_last_row


def test_negative_height_top_down_convention():
    """h < 0 means rows stored top-down; the decoder must honor it."""
    gray = _gray(BMP_W * BMP_H)
    payload = bytearray(bmp_encode(gray))
    # flip height sign AND re-order rows so logical content is unchanged
    off = struct.unpack_from("<2sIHHI", payload, 0)[4]
    stride = (BMP_W * 3 + 3) & ~3
    body = bytes(payload[off:])
    flipped = b"".join(
        body[r * stride : (r + 1) * stride] for r in reversed(range(BMP_H))
    )
    struct.pack_into("<i", payload, 14 + 8, -BMP_H)
    payload[off:] = flipped
    w, h, rows = bmp_decode(bytes(payload))
    assert (w, h) == (BMP_W, BMP_H)
    assert rows[0][0][0] == gray[0]


def test_rejects_non_bmp_and_unsupported_bpp():
    with pytest.raises(ValueError):
        bmp_decode(b"PNG" + b"\x00" * 60)
    payload = bytearray(bmp_encode(_gray(BMP_W * BMP_H)))
    struct.pack_into("<H", payload, 14 + 14, 8)  # bpp=8 (palette) unsupported
    with pytest.raises(NotImplementedError):
        bmp_decode(bytes(payload))
    with pytest.raises(ValueError):
        bmp_encode(b"\x01\x02")  # wrong pixel count


def test_spark_stages_roundtrip(spark):
    """Plumbing: encode stage emits parseable BMPs through Arrow; decode
    stage's green sums equal the direct pixel arithmetic."""
    from dend_covid19_spark.multimodal.bmp import (
        decode_bmp_rows,
        encode_bmp_payload,
    )

    df = spark.createDataFrame(
        [(1, "hello world this is a doc"), (2, "abc")], "doc_id long, text string"
    )
    enc = encode_bmp_payload(df)
    rows = {r.doc_id: bytes(r.bmp) for r in enc.collect()}
    assert all(p[:2] == b"BM" for p in rows.values())
    out = decode_bmp_rows(enc).collect()
    assert {(r.w, r.h) for r in out} == {(BMP_W, BMP_H)}
    n_px = BMP_W * BMP_H
    for r in out:
        b = {1: b"hello world this is a doc", 2: b"abc"}[r.doc_id]
        expect = sum(
            b[((r.row_idx * BMP_W + c) * len(b)) // n_px] + 1 for c in range(BMP_W)
        )
        assert r.row_g_sum == expect


def test_resize_over_decoded_pixels(spark):
    """decode_bmp_resize must source each output pixel from the DECODED
    grid: verify against direct arithmetic on the text bytes."""
    from dend_covid19_spark.multimodal.bmp import (
        RESIZE_OUT_H,
        RESIZE_OUT_W,
        decode_bmp_resize,
        encode_bmp_payload,
    )

    texts = {1: "hello world this is a doc", 2: "abcd"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = decode_bmp_resize(encode_bmp_payload(df)).collect()
    assert len(out) == len(texts) * RESIZE_OUT_W * RESIZE_OUT_H
    n_px = BMP_W * BMP_H
    for r in out:
        b = texts[r.doc_id].encode()
        src_r = (r.out_r * BMP_H) // RESIZE_OUT_H
        src_c = (r.out_c * BMP_W) // RESIZE_OUT_W
        assert r.pixel == b[((src_r * BMP_W + src_c) * len(b)) // n_px]
