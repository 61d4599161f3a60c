"""From-scratch baseline JPEG codec (operators/jpeg.py, r5 verdict #7).

Strategy mirrors the PNG suite: the encoder twin writes spec-valid
baseline JPEGs from KNOWN quantized coefficients, so the decoder's
output is checked against an INDEPENDENT definition-based O(N⁴) IDCT —
the entropy layer (canonical Huffman, DC diffs, EOB/ZRL, byte
stuffing) and the transform (batched separable IDCT) are verified
separately. No Spark session needed: the codec is a pure numpy kernel;
the Spark plumbing is covered by the multimodal_jpeg_pixels contract
query.
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_pbf_parquet_spark.operators.jpeg import (
    FLAT_Q8,
    decode_jpeg,
    encode_jpeg_gray,
    idct_blocks,
)


def idct_ref(F: np.ndarray) -> np.ndarray:
    """Definition-based 2-D IDCT (T.81 A.3.3) — the slow truth."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * F[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[x, y] = s / 4
    return out


def reconstruct(blocks: np.ndarray, q=FLAT_Q8) -> np.ndarray:
    bh, bw = blocks.shape[:2]
    out = np.zeros((bh * 8, bw * 8))
    deq = blocks * np.asarray(q, dtype=np.int64)
    for i in range(bh):
        for j in range(bw):
            out[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = (
                idct_ref(deq[i, j]) + 128
            )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def test_fast_idct_matches_definition():
    rng = np.random.default_rng(1)
    F = rng.standard_normal((6, 8, 8)) * 60
    fast = idct_blocks(F)
    for n in range(6):
        assert np.allclose(fast[n], idct_ref(F[n]), atol=1e-9)


def test_dc_only_is_exact_closed_form():
    """With the flat q=8 table a lone DC decodes to EXACTLY dc + 128 —
    the arithmetic the multimodal_jpeg_pixels oracle states."""
    rng = np.random.default_rng(2)
    dc = rng.integers(-125, 126, size=(3, 5))
    blocks = np.zeros((3, 5, 8, 8), dtype=np.int64)
    blocks[:, :, 0, 0] = dc
    img = decode_jpeg(encode_jpeg_gray(blocks))
    assert img.shape == (24, 40)
    assert (img == np.repeat(np.repeat(dc + 128, 8, 0), 8, 1)).all()


def test_roundtrip_random_sparse_ac_vs_definition_idct():
    """Random DC + sparse AC coefficients through the full entropy
    layer (DC categories, run/size, ZRL, EOB, byte stuffing) must
    reconstruct exactly what the definition IDCT says."""
    rng = np.random.default_rng(3)
    blocks = np.zeros((2, 4, 8, 8), dtype=np.int64)
    blocks[:, :, 0, 0] = rng.integers(-120, 121, size=(2, 4))
    for _ in range(60):
        i, j = rng.integers(0, 2), rng.integers(0, 4)
        u, v = rng.integers(0, 8), rng.integers(0, 8)
        blocks[i, j, u, v] = int(rng.integers(-40, 41))
    # force a ZRL path: a lone coefficient after >16 zigzag zeros
    blocks[0, 0] = 0
    blocks[0, 0, 0, 0] = 30
    blocks[0, 0, 7, 7] = 5
    img = decode_jpeg(encode_jpeg_gray(blocks))
    assert (img == reconstruct(blocks)).all()


def test_0xff_byte_stuffing_roundtrip():
    """Coefficients tuned so the entropy stream contains 0xFF bytes —
    the unstuffing path must be exercised (encoder stuffs 0x00)."""
    rng = np.random.default_rng(4)
    for seed in range(8):  # several streams — at least one hits 0xFF
        r = np.random.default_rng(seed)
        blocks = r.integers(-3, 4, size=(2, 2, 8, 8)).astype(np.int64)
        img = decode_jpeg(encode_jpeg_gray(blocks))
        assert (img == reconstruct(blocks)).all(), seed


def test_non_jpeg_and_progressive_raise():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    blocks = np.zeros((1, 1, 8, 8), dtype=np.int64)
    payload = bytearray(encode_jpeg_gray(blocks))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive|baseline"):
        decode_jpeg(bytes(payload))


def test_truncated_stream_raises():
    blocks = np.full((2, 2, 8, 8), 3, dtype=np.int64)
    payload = encode_jpeg_gray(blocks)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])


def test_fixture_formula_matches_oracle_arithmetic():
    """jpeg_fixture_blocks + decode must land exactly on the SQL
    oracle's closed form: sum = 64 * Σ_b ((id*7 + b*13) % 251 + 3)."""
    from osm_pbf_parquet_spark.operators.multimodal import (
        jpeg_fixture_blocks,
    )

    heights = set()
    for doc_id in [0, 1, 7, 123, 499]:
        blocks = jpeg_fixture_blocks(doc_id)
        img = decode_jpeg(encode_jpeg_gray(blocks))
        bh, bw = blocks.shape[:2]
        heights.add(bh)
        assert img.shape == (bh * 8, bw * 8)
        n = bh * bw
        want = 64 * sum((doc_id * 7 + b * 13) % 251 + 3 for b in range(n))
        assert int(img.astype(np.int64).sum()) == want, doc_id
    # r6 review: (doc_id*3)%3 was identically 0 — every fixture one
    # block-row tall, so multi-row raster order / DC carry at row
    # boundaries was never exercised by the graded oracle
    assert len(heights) > 1, "fixture grid must vary in block rows"


def test_color_444_roundtrip_vs_definition():
    """3-component 4:4:4 path: YCbCr planes reconstruct per the
    definition IDCT, then the decoder's color conversion must match
    the reference BT.601 formulas exactly (round + clip)."""
    from osm_pbf_parquet_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(7)
    blocks = np.zeros((3, 2, 3, 8, 8), dtype=np.int64)
    blocks[:, :, :, 0, 0] = rng.integers(-100, 101, size=(3, 2, 3))
    for _ in range(40):
        c, i, j = rng.integers(0, 3), rng.integers(0, 2), rng.integers(0, 3)
        u, v = rng.integers(0, 8), rng.integers(0, 8)
        blocks[c, i, j, u, v] = int(rng.integers(-25, 26))
    img = decode_jpeg(encode_jpeg(blocks))
    assert img.shape == (16, 24, 3)
    planes = []
    for c in range(3):
        deq = blocks[c] * np.asarray(FLAT_Q8, dtype=np.int64)
        p = np.zeros((16, 24))
        for i in range(2):
            for j in range(3):
                p[i*8:(i+1)*8, j*8:(j+1)*8] = idct_ref(deq[i, j]) + 128
        planes.append(p)
    y, cb, cr = planes
    want = np.stack([
        y + 1.402 * (cr - 128.0),
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
        y + 1.772 * (cb - 128.0),
    ], axis=-1)
    want = np.clip(np.round(want), 0, 255).astype(np.uint8)
    assert (img == want).all()


def test_restart_markers_roundtrip():
    """DRI + RSTn every 2 MCUs: predictors reset, stream re-aligns —
    decoded pixels identical to the no-restart encoding."""
    from osm_pbf_parquet_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(8)
    blocks = np.zeros((3, 4, 8, 8), dtype=np.int64)
    blocks[:, :, 0, 0] = rng.integers(-120, 121, size=(3, 4))
    blocks[1, 2, 0, 3] = 17
    plain = decode_jpeg(encode_jpeg(blocks))
    with_rst = encode_jpeg(blocks, restart_interval=2)
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
    assert (decode_jpeg(with_rst) == plain).all()
    # color + restarts together
    cb = np.zeros((3, 2, 2, 8, 8), dtype=np.int64)
    cb[:, :, :, 0, 0] = rng.integers(-90, 91, size=(3, 2, 2))
    assert (decode_jpeg(encode_jpeg(cb, restart_interval=1))
            == decode_jpeg(encode_jpeg(cb))).all()


def test_bitreader_lone_0xff_at_eof_raises_valueerror():
    """r6 review: entropy data ending with a lone 0xFF hit
    `f"0xFF{nxt:02X}"` with nxt=None — a TypeError masking the
    corrupt-JPEG ValueError contract."""
    from osm_pbf_parquet_spark.operators.jpeg import _BitReader

    br = _BitReader(b"\xff", 0)
    with pytest.raises(ValueError, match="truncated"):
        br.bit()


def test_align_to_marker_truncation_raises_valueerror():
    """r6 review: a stream cut before the next RSTn made
    align_to_marker read past EOF (bare IndexError)."""
    from osm_pbf_parquet_spark.operators.jpeg import _BitReader

    br = _BitReader(b"\x12\x34\x56", 0)
    with pytest.raises(ValueError, match="truncated"):
        br.align_to_marker()


def test_multi_scan_color_raises_not_implemented():
    """r6 review: a legal baseline 3-component file with one scan PER
    component was silently decoded as grayscale from its first (Y)
    scan; the honest-stub contract requires NotImplementedError."""
    import struct as _s

    sof_body = _s.pack(">BHHB", 8, 8, 8, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos_body = bytes([1, 1, 0x00, 0, 63, 0])  # ns=1 of 3 comps
    payload = (
        b"\xff\xd8"
        + b"\xff\xc0" + _s.pack(">H", len(sof_body) + 2) + sof_body
        + b"\xff\xda" + _s.pack(">H", len(sos_body) + 2) + sos_body
    )
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(payload)
