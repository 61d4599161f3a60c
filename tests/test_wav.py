"""RIFF/WAVE PCM codec (operators/wav.py) + the audio leg of the
multimodal operators (multimodal.attach_wav_fixture /
decode_audio_samples). No reference counterpart — serves the
training-data mandate's multimodal row (audio as opaque binary +
real decode)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm_pbf_parquet_spark.operators.wav import (
    decode_wav,
    encode_wav,
    parse_wav_header,
)
from osm_pbf_parquet_spark.operators.multimodal import wav_fixture


@pytest.mark.parametrize("dtype,ch,n", [
    (np.int16, 1, 100), (np.int16, 2, 77), (np.uint8, 1, 33),
    (np.uint8, 2, 51), (np.int16, 4, 5), (np.uint8, 1, 1),
])
def test_roundtrip_widths_channels(dtype, ch, n):
    rng = np.random.default_rng(n * ch)
    if dtype == np.int16:
        s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    else:
        s = rng.integers(0, 256, size=(n, ch)).astype(np.uint8)
    arr, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and arr.dtype == dtype
    assert (arr == s).all()


def test_pad_byte_and_junk_chunk():
    """Odd-sized data chunks carry a pad byte; unknown chunks (LIST,
    odd-sized too) must be skipped, not rejected."""
    s = np.arange(33, dtype=np.uint8).reshape(33, 1)  # 33 bytes: odd
    p = encode_wav(s, 8000, junk_chunk=b"INFOx")  # 5 bytes: odd
    assert len(p) % 2 == 0  # both pads emitted
    arr, rate = decode_wav(p)
    assert (arr == s).all() and rate == 8000
    assert parse_wav_header(p) == (1, 8000, 8, 33)


def test_header_parse_matches_decode():
    for i in (0, 1, 4, 5, 9, 16):
        s, rate = wav_fixture(i)
        p = encode_wav(s, rate)
        bits = 8 if s.dtype == np.uint8 else 16
        assert parse_wav_header(p) == (s.shape[1], rate, bits, s.shape[0])
    assert parse_wav_header(b"\x89PNG\r\n\x1a\n") is None
    assert parse_wav_header(b"RIFF\x04\x00\x00\x00AVI ") is None


def test_corruption_fails_fast():
    s = np.zeros((10, 1), dtype=np.int16)
    good = encode_wav(s, 8000)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="not WAVE"):
        decode_wav(good[:8] + b"AVI " + good[12:])
    # non-PCM format tag (0x0055 = MP3)
    bad = bytearray(good)
    fmt_off = good.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_off, 0x55)
    with pytest.raises(ValueError, match="not PCM"):
        decode_wav(bytes(bad))
    # data chunk overrunning the RIFF size
    bad2 = bytearray(good)
    data_off = good.index(b"data") + 4
    struct.pack_into("<I", bad2, data_off, 1 << 20)
    with pytest.raises(ValueError, match="overruns"):
        decode_wav(bytes(bad2))
    # frame-misaligned data (stereo 16-bit with 6 bytes)
    s2 = np.zeros((3, 2), dtype=np.int16)
    g2 = bytearray(encode_wav(s2, 8000))
    d2 = g2.index(b"data") + 4
    struct.pack_into("<I", g2, d2, 6)  # 6 % 4 != 0 is aligned; use 5
    struct.pack_into("<I", g2, d2, 5)
    with pytest.raises(ValueError, match="frame-aligned|overruns"):
        decode_wav(bytes(g2))


def test_truncated_and_duplicate_chunks_fail_fast():
    """A RIFF size promising more bytes than exist (partial download)
    and duplicate fmt/data chunks (spec violations that would make
    header-parse and decode disagree) must both raise."""
    s = np.arange(20, dtype=np.int16).reshape(10, 2)
    good = encode_wav(s, 8000, junk_chunk=b"INFOtrailing")
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-10])
    # duplicate data chunk appended inside the RIFF size
    extra = b"data" + struct.pack("<I", 4) + b"\x00" * 4
    dup = bytearray(good + extra)
    struct.pack_into("<I", dup, 4, len(dup) - 8)
    with pytest.raises(ValueError, match="duplicate data"):
        decode_wav(bytes(dup))
    fmt_body = good[good.index(b"fmt ") + 8:good.index(b"fmt ") + 24]
    extra_fmt = b"fmt " + struct.pack("<I", 16) + fmt_body
    dup2 = bytearray(good + extra_fmt)
    struct.pack_into("<I", dup2, 4, len(dup2) - 8)
    with pytest.raises(ValueError, match="duplicate fmt"):
        decode_wav(bytes(dup2))


def test_fixture_covers_both_widths_and_channel_counts():
    widths = set()
    chans = set()
    odd_data = False
    for i in range(20):
        s, rate = wav_fixture(i)
        widths.add(s.dtype.name)
        chans.add(s.shape[1])
        if (s.size * s.dtype.itemsize) % 2:
            odd_data = True
    assert widths == {"uint8", "int16"}
    assert chans == {1, 2}
    assert odd_data  # pad-byte path exercised by the corpus


def test_operator_matches_formula(spark):
    """End-to-end through Spark: attach_wav_fixture → decode_audio
    _samples must reproduce the closed-form sums the SQL oracle
    states."""
    from osm_pbf_parquet_spark.operators.multimodal import (
        attach_wav_fixture,
        decode_audio_samples,
    )

    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = decode_audio_samples(attach_wav_fixture(df)).collect()
    assert len(out) == 40
    for r in out:
        i = r.doc_id
        s, rate = wav_fixture(i)
        assert r.n_frames == s.shape[0]
        assert r.channels == s.shape[1]
        assert r.sample_rate == rate
        assert r.sample_sum == int(s.astype(np.int64).sum())
