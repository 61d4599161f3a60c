"""ISO-BMFF (MP4) metadata walk (operators/mp4.py) + the video leg of
the multimodal operators. Frame decode is an HONEST stub (H.264
entropy coding out of scope); the container walk is real and
round-trip-tested against the encoder twin. No reference counterpart
— serves the training-data mandate's multimodal row."""

from __future__ import annotations

import struct

import pytest

from osm_pbf_parquet_spark.operators.mp4 import (
    decode_video_frames,
    encode_minimal_mp4,
    parse_mp4_meta,
)
from osm_pbf_parquet_spark.operators.multimodal import mp4_fixture_params


@pytest.mark.parametrize("largesize", [False, True])
@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("junk", [False, True])
def test_roundtrip_corners(largesize, version, junk):
    p = encode_minimal_mp4(
        4321, video_dims=(320, 240), n_audio_tracks=2,
        use_largesize=largesize, mvhd_version=version, junk=junk,
    )
    m = parse_mp4_meta(p)
    assert m == {
        "duration_ms": 4321, "n_tracks": 3, "n_video": 1,
        "n_audio": 2, "width": 320, "height": 240,
    }


def test_audio_only_and_size_zero_box():
    p = encode_minimal_mp4(900, video_dims=None, n_audio_tracks=1)
    m = parse_mp4_meta(p)
    assert m["n_video"] == 0 and m["n_audio"] == 1
    assert m["width"] == 0 and m["height"] == 0
    # a trailing size==0 box legally extends to end of file
    p2 = p + struct.pack(">I", 0) + b"skip" + b"\x00" * 10
    assert parse_mp4_meta(p2) == m


def test_corruption_fails_fast():
    good = encode_minimal_mp4(1000, video_dims=(64, 48))
    with pytest.raises(ValueError, match="ftyp|overruns"):
        parse_mp4_meta(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="overruns|truncated"):
        parse_mp4_meta(good[:20])
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4_meta(good[:24])  # ftyp alone
    # a box whose size field (2) is smaller than its own header can't
    # contain its body: the overrun check rejects it
    bad = good[:24] + struct.pack(">I", 2) + b"zero"
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4_meta(bad)


def test_undersized_tkhd_and_hdlr_fail_fast():
    """Fixed-offset reads into tkhd/hdlr must be bounds-checked: a
    zero-body tkhd previously yielded garbage dimensions silently."""
    import struct as _s
    from osm_pbf_parquet_spark.operators.mp4 import _box, _full

    def file_with_trak(trak_body: bytes) -> bytes:
        mvhd = _full(b"mvhd", 0, 0, _s.pack(">IIII", 0, 0, 1000, 500)
                     + b"\x00" * 80)
        moov = _box(b"moov", mvhd + _box(b"trak", trak_body))
        return _box(b"ftyp", b"isom" + _s.pack(">I", 0) + b"isom") + moov

    hdlr = _full(b"hdlr", 0, 0, _s.pack(">I", 0) + b"vide"
                 + b"\x00" * 13)
    mdia = _box(b"mdia", hdlr)
    # video trak with an EMPTY tkhd body
    bad_tkhd = file_with_trak(_full(b"tkhd", 0, 7, b"") + mdia)
    with pytest.raises(ValueError, match="tkhd"):
        parse_mp4_meta(bad_tkhd)
    # trak whose hdlr is too small to carry a handler type
    tiny_hdlr = _box(b"mdia", _full(b"hdlr", 0, 0, b"xx"))
    with pytest.raises(ValueError, match="hdlr"):
        parse_mp4_meta(file_with_trak(tiny_hdlr))


def test_frame_decode_is_an_honest_stub():
    with pytest.raises(NotImplementedError, match="out of scope"):
        decode_video_frames(b"anything")


def test_fixture_covers_all_walk_corners():
    seen = {"largesize": False, "v1": False, "junk": False, "stereo": False}
    for i in range(20):
        if i % 3 == 0:
            seen["largesize"] = True
        if i % 5 == 0:
            seen["v1"] = True
        if i % 4 == 0:
            seen["junk"] = True
        if mp4_fixture_params(i)[3] == 1:
            seen["stereo"] = True
    assert all(seen.values())


def test_operator_matches_formula(spark):
    from osm_pbf_parquet_spark.operators.multimodal import (
        attach_mp4_fixture,
        extract_video_meta,
    )

    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = extract_video_meta(attach_mp4_fixture(df)).collect()
    assert len(out) == 40
    for r in out:
        dur, w, h, na = mp4_fixture_params(r.doc_id)
        assert (r.duration_ms, r.n_tracks, r.width, r.height) == \
            (dur, 1 + na, w, h)
