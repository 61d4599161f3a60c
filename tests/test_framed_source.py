"""Binary-framed source: header-only index scan, block-parallel decode,
corruption fail-fast (reference src/pbf.rs:45-91 process_blobs shape)."""

from __future__ import annotations

import struct
import zlib

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def framed_file(tmp_path_factory):
    from osm_pbf_parquet_spark.sources.framed import write_framed

    tbl = pa.table(
        {
            "k": pa.array(range(5000), pa.int64()),
            "txt": pa.array([f"row-{i}-{'x' * (i % 37)}" for i in range(5000)]),
            "val": pa.array([i * 0.5 for i in range(5000)], pa.float64()),
        }
    )
    path = str(tmp_path_factory.mktemp("framed") / "data.bin")
    n_blocks = write_framed(path, tbl, block_rows=300)
    assert n_blocks == 17
    return path, tbl


def test_scan_frames_header_only(framed_file):
    from osm_pbf_parquet_spark.sources.framed import scan_frames

    path, _ = framed_file
    idx = scan_frames(path)
    assert len(idx) == 17
    # offsets strictly increasing, lengths positive
    offs = [o for o, _ in idx]
    assert offs == sorted(offs) and all(ln > 0 for _, ln in idx)


def test_read_framed_roundtrip(spark, framed_file):
    from osm_pbf_parquet_spark.sources.framed import read_framed

    path, tbl = framed_file
    df = read_framed(spark, path)
    assert df.rdd.getNumPartitions() > 1  # block-parallel, not one task
    got = sorted((r["k"], r["txt"], r["val"]) for r in df.collect())
    want = sorted(
        zip(tbl.column("k").to_pylist(), tbl.column("txt").to_pylist(),
            tbl.column("val").to_pylist())
    )
    assert got == want


def test_framed_to_encode_pipeline(spark, framed_file):
    """framed decode → columnar encode → decode: bit-identical rows."""
    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
    )
    from osm_pbf_parquet_spark.sources.framed import read_framed

    path, tbl = framed_file
    src = read_framed(spark, path)
    chunks = encode_dataframe(src, key_col="k", num_partitions=4)
    out = decode_dataframe(chunks, src.schema)
    assert sorted(r["k"] for r in out.collect()) == list(range(5000))


def test_corrupt_frame_fails_loudly(tmp_path):
    from osm_pbf_parquet_spark.sources.framed import scan_frames, write_framed

    tbl = pa.table({"k": pa.array(range(100), pa.int64())})
    path = str(tmp_path / "bad.bin")
    write_framed(path, tbl, block_rows=50)
    data = open(path, "rb").read()
    # oversized length field
    bad = struct.pack(">I", 1 << 31) + data[4:]
    open(path, "wb").write(bad)
    with pytest.raises(ValueError, match="corrupt frame"):
        scan_frames(path)
    # truncated header
    open(path, "wb").write(data[: len(data) - 2])
    with pytest.raises(ValueError, match="corrupt frame|truncated"):
        scan_frames(path)


def test_corrupt_payload_fails_decode(tmp_path):
    from osm_pbf_parquet_spark.sources.framed import (
        decode_block,
        scan_frames,
        write_framed,
    )

    tbl = pa.table({"k": pa.array(range(100), pa.int64())})
    path = str(tmp_path / "bad2.bin")
    write_framed(path, tbl, block_rows=100)
    (off, ln), = scan_frames(path)
    data = bytearray(open(path, "rb").read())
    data[off + ln // 2] ^= 0xFF
    open(path, "wb").write(bytes(data))
    with pytest.raises(zlib.error):
        decode_block(path, off, ln)
