"""Real OSM PBF wire-format source (sources/pbf.py).

Contract parity: reference src/pbf.rs:45-91 (framed blob walk),
:175-191 (element demux), osmpbf-crate delta decode (S6). The writer
and reader are independent implementations of the public spec, so the
round-trip tests cross-check both directions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from osm_pbf_parquet_spark.sources import pbf


def _nodes(n=50):
    return [
        {
            "id": i * 3 + 1,
            "lat_units": (i * 1234567) % 1_800_000_000 - 900_000_000,
            "lon_units": (i * 7654321) % 3_600_000_000 - 1_800_000_000,
            "tags": {"name": f"n{i}", "ref": str(i)} if i % 3 else {},
            "ts_ms": 1_700_000_000_000 + i * 1000,
            "changeset": i * 7,
            "uid": i % 11,
            "user": f"u{i % 11}",
            "version": 1 + i % 5,
            "visible": i % 9 != 0,
        }
        for i in range(n)
    ]


def _ways(n=10):
    return [
        {
            "id": 1_000_000 + i,
            "tags": {"highway": "residential"},
            "refs": [i, i + 5, i + 11, i + 2],
            "ts_ms": 1_700_000_000_000 + i * 1000,
            "changeset": i,
            "uid": i % 7,
            "user": f"w{i % 7}",
            "version": 1,
            "visible": True,
        }
        for i in range(n)
    ]


def _rels(n=5):
    return [
        {
            "id": 2_000_000 + i,
            "tags": {},
            "members": [(0, i, "outer"), (1, 1_000_000 + i, ""), (2, 42, "x")],
            "ts_ms": 1_700_000_000_000 + i * 1000,
            "changeset": i,
            "uid": 1,
            "user": "r",
            "version": 2,
            "visible": True,
        }
        for i in range(n)
    ]


def test_varint_vectorized_matches_scalar():
    rng = np.random.default_rng(5)
    vals = np.concatenate([
        rng.integers(0, 1 << 20, 100, dtype=np.uint64),
        rng.integers(0, 1 << 62, 100, dtype=np.uint64),
        np.array([0, 1, 127, 128, (1 << 64) - 1], dtype=np.uint64),
    ])
    buf = b"".join(pbf._enc_uvarint(int(v)) for v in vals)
    out = pbf._unpack_uvarints(buf)
    assert np.array_equal(out, vals)


def test_zigzag_roundtrip():
    vals = np.array(
        [0, -1, 1, -2, 2, 2**62, -(2**62), -(2**63), 2**63 - 1], dtype=np.int64
    )
    buf = b"".join(pbf._enc_zigzag(int(v)) for v in vals)
    out = pbf._zigzag_decode(pbf._unpack_uvarints(buf))
    assert np.array_equal(out, vals)


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.osm.pbf")
    nodes, ways, rels = _nodes(), _ways(), _rels()
    n_blobs = pbf.write_osm_pbf(path, nodes, ways, rels, nodes_per_block=20)
    assert n_blobs == 3 + 1 + 1  # 50/20 node blobs + ways + rels
    idx = pbf.scan_osm_blobs(path)
    assert len(idx) == n_blobs
    tbl = pa.concat_tables(
        [pbf.decode_osm_blob(path, o, ln) for o, ln in idx]
    )
    assert tbl.num_rows == len(nodes) + len(ways) + len(rels)
    rows = {(r["type"], r["id"]): r for r in tbl.to_pylist()}
    for nd in nodes:
        r = rows[("node", nd["id"])]
        assert round(r["lat"] * 1e7) == nd["lat_units"]
        assert round(r["lon"] * 1e7) == nd["lon_units"]
        assert dict(r["tags"]) == nd["tags"]
        assert r["changeset"] == nd["changeset"]
        assert r["uid"] == nd["uid"]
        assert r["user"] == nd["user"]
        assert r["version"] == nd["version"]
        assert r["visible"] == nd["visible"]
        assert int(r["timestamp"].timestamp() * 1000) == nd["ts_ms"]
        assert r["nds"] is None and r["members"] is None
    for w in _ways():
        r = rows[("way", w["id"])]
        assert [x["ref"] for x in r["nds"]] == w["refs"]
        assert r["lat"] is None and r["lon"] is None
        assert dict(r["tags"]) == w["tags"]
    for rel in _rels():
        r = rows[("relation", rel["id"])]
        got = [(m["type"], m["ref"], m["role"]) for m in r["members"]]
        want = [
            (("node", "way", "relation")[t], ref, role)
            for t, ref, role in rel["members"]
        ]
        assert got == want


def test_plain_node_group_parses(tmp_path):
    """Non-dense Node groups (spec-complete even though our writer and
    most real writers emit DenseNodes)."""
    st = pbf._StringTable()
    node_msg = b"".join([
        pbf._field_key(1, 0) + pbf._enc_zigzag(77),
        pbf._packed_field(2, [st.sid("k")]),
        pbf._packed_field(3, [st.sid("v")]),
        pbf._field_key(8, 0) + pbf._enc_zigzag(123_000_000),
        pbf._field_key(9, 0) + pbf._enc_zigzag(-45_000_000),
    ])
    group = pbf._len_field(1, node_msg)
    block = b"".join([
        pbf._len_field(1, st.message()),
        pbf._len_field(2, group),
        pbf._varint_field(17, 100),
    ])
    tbl = pbf.parse_primitive_block(block)
    r = tbl.to_pylist()[0]
    assert r["id"] == 77 and r["type"] == "node"
    assert round(r["lat"] * 1e7) == 123_000_000
    assert round(r["lon"] * 1e7) == -45_000_000
    assert dict(r["tags"]) == {"k": "v"}
    assert r["timestamp"] is None and r["user"] is None


def test_corrupt_and_unsupported_fail_fast(tmp_path):
    path = str(tmp_path / "t.osm.pbf")
    pbf.write_osm_pbf(path, _nodes(5))
    # truncation: chop the last blob
    data = open(path, "rb").read()
    bad = str(tmp_path / "bad.osm.pbf")
    open(bad, "wb").write(data[:-3])
    with pytest.raises(ValueError, match="exceeds file|truncated"):
        pbf.scan_osm_blobs(bad)
    # corrupt zlib payload inside a blob
    idx = pbf.scan_osm_blobs(path)
    off, ln = idx[0]
    mangled = bytearray(data)
    mangled[off + ln - 1] ^= 0xFF
    bad2 = str(tmp_path / "bad2.osm.pbf")
    open(bad2, "wb").write(bytes(mangled))
    with pytest.raises(Exception):
        pbf.decode_osm_blob(bad2, off, ln)
    # unsupported required feature in the header
    hdr_block = pbf._len_field(4, b"HistoricalInformation")
    z = zlib.compress(hdr_block)
    blob = pbf._varint_field(2, len(hdr_block)) + pbf._len_field(3, z)
    header = pbf._len_field(1, b"OSMHeader") + pbf._varint_field(3, len(blob))
    bad3 = str(tmp_path / "bad3.osm.pbf")
    with open(bad3, "wb") as f:
        f.write(struct.pack(">I", len(header)))
        f.write(header)
        f.write(blob)
    with pytest.raises(ValueError, match="unsupported feature"):
        pbf.scan_osm_blobs(bad3)


def test_spark_read_block_parallel(spark, tmp_path):
    """read_osm_pbf: task-per-blob fan-out, unified schema, and the
    decoded rows feed encode/decode bit-identically."""
    from pyspark.sql import functions as F

    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
    )

    path = str(tmp_path / "t.osm.pbf")
    nodes, ways, rels = _nodes(200), _ways(40), _rels(10)
    pbf.write_osm_pbf(path, nodes, ways, rels, nodes_per_block=50)
    df = spark.read.parquet  # noqa: F841  (fixture warm)
    osm = pbf.read_osm_pbf(spark, path)
    assert osm.count() == 250
    # the only Exchange moves the 24-byte-per-blob INDEX rows (task
    # fan-out), never decoded element data: every Exchange in the plan
    # carries exactly the index columns
    plan = osm._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange" in line:
            # the exchanged child is the driver-built index scan, not
            # the decoded elements (mapInArrow runs ABOVE the exchange)
            rest = "\n".join(lines[i:])
            assert "Scan ExistingRDD[path" in rest
            assert "MapInArrow" not in rest
    # per-type invariants survive Spark's bridge
    agg = osm.groupBy("type").count().collect()
    assert {r["type"]: r["count"] for r in agg} == {
        "node": 200, "way": 40, "relation": 10
    }
    # chunk-store round trip of the ingested table (S4/S5 → §2.8)
    chunks = encode_dataframe(osm, key_col="id", num_partitions=4)
    dec = decode_dataframe(chunks, osm.schema)
    assert dec.count() == 250
    a = osm.orderBy("type", "id").collect()
    b = dec.orderBy("type", "id").collect()
    assert a == b
    # spot-check a delta-decoded chain against the writer's input
    w = osm.filter(
        (F.col("type") == "way") & (F.col("id") == 1_000_000)
    ).collect()[0]
    assert [x["ref"] for x in w["nds"]] == ways[0]["refs"]


# ---------------------------------------------------------------------------
# protobuf spec compliance: split packed fields, unknown Info extensions,
# writer ts-alignment contract (round-5 hardening)
# ---------------------------------------------------------------------------

def _delta_occurrences(fno, vals, split):
    """Packed sint-delta field as ONE occurrence or spec-legally SPLIT
    into two (the delta chain continues across the split — it is one
    logical array)."""
    if not split:
        return pbf._packed_delta_field(fno, vals)
    k = len(vals) // 2
    first = pbf._packed_delta_field(fno, vals[:k])
    prevs = [vals[k - 1]] + list(vals[k:-1])
    body = b"".join(
        pbf._enc_zigzag(v - p) for v, p in zip(vals[k:], prevs)
    )
    return first + pbf._len_field(fno, body)


def _packed_occurrences(fno, vals, split):
    if not split:
        return pbf._packed_field(fno, vals)
    k = max(1, len(vals) // 2)
    return pbf._packed_field(fno, vals[:k]) + pbf._packed_field(fno, vals[k:])


def _dense_block(split: bool) -> bytes:
    ids = [10, 25, 27, 40, 41, 100]
    lats = [5_000_000, -5_000_000, 100, 7, -2, 0]
    lons = [1, 2, 3, 4, 5, 6]
    tss = [1000, 2000, 3000, 4000, 5000, 6000]
    st = pbf._StringTable()
    k1, v1 = st.sid("k"), st.sid("v")
    u = st.sid("bob")
    kv = []
    for i in range(6):
        if i % 2:
            kv += [k1, v1]
        kv.append(0)
    info_a = pbf._packed_field(1, [1, 2, 3, 4, 5, 6])  # versions
    info_b = b"".join([
        _delta_occurrences(2, tss, split),
        pbf._packed_delta_field(3, [7] * 6),
        pbf._packed_delta_field(4, [3] * 6),
        pbf._packed_delta_field(5, [u] * 6),
        pbf._packed_field(6, [1] * 6),
    ])
    if split:
        # DenseInfo message itself split into two field-5 occurrences
        # (protobuf merges embedded messages by concatenation)
        info = pbf._len_field(5, info_a) + pbf._len_field(5, info_b)
    else:
        info = pbf._len_field(5, info_a + info_b)
    dense = b"".join([
        _delta_occurrences(1, ids, split),
        info,
        _delta_occurrences(8, lats, split),
        _delta_occurrences(9, lons, split),
        _packed_occurrences(10, kv, split),
    ])
    st_bytes = st.message()
    if split:
        # stringtable split across two block-level field-1 occurrences
        # (first entry is the 2-byte "" sentinel)
        st_fields = pbf._len_field(1, st_bytes[:2]) + pbf._len_field(
            1, st_bytes[2:]
        )
    else:
        st_fields = pbf._len_field(1, st_bytes)
    return b"".join([
        st_fields,
        pbf._len_field(2, pbf._len_field(2, dense)),
        pbf._varint_field(17, 100),
        pbf._varint_field(18, 1000),
    ])


def test_split_packed_fields_merge_dense():
    """A spec-legal file may split any packed field (and any embedded
    message) across multiple occurrences; the parse must concatenate,
    not keep the last occurrence."""
    normal = pbf.parse_primitive_block(_dense_block(split=False))
    split = pbf.parse_primitive_block(_dense_block(split=True))
    assert normal.num_rows == 6
    assert split.equals(normal)


def _way_block(split: bool) -> bytes:
    st = pbf._StringTable()
    refs = [100, 93, 150, 151, 7, 900]
    keys = [st.sid("highway"), st.sid("name")]
    vals = [st.sid("residential"), st.sid("x")]
    info_a = pbf._varint_field(1, 4)  # version
    info_b = pbf._varint_field(3, 77) + pbf._varint_field(
        5, st.sid("alice")
    )
    if split:
        info = pbf._len_field(4, info_a) + pbf._len_field(4, info_b)
    else:
        info = pbf._len_field(4, info_a + info_b)
    way = b"".join([
        pbf._varint_field(1, 123456),
        _packed_occurrences(2, keys, split),
        _packed_occurrences(3, vals, split),
        info,
        _delta_occurrences(8, refs, split),
    ])
    return b"".join([
        pbf._len_field(1, st.message()),
        pbf._len_field(2, pbf._len_field(3, way)),
        pbf._varint_field(17, 100),
        pbf._varint_field(18, 1000),
    ])


def test_split_packed_fields_merge_way():
    normal = pbf.parse_primitive_block(_way_block(split=False))
    split = pbf.parse_primitive_block(_way_block(split=True))
    r = normal.to_pylist()[0]
    assert [x["ref"] for x in r["nds"]] == [100, 93, 150, 151, 7, 900]
    assert dict(r["tags"]) == {"highway": "residential", "name": "x"}
    assert r["version"] == 4 and r["changeset"] == 77 and r["user"] == "alice"
    assert split.equals(normal)


def test_info_unknown_extension_skipped():
    """Protobuf requires unknown fields to be skipped: an Info message
    carrying a future length-delimited extension must not fail the
    batched way/relation path (it falls back to the per-message walk)."""
    st = pbf._StringTable()
    info = b"".join([
        pbf._varint_field(1, 9),
        pbf._len_field(15, b"future-extension-payload"),  # unknown field
        pbf._varint_field(3, 55),
        pbf._varint_field(5, st.sid("carol")),
    ])
    way = b"".join([
        pbf._varint_field(1, 7),
        pbf._len_field(4, info),
        pbf._packed_delta_field(8, [1, 2, 3]),
    ])
    block = b"".join([
        pbf._len_field(1, st.message()),
        pbf._len_field(2, pbf._len_field(3, way)),
        pbf._varint_field(17, 100),
        pbf._varint_field(18, 1000),
    ])
    r = pbf.parse_primitive_block(block).to_pylist()[0]
    assert r["version"] == 9 and r["changeset"] == 55 and r["user"] == "carol"
    assert r["timestamp"] is None and r["uid"] is None
    assert r["visible"] is True  # message exists -> protobuf default


def test_group_overlong_varint_rejected():
    """X6 fail-fast: an unknown wire-type-0 field inside a
    PrimitiveGroup encoded as a >10-byte varint (spec-corrupt) must
    raise, not be skipped — the inline group scan keeps the bound the
    old _uvarint walk enforced."""
    st = pbf._StringTable()
    group = b"\x28" + b"\x80" * 11 + b"\x01"  # fno=5 wt=0, 12-byte varint
    block = b"".join([
        pbf._len_field(1, st.message()),
        pbf._len_field(2, group),
        pbf._varint_field(17, 100),
    ])
    with pytest.raises(ValueError, match="longer than 10 bytes"):
        pbf.parse_primitive_block(block)


def test_distributed_scan_matches_sequential(spark, tmp_path):
    """The executor-parallel resync scan must return EXACTLY the
    sequential walk's index — its driver-side tiling proof (frames
    start at 0, tile contiguously, end at EOF) makes any divergence a
    hard error instead of a wrong answer. Range sizes below one blob,
    mid-blob boundaries, and single-range all covered."""
    import os

    path = str(tmp_path / "d.osm.pbf")
    pbf.write_osm_pbf(path, _nodes(4000), _ways(400), _rels(60),
                      nodes_per_block=250)
    seq = pbf.scan_osm_blobs(path, distributed=False)
    assert len(seq) > 10
    size = os.path.getsize(path)
    for rb in (1 << 12, 1 << 14, size):
        dist = pbf.scan_osm_blobs_distributed(
            spark, path, range_bytes=rb, probe_bytes=1 << 13
        )
        assert dist == seq, f"range_bytes={rb}"
    # the public entry point routes through resync when forced
    assert pbf.scan_osm_blobs(
        path, spark=spark, distributed=True,
        range_bytes=1 << 14, probe_bytes=1 << 13,
    ) == seq


def test_distributed_scan_rejects_planted_signature(spark, tmp_path):
    """A BlobHeader signature PLANTED inside an uncompressed payload
    (zlevel=0 stores the stringtable bytes literally) must not poison
    the resync scan: candidate validation (frame parse + next-frame
    chain) rejects it, or the tiling proof falls back — either way the
    index equals the sequential walk."""
    nodes = _nodes(600)
    for nd in nodes[:50]:
        nd["tags"] = {"note": "xx\x0a\x07OSMDatayy" * 3}
    path = str(tmp_path / "fp.osm.pbf")
    pbf.write_osm_pbf(path, nodes, nodes_per_block=100, zlevel=0)
    with open(path, "rb") as f:
        assert b"\x0a\x07OSMData" in f.read()  # the plant is on disk
    seq = pbf.scan_osm_blobs(path, distributed=False)
    dist = pbf.scan_osm_blobs_distributed(
        spark, path, range_bytes=1 << 12, probe_bytes=1 << 12
    )
    assert dist == seq
    # end-to-end through the auto entry point (fallback-safe)
    assert pbf.scan_osm_blobs(
        path, spark=spark, distributed=True,
        range_bytes=1 << 12, probe_bytes=1 << 12,
    ) == seq


def test_way_with_multibyte_tag_falls_back_scalar():
    """A way message carrying an unknown field with fno > 15 (2-byte
    tag on the wire, ≥ 0x80 first byte) must route that MESSAGE through
    the scalar fallback of the vectorized group walk — including
    dropping any spans the vector rounds recorded before the oddball
    tag was hit, so fields aren't double-counted. Unknown fields are
    skipped per protobuf; known fields decode identically."""
    st = pbf._StringTable()
    keys = [st.sid("highway")]
    vals = [st.sid("primary")]

    def way_bytes(with_unknown: bool) -> bytes:
        parts = [
            pbf._varint_field(1, 4242),
            pbf._packed_field(2, keys),
        ]
        if with_unknown:
            # fno=20 varint (tag 0xA0 0x01) AFTER keys were already
            # vector-recorded, plus fno=21 length-delimited and
            # fno=22 fixed64/fixed32 to exercise every skip path
            parts.append(pbf._varint_field(20, 77))
            parts.append(pbf._len_field(21, b"future"))
            parts.append(pbf._field_key(22, 1) + b"\x00" * 8)
            parts.append(pbf._field_key(23, 5) + b"\x00" * 4)
        parts.append(pbf._packed_field(3, vals))
        parts.append(pbf._packed_delta_field(8, [10, 20, 30]))
        return b"".join(parts)

    def block(with_unknown: bool, n_plain: int = 2) -> bytes:
        # surround the oddball way with plain ways so the vectorized
        # path and the fallback run side by side in ONE group
        ways = b"".join(
            pbf._len_field(3, way_bytes(False)) for _ in range(n_plain)
        ) + pbf._len_field(3, way_bytes(with_unknown))
        return b"".join([
            pbf._len_field(1, st.message()),
            pbf._len_field(2, ways),
            pbf._varint_field(17, 100),
            pbf._varint_field(18, 1000),
        ])

    normal = pbf.parse_primitive_block(block(False))
    odd = pbf.parse_primitive_block(block(True))
    assert odd.equals(normal)
    r = odd.to_pylist()[-1]
    assert r["id"] == 4242
    assert dict(r["tags"]) == {"highway": "primary"}
    assert [x["ref"] for x in r["nds"]] == [10, 20, 30]


def test_writer_rejects_subsecond_ts_everywhere(tmp_path):
    """ts alignment is enforced consistently: the dense-node path must
    raise like the way/relation path, not silently floor."""
    bad_node = dict(_nodes(1)[0], ts_ms=1_700_000_000_500)
    with pytest.raises(ValueError, match="not a multiple"):
        pbf.write_osm_pbf(str(tmp_path / "n.osm.pbf"), [bad_node])
    bad_way = dict(_ways(1)[0], ts_ms=1_700_000_000_250)
    with pytest.raises(ValueError, match="not a multiple"):
        pbf.write_osm_pbf(str(tmp_path / "w.osm.pbf"), [], [bad_way])


def test_read_osm_pbf_column_pushdown(spark, tmp_path):
    """`columns=` projects INSIDE the decode worker (a mapInArrow
    source is opaque to Catalyst, so .select() can't prune the Arrow
    bridge): projected read ≡ full read + select, schema is the
    subset in declared order, unknown columns raise."""
    import pytest as _pytest

    path = str(tmp_path / "c.osm.pbf")
    pbf.write_osm_pbf(path, _nodes(120), _ways(30), _rels(5),
                      nodes_per_block=40)
    proj = pbf.read_osm_pbf(spark, path, columns=["id", "type", "changeset"])
    assert proj.columns == ["id", "type", "changeset"]
    full = pbf.read_osm_pbf(spark, path).select("id", "type", "changeset")
    assert proj.exceptAll(full).count() == 0
    assert full.exceptAll(proj).count() == 0
    # timestamp column keeps its µs bridge cast when selected
    ts = pbf.read_osm_pbf(spark, path, columns=["id", "timestamp"])
    assert ts.schema["timestamp"].dataType.typeName() == "timestamp_ntz"
    assert ts.filter("timestamp IS NOT NULL").count() == 155
    with _pytest.raises(ValueError, match="not in"):
        pbf.read_osm_pbf(spark, path, columns=["id", "nope"])
