"""Reference-schema parity: the engine round-trips the exact 12-column
OSM schema (reference src/osm_arrow.rs:44-95) including map<str,str>
tags, list<struct> nds/members, ms-precision timestamps, and the
hive-style type partitioning (reference src/sink.rs:156-169), and the
output passes the reference's own validation semantics
(test/validate.py: dup-check, completeness, scalar + nested equality).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from osm_pbf_parquet_spark.sources.osm_elements import generate_osm_elements


@pytest.fixture(scope="module")
def osm_path(tmp_path_factory):
    import pyarrow.parquet as pq

    p = str(tmp_path_factory.mktemp("osm") / "osm_elements.parquet")
    pq.write_table(generate_osm_elements(5000), p)
    return p


def test_arrow_kernel_roundtrip_nested():
    """Kernel-level: every column of the OSM schema, both codecs."""
    from osm_pbf_parquet_spark.functions.codecs import decode_array, encode_array

    tbl = generate_osm_elements(2000)
    for name in tbl.column_names:
        col = tbl.column(name).combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        for codec in (None, "plain", "zstd"):
            try:
                c, p, payload = encode_array(col, codec)
            except ValueError:
                continue
            out = decode_array(c, p, payload)
            assert out.equals(col), (name, codec)


def test_spark_roundtrip_osm_schema(spark, osm_path):
    from pyspark.sql import functions as F

    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
    )

    src = spark.read.parquet(osm_path)
    chunks = encode_dataframe(src, key_col="id", num_partitions=8)
    dec = decode_dataframe(chunks, src.schema)

    # V1 (validate.py:49-56): no duplicate (id, type)
    assert (
        dec.groupBy("id", "type").count().filter("count > 1").count() == 0
    )
    # V2/V3 (validate.py:59-83): completeness both directions
    a = src.select(F.col("id").alias("id"), F.col("type").alias("type"))
    b = dec.select(F.col("id").alias("id"), F.col("type").alias("type"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # V4/V5 (validate.py:85-209): scalar + nested deep equality
    cols = [c for c in src.columns if c not in ("id", "type")]
    joined = src.alias("s").join(dec.alias("d"), ["id", "type"])
    pred = " AND ".join(f"s.{c} <=> d.{c}" for c in cols if c != "tags")
    assert joined.filter(f"NOT ({pred})").count() == 0
    # map equality: compare sorted entry lists (maps are unordered in SQL
    # but our engine must preserve entry order — compare exact via arrays)
    tag_mismatch = joined.filter(
        ~F.expr("map_entries(s.tags) <=> map_entries(d.tags)")
    ).count()
    assert tag_mismatch == 0


def test_hive_style_type_partitioning(spark, osm_path, tmp_path):
    """The reference encodes `type` in the partition path, not the data
    (src/osm_arrow.rs:40-42, src/sink.rs:156-169). Spark reproduces the
    layout with partitionBy and recovers the column on read."""
    import os

    src = spark.read.parquet(osm_path)
    out = str(tmp_path / "hive")
    src.write.partitionBy("type").parquet(out)
    subdirs = {d for d in os.listdir(out) if d.startswith("type=")}
    assert subdirs == {"type=node", "type=way", "type=relation"}
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    per_type = {r["type"]: r["count"] for r in back.groupBy("type").count().collect()}
    src_per_type = {r["type"]: r["count"] for r in src.groupBy("type").count().collect()}
    assert per_type == src_per_type


def test_ms_timestamp_precision_preserved():
    """Reference stores Timestamp(ms) (src/osm_arrow.rs:86-90); the
    kernel layer must preserve the ms int64 view exactly."""
    from osm_pbf_parquet_spark.functions.codecs import decode_array, encode_array

    tbl = generate_osm_elements(500)
    col = tbl.column("timestamp").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    assert col.type == pa.timestamp("ms")
    for codec in ("delta", "bitpack", "zstd"):
        c, p, payload = encode_array(col, codec)
        out = decode_array(c, p, payload)
        assert out.type == pa.timestamp("ms")
        assert out.equals(col)
