"""Compaction: many small chunk groups → one per partition, appended
and superseding (last-wins manifest), data bit-identical throughout."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pbf_parquet_spark.plans.compact import compact_partitions
from osm_pbf_parquet_spark.plans.manifest import (
    encode_job,
    read_encoded,
    read_manifest,
)


def _identical(src, dec, key):
    cols = [c for c in src.columns if c != key]
    pred = " AND ".join(f"a.{c} <=> b.{c}" for c in cols)
    return (
        src.alias("a").join(dec.alias("b"), key).filter(F.expr(pred)).count()
        == src.count() == dec.count()
    )


def test_compact_merges_chunks_and_preserves_data(spark, pages_path, tmp_path):
    out = str(tmp_path / "store")
    src = spark.read.parquet(pages_path)
    # tiny chunk target → many chunk groups per partition
    encode_job(spark, src, out, key_col="url", num_partitions=4,
               target_chunk_bytes=64 << 10)
    m1 = read_manifest(spark, out)
    before = {r["partition_id"]: r["n_chunks"] for r in m1.collect()}
    assert max(before.values()) > 1, "fixture must produce multi-chunk partitions"

    stats = compact_partitions(spark, out, min_chunks=2)
    assert stats["compacted_partitions"] == sum(1 for v in before.values() if v >= 2)

    m2 = read_manifest(spark, out)
    after = {r["partition_id"]: r["n_chunks"] for r in m2.collect()}
    assert set(after) == set(before)
    assert all(v == 1 for v in after.values())

    dec = read_encoded(spark, out, src.schema)
    assert _identical(src, dec, "url")


def test_compact_is_idempotent_noop_when_clean(spark, pages_path, tmp_path):
    out = str(tmp_path / "store2")
    src = spark.read.parquet(pages_path)
    encode_job(spark, src, out, key_col="url", num_partitions=4)  # big target → 1 chunk
    assert compact_partitions(spark, out)["compacted_partitions"] == 0


def test_compact_improves_or_keeps_size(spark, pages_path, tmp_path):
    out = str(tmp_path / "store3")
    src = spark.read.parquet(pages_path)
    encode_job(spark, src, out, key_col="url", num_partitions=4,
               target_chunk_bytes=64 << 10)
    m1 = read_manifest(spark, out)
    before = m1.agg(F.sum("bytes_out")).first()[0]
    compact_partitions(spark, out, min_chunks=2)
    after = read_manifest(spark, out).agg(F.sum("bytes_out")).first()[0]
    # one dict/symbol-table per partition instead of per small chunk
    assert after <= before * 1.02, (before, after)
