"""Incremental (CDC-style) reads from the manifest commit timeline,
and streaming dedup at ingest."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from osm_pbf_parquet_spark.plans.manifest import (
    encode_job,
    read_encoded,
    read_incremental,
)
from osm_pbf_parquet_spark.plans.merge import merge_job


def test_incremental_read_sees_only_changed_partitions(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "store")
    encode_job(spark, src, out, key_col="doc_id", num_partitions=8)
    t0 = time.time()
    time.sleep(0.05)

    # merge touches only the partitions holding doc_id % 50 == 0
    updates = src.filter(F.col("doc_id") % 50 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" [v2]"))
    )
    merge_job(spark, out, src.schema, updates=updates,
              key_col="doc_id", num_partitions=8)

    inc = read_incremental(spark, out, src.schema, since=t0)
    inc_rows = inc.count()
    full_rows = read_encoded(spark, out, src.schema).count()
    # strictly fewer rows than a full read (only rewritten partitions)
    assert 0 < inc_rows < full_rows
    # every updated doc is present in the incremental feed, amended
    upd_ids = {r["doc_id"] for r in updates.select("doc_id").collect()}
    got = {
        r["doc_id"]
        for r in inc.filter(F.col("text").endswith(" [v2]")).collect()
    }
    assert upd_ids == got


def test_incremental_read_empty_window(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "store2")
    encode_job(spark, src, out, key_col="doc_id", num_partitions=4)
    after = time.time() + 1
    assert read_incremental(spark, out, src.schema, since=after).count() == 0
    # until replays a historical window: (0, now] sees everything
    assert (
        read_incremental(
            spark, out, src.schema, since=0.0, until=time.time() + 1
        ).count()
        == src.count()
    )


def test_streaming_dedup_suppresses_duplicates(spark, tmp_path):
    from osm_pbf_parquet_spark.streaming import content_dedup_stream

    # feed: 200 docs, every fifth text duplicated under a NEW id
    base = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), (F.col("id") % 160).cast("string")).alias(
            "text"
        ),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * F.lit(1000)
        ).alias("ts"),
    )
    feed_dir = str(tmp_path / "feed")
    base.write.parquet(feed_dir)

    stream = spark.readStream.schema(base.schema).parquet(feed_dir)
    deduped = content_dedup_stream(stream, ["text"], "ts")
    out_dir = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    # 160 distinct texts, exactly one survivor each, schema intact
    assert got.count() == 160
    assert got.select("text").distinct().count() == 160
    assert set(got.columns) == {"doc_id", "text", "ts"}


def test_streaming_key_dedup(spark, tmp_path):
    from osm_pbf_parquet_spark.streaming import dedup_stream

    base = spark.range(100).select(
        (F.col("id") % 40).alias("url_id"),
        F.col("id").alias("fetch_no"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * F.lit(1000)
        ).alias("ts"),
    )
    feed_dir = str(tmp_path / "feed2")
    base.write.parquet(feed_dir)
    stream = spark.readStream.schema(base.schema).parquet(feed_dir)
    deduped = dedup_stream(stream, ["url_id"], "ts")
    out_dir = str(tmp_path / "out2")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 40
    assert got.select("url_id").distinct().count() == 40
