"""Structured Streaming encode: micro-batches land in the same
manifest-governed chunk store as the batch path, idempotently."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_encode_available_now(spark, pages_path, tmp_path):
    from osm_pbf_parquet_spark.plans.manifest import read_encoded, read_manifest
    from osm_pbf_parquet_spark.streaming import encode_stream

    src_static = spark.read.parquet(pages_path)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(src_static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(pages_path).rsplit("/", 1)[0])
    )
    q = encode_stream(stream, out, ckpt, key_col="url", num_partitions=4)
    q.awaitTermination(120)

    m = read_manifest(spark, out)
    assert m is not None and m.count() > 0
    assert m.filter(~F.col("snapshot_id").startswith("epoch-")).count() == 0

    dec = read_encoded(spark, out, src_static.schema)
    assert dec.count() == src_static.count()
    joined = src_static.alias("a").join(dec.alias("b"), "url")
    cols = [c for c in src_static.columns if c != "url"]
    ok = joined.filter(F.expr(" AND ".join(f"a.{c} <=> b.{c}" for c in cols))).count()
    assert ok == src_static.count()


def test_merge_stream_cdc_apply(spark, pages_path, tmp_path):
    """A CDC stream (upserts + deletes) lands in one logical snapshot
    via copy-on-write merge; the final view equals batch-applied
    changes exactly."""
    from osm_pbf_parquet_spark.plans.manifest import encode_job, read_encoded
    from osm_pbf_parquet_spark.streaming.encode_stream import merge_stream

    src = spark.read.parquet(pages_path)
    out = str(tmp_path / "store")
    encode_job(spark, src, out, key_col="url", num_partitions=4)

    # change feed: 80 re-crawls + 30 takedowns, written as parquet the
    # stream will pick up
    ups = (
        src.limit(80)
        .withColumn("text", F.concat(F.col("text"), F.lit(" [cdc]")))
        .withColumn("op", F.lit("upsert"))
    )
    dels = (
        src.join(ups.select("url"), "url", "left_anti")
        .orderBy(F.desc("url")).limit(30)
        .withColumn("op", F.lit("delete"))
    )
    feed_dir = str(tmp_path / "feed")
    ups.unionByName(dels).write.parquet(feed_dir)

    stream = (
        spark.readStream.schema(ups.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(feed_dir)
    )
    q = merge_stream(
        stream, out, str(tmp_path / "ckpt"), src.schema,
        key_col="url", num_partitions=4,
    )
    q.awaitTermination(180)

    expected = (
        src.join(ups.select("url"), "url", "left_anti")
        .join(dels.select("url"), "url", "left_anti")
        .unionByName(ups.drop("op"))
    )
    dec = read_encoded(spark, out, src.schema)
    assert dec.count() == expected.count()
    joined = expected.alias("a").join(dec.alias("b"), "url")
    cols = [c for c in src.columns if c != "url"]
    ok = joined.filter(
        F.expr(" AND ".join(f"a.{c} <=> b.{c}" for c in cols))
    ).count()
    assert ok == expected.count()


def test_merge_stream_upsert_then_delete_same_key(spark, pages_path, tmp_path):
    """An upsert followed by a delete of the SAME key inside one
    micro-batch must delete (last op per key wins), not resurrect the
    row (r3 advice: merge_job alone would let the upsert win)."""
    from osm_pbf_parquet_spark.plans.manifest import encode_job, read_encoded
    from osm_pbf_parquet_spark.streaming.encode_stream import merge_stream

    src = spark.read.parquet(pages_path)
    out = str(tmp_path / "store")
    encode_job(spark, src, out, key_col="url", num_partitions=4)

    victim = src.orderBy("url").limit(1)
    # one feed file: seq 1 = upsert (amended text), seq 2 = delete
    feed = (
        victim.withColumn("op", F.lit("upsert"))
        .withColumn("seq", F.lit(1))
        .unionByName(
            victim.withColumn("op", F.lit("delete")).withColumn("seq", F.lit(2))
        )
    )
    feed_dir = str(tmp_path / "feed")
    feed.coalesce(1).write.parquet(feed_dir)

    stream = spark.readStream.schema(feed.schema).parquet(feed_dir)
    q = merge_stream(
        stream, out, str(tmp_path / "ckpt"), src.schema,
        key_col="url", seq_col="seq", num_partitions=4,
    )
    q.awaitTermination(180)

    dec = read_encoded(spark, out, src.schema)
    gone = victim.select("url").collect()[0]["url"]
    assert dec.filter(F.col("url") == gone).count() == 0
    assert dec.count() == src.count() - 1
