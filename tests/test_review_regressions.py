"""Regressions from the round-1 code review: multi-run chunk-group
collisions, duplicate-codec manifest keys, short-text shingles, and
salted-pid passthrough on the resumable path."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_multi_snapshot_store_decodes_all_rows(spark, pages_path, tmp_path):
    """Two committed snapshots share partition_ids in one store; decode
    must keep their chunk groups apart (was: silent row loss)."""
    from osm_pbf_parquet_spark.plans.manifest import encode_job, read_encoded

    out = str(tmp_path / "multi_snap")
    src = spark.read.parquet(pages_path)
    half1 = src.filter(F.xxhash64("url") % 2 == 0)
    half2 = src.filter(F.xxhash64("url") % 2 != 0)
    encode_job(spark, half1, out, key_col="url", num_partitions=4,
               snapshot_id="snap-a")
    encode_job(spark, half2, out, key_col="url", num_partitions=4,
               snapshot_id="snap-b")
    dec = read_encoded(spark, out, src.schema)
    assert dec.count() == src.count()
    joined = src.alias("a").join(dec.alias("b"), "url")
    cols = [c for c in src.columns if c != "url"]
    ok = joined.filter(F.expr(" AND ".join(f"a.{c} <=> b.{c}" for c in cols))).count()
    assert ok == src.count()


def test_summarize_chunks_mixed_codecs_last_wins(spark):
    """A partition whose chunks picked different codecs for one column
    must not kill the commit with DUPLICATED_MAP_KEY."""
    from osm_pbf_parquet_spark.plans.manifest import summarize_chunks

    rows = [
        # (pid, seq, col_idx, column, codec, n_rows, bytes_in, bytes_out, checksum)
        (0, 0, 0, "text", "str_fsst", 10, 100, 40, "aa"),
        (0, 1, 0, "text", "str_zstd", 12, 120, 30, "bb"),
        (0, 0, 1, "id", "bitpack", 10, 80, 10, "cc"),
        (0, 1, 1, "id", "bitpack", 12, 96, 12, "dd"),
    ]
    written = spark.createDataFrame(
        rows,
        "partition_id long, chunk_seq long, col_idx int, column string,"
        " codec string, n_rows long, bytes_in long, bytes_out long,"
        " checksum string",
    )
    out = summarize_chunks(written).collect()
    assert len(out) == 1
    r = out[0]
    assert dict(r["codec_map"]) == {"text": "str_zstd", "id": "bitpack"}
    assert r["n_rows"] == 22 and r["n_chunks"] == 2
    assert r["bytes_in"] == 396 and r["bytes_out"] == 92


def test_short_text_shingles_empty(spark):
    """Texts shorter than k (incl. empty/null) produce NO shingles —
    Spark's sequence(1, 0) counts down, so the guard matters; without
    it every short doc shares one spurious shingle and LSH blows up n²."""
    from osm_pbf_parquet_spark.operators.dedup import (
        _char_shingles,
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "abc"), (3, "abcd"), (4, "")],
        ["doc_id", "text"],
    )
    sh = df.select("doc_id", _char_shingles("text", 4).alias("sh")).collect()
    by_id = {r["doc_id"]: r["sh"] for r in sh}
    assert by_id[0] == [] and by_id[1] == [] and by_id[2] == []
    assert by_id[3] == ["abcd"]
    # empty/null docs must NOT pair with each other
    pairs = minhash_lsh_pairs(df).collect()
    flat = {x for r in pairs for x in (r["doc_a"], r["doc_b"])}
    assert 0 not in flat and 1 not in flat and 4 not in flat


def test_encode_job_respects_salted_pids(spark, pages_path, tmp_path):
    """salted_pids must survive through the resumable path (was:
    silently recomputed as plain url-hash)."""
    from osm_pbf_parquet_spark.operators.encode import PID_COL
    from osm_pbf_parquet_spark.operators.partitioning import salted_pids
    from osm_pbf_parquet_spark.plans.manifest import encode_job, read_manifest

    src = spark.read.parquet(pages_path)
    salted = salted_pids(src, num_partitions=8)
    expected_pids = {r[0] for r in salted.select(PID_COL).distinct().collect()}
    out = str(tmp_path / "salted")
    stats = encode_job(spark, salted, out, key_col="url", num_partitions=8)
    got_pids = {r[0] for r in read_manifest(spark, out).select("partition_id").collect()}
    assert got_pids == expected_pids
    assert stats["rows"] == src.count()


def test_decode_detects_corrupt_payload(spark):
    """crc32 stored at encode time is verified before decode: a
    flipped payload byte must fail the job, not silently decode."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
    )

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    chunks = encode_dataframe(df, key_col="k", num_partitions=2).cache()
    corrupt = chunks.withColumn(
        "payload",
        F.when(
            F.col("column") == "v",
            F.concat(F.expr("substring(payload, 1, length(payload) - 1)"),
                     F.lit(b"\x00")),
        ).otherwise(F.col("payload")),
    )
    with _pytest.raises(Exception, match="checksum mismatch"):
        decode_dataframe(corrupt, df.schema).collect()
    chunks.unpersist()


def test_decode_rejects_incomplete_group(spark):
    """A chunk feed missing a column's cells (without the matching
    narrowed schema) must raise, not emit a misaligned batch."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
    )

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    chunks = encode_dataframe(df, key_col="k", num_partitions=2)
    only_k = chunks.filter(F.col("column") == "k")
    with _pytest.raises(Exception, match="incomplete chunk group"):
        decode_dataframe(only_k, df.schema).collect()


def test_summarize_chunks_column_filtered_rows(spark):
    """n_rows must come from the chunk-group grain, not col_idx == 0:
    a column-filtered feed yields the true count instead of 0."""
    import pyspark.sql.functions as F

    from osm_pbf_parquet_spark.operators.encode import encode_dataframe
    from osm_pbf_parquet_spark.plans.manifest import summarize_chunks

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    chunks = encode_dataframe(df, key_col="k", num_partitions=2).cache()
    full = summarize_chunks(chunks).agg(F.sum("n_rows")).collect()[0][0]
    # drop the col_idx==0 rows entirely: count must be unchanged
    filtered = summarize_chunks(chunks.filter(F.col("col_idx") != 0))
    part = filtered.agg(F.sum("n_rows")).collect()[0][0]
    assert full == 500 and part == 500
    chunks.unpersist()


def test_decode_rejects_colliding_runs_even_when_adjacent(spark):
    """A chunk store holding two runs WITHOUT run_id that share
    (partition_id, chunk_seq) must fail decode even when one run's
    cells complete a group before the other's arrive (review r2: the
    eager-emit path silently returned duplicate rows)."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
    )

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    chunks = encode_dataframe(df, key_col="k", num_partitions=1)
    doubled = chunks.union(chunks).coalesce(1)
    with _pytest.raises(Exception, match="colliding runs"):
        decode_dataframe(doubled, df.schema, num_partitions=1).collect()


def test_decode_narrowed_schema_needs_filtered_feed(spark):
    """A narrowed schema over an UNFILTERED chunk feed must raise (not
    mislabel whichever column completes a group first)."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from pyspark.sql import types as T

    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
    )

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    chunks = encode_dataframe(df, key_col="k", num_partitions=1)
    narrow = T.StructType([df.schema["v"]])
    with _pytest.raises(Exception, match="columns|colliding"):
        decode_dataframe(chunks, narrow, num_partitions=1).collect()


def test_read_chunks_tolerates_pre_bloom_files(spark, tmp_path):
    """r3 advice: chunk dirs can mix files written before a metadata
    column existed (e.g. stat_bloom); schema inference could pick the
    old file's schema and drop the column. read_chunks reads with the
    explicit store schema: absent columns come back as NULLs."""
    from pyspark.sql import functions as F

    from osm_pbf_parquet_spark.plans.manifest import (
        chunks_dir,
        encode_job,
        read_chunks,
        read_encoded,
    )

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = str(tmp_path / "store")
    encode_job(spark, df, out, key_col="k", num_partitions=2)
    # simulate a pre-stat_bloom store file: rewrite one chunk file
    # without the stat_bloom column
    import glob

    import pyarrow.parquet as pq

    f = sorted(glob.glob(f"{chunks_dir(out)}/*.parquet"))[0]
    tbl = pq.read_table(f)
    pq.write_table(tbl.drop_columns(["stat_bloom"]), f)
    # drop the Hadoop checksum sidecar invalidated by the rewrite
    import os

    crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    chunks = read_chunks(spark, out)
    assert "stat_bloom" in chunks.columns
    assert chunks.filter(F.col("stat_bloom").isNotNull()).count() == 0
    dec = read_encoded(spark, out, df.schema)
    assert dec.count() == 100
