"""Per-chunk Bloom filters: point-lookup pruning on high-cardinality
keys, where zone maps are blind (a url-hash-partitioned store's every
chunk spans the full key range).

Guarantees under test: NO false negatives ever (a pruned-away group
provably lacks the key), low false-positive rate (wasted decodes), and
end-to-end: lookup-by-key decodes ~1 chunk group instead of all.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_probe_positions,
)
from osm_pbf_parquet_spark.operators.encode import (
    decode_dataframe,
    encode_dataframe,
)
from osm_pbf_parquet_spark.operators.pruning import prune_by_point


# ---- kernel ----

def test_no_false_negatives_strings():
    urls = [f"https://example.com/{i}?q={i * 7}" for i in range(20_000)]
    blob = bloom_build(pa.array(urls))
    for u in urls[::97]:
        h1, h2 = bloom_probe_positions(u, pa.string())
        assert bloom_might_contain(blob, h1, h2)


def test_many_probe_matches_scalar_probe():
    """r5 verdict #4: the metadata-scan probe is vectorized over the
    stacked blob buffer. Contract: bloom_might_contain_many ==
    [bloom_might_contain(b) for b] on mixed-geometry blobs (different
    m/k per chunk), None/empty blobs → True."""
    from osm_pbf_parquet_spark.functions.bloom import (
        bloom_might_contain_many,
    )

    blobs = [
        bloom_build(pa.array([f"u{i}" for i in range(n)]), k=k)
        for n, k in [(3, 7), (500, 7), (40, 3), (1, 1), (1000, 5)]
    ] + [None, b""]
    for probe_val in ["u1", "u499", "absent-key", ""]:
        h1, h2 = bloom_probe_positions(probe_val, pa.string())
        want = [
            bloom_might_contain(b, h1, h2) if b else True for b in blobs
        ]
        got = bloom_might_contain_many(blobs, h1, h2)
        assert list(got) == want, probe_val
    assert list(bloom_might_contain_many([], 1, 2)) == []
    assert list(bloom_might_contain_many([None, b""], 1, 2)) == [True, True]


def test_false_positive_rate_bounded():
    blob = bloom_build(pa.array([f"k{i}" for i in range(10_000)]))
    fp = sum(
        bloom_might_contain(blob, *bloom_probe_positions(f"absent{i}", pa.string()))
        for i in range(3_000)
    )
    assert fp / 3_000 < 0.03


@pytest.mark.parametrize(
    "values,probe,dtype",
    [
        ([1, 2, 3, 10**12], 10**12, pa.int64()),
        ([1.5, -0.0, 3.25], 1.5, pa.float64()),
        (["", "a", None], "", pa.string()),
        ([b"\x00\xff", b"xyz"], b"\x00\xff", pa.binary()),
    ],
)
def test_kernel_membership_edge_types(values, probe, dtype):
    blob = bloom_build(pa.array(values, type=dtype))
    assert bloom_might_contain(blob, *bloom_probe_positions(probe, dtype))


def test_empty_and_all_null_columns():
    assert bloom_build(pa.array([], type=pa.string())) is not None
    blob = bloom_build(pa.array([None, None], type=pa.int64()))
    # nothing was added — absent keys should (almost surely) miss
    h1, h2 = bloom_probe_positions(42, pa.int64())
    assert not bloom_might_contain(blob, h1, h2)


# ---- e2e over the chunk store ----

def test_point_lookup_prunes_to_few_groups(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    target = pages.select("url").first()["url"]
    chunks = encode_dataframe(
        pages, key_col="url", num_partitions=8,
        target_chunk_bytes=256 << 10, bloom_cols=["url"],
    ).cache()
    total = chunks.select("partition_id", "chunk_seq").distinct().count()
    kept_chunks = prune_by_point(chunks, "url", target).cache()
    kept = kept_chunks.select("partition_id", "chunk_seq").distinct().count()
    assert kept < max(2, total // 4), (
        f"bloom pruning kept {kept}/{total} groups for a point lookup"
    )
    # no false negatives: the row is still there, bit-identical
    row = (
        decode_dataframe(kept_chunks, pages.schema)
        .filter(F.col("url") == target)
        .collect()
    )
    assert len(row) == 1
    src = pages.filter(F.col("url") == target).collect()[0]
    assert row[0] == src


def test_absent_key_usually_prunes_everything(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    chunks = encode_dataframe(
        pages, key_col="url", num_partitions=8,
        target_chunk_bytes=256 << 10, bloom_cols=["url"],
    ).cache()
    kept = (
        prune_by_point(chunks, "url", "https://definitely-absent.example/x")
        .select("partition_id", "chunk_seq").distinct().count()
    )
    total = chunks.select("partition_id", "chunk_seq").distinct().count()
    assert kept <= max(1, total // 8)


def test_no_bloom_means_no_pruning(spark, pages_path):
    """Stores without filters must be conservatively kept whole."""
    pages = spark.read.parquet(pages_path).limit(500)
    chunks = encode_dataframe(pages, key_col="url", num_partitions=4).cache()
    total = chunks.select("partition_id", "chunk_seq").distinct().count()
    kept = (
        prune_by_point(chunks, "url", "anything")
        .select("partition_id", "chunk_seq").distinct().count()
    )
    assert kept == total


def test_compaction_rebuilds_blooms(spark, pages_path, tmp_path):
    from osm_pbf_parquet_spark.plans.compact import compact_partitions
    from osm_pbf_parquet_spark.plans.manifest import encode_job, read_encoded

    out = str(tmp_path / "store")
    src = spark.read.parquet(pages_path)
    encode_job(
        spark, src, out, key_col="url", num_partitions=4,
        target_chunk_bytes=128 << 10, bloom_cols=["url"],
    )
    compact_partitions(
        spark, out, min_chunks=2, bloom_cols=["url"],
        target_chunk_bytes=4 << 20,
    )
    dec = read_encoded(spark, out, src.schema)
    assert dec.count() == src.count()
    # the compacted chunks still carry url blooms
    from osm_pbf_parquet_spark.plans.manifest import chunks_dir

    chunks = spark.read.parquet(chunks_dir(out))
    with_bloom = chunks.filter(
        (F.col("column") == "url") & F.col("stat_bloom").isNotNull()
    ).count()
    assert with_bloom > 0


def test_numeric_probe_coerces_to_stored_type(spark):
    """r3 advice: an int literal probed against a FLOAT column must hash
    the stored column's type family — as-inferred hashing would return a
    definitive 'no' and silently prune matching rows."""
    import pyspark.sql.types as T

    df = spark.createDataFrame(
        [(float(i), i) for i in range(200)],
        T.StructType([
            T.StructField("v", T.DoubleType()),
            T.StructField("k", T.LongType()),
        ]),
    )
    chunks = encode_dataframe(
        df, key_col="k", num_partitions=4,
        target_chunk_bytes=4 << 10, bloom_cols=["v"],
    ).cache()
    # int literal 3, stored column double: schema-driven coercion
    kept = prune_by_point(chunks, "v", 3, value_type=df.schema)
    rows = (
        decode_dataframe(kept, df.schema).filter(F.col("v") == 3.0).collect()
    )
    assert len(rows) == 1 and rows[0]["k"] == 3

    # ambiguous numeric probe without a type is an error, not a guess
    import pytest

    with pytest.raises(ValueError, match="value_type"):
        prune_by_point(chunks, "v", 3)

    # lossy literal against an int column raises instead of mis-hashing
    chunks_k = encode_dataframe(
        df, key_col="k", num_partitions=4,
        target_chunk_bytes=4 << 10, bloom_cols=["k"],
    ).cache()
    with pytest.raises(Exception):
        prune_by_point(chunks_k, "k", 3.5, value_type=df.schema)


def test_vectorized_probe_rejects_truncated_and_zero_m_blobs():
    """r6 review: without per-blob bounds checks the stacked-buffer
    probe read the NEXT blob's bytes for a truncated filter (silently
    pruning a chunk that contains the value) and divided by zero on a
    m=0 header; the scalar twin fails honestly, so must this path."""
    import struct

    import pyarrow as pa
    import pytest

    from osm_pbf_parquet_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain_many,
        bloom_probe_positions,
    )

    good = bloom_build(pa.array([1, 2, 3], pa.int64()))
    h1, h2 = bloom_probe_positions(2, pa.int64())
    assert bloom_might_contain_many([good, good], h1, h2).all()

    with pytest.raises(ValueError, match="truncated"):
        bloom_might_contain_many([good, good[:5]], h1, h2)
    with pytest.raises(ValueError, match="truncated"):
        bloom_might_contain_many([good[:12], good], h1, h2)
    zero_m = struct.pack("<QB", 0, 7)
    with pytest.raises(ValueError, match="zero-size|truncated"):
        bloom_might_contain_many([zero_m, good], h1, h2)
    absurd = struct.pack("<QB", 1 << 63, 7) + b"\xff" * 8
    with pytest.raises(ValueError, match="absurd"):
        bloom_might_contain_many([absurd], h1, h2)
