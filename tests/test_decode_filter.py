"""Worker-side row_filter pushdown in decode (operators/encode.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators.encode import (
    decode_dataframe,
    encode_dataframe,
)


@pytest.fixture(scope="module")
def doc_chunks(spark, sf_dir):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = encode_dataframe(
        src, key_col="doc_id", num_partitions=4, target_chunk_bytes=32 << 10
    ).cache()
    chunks.count()
    yield src, chunks
    chunks.unpersist()


def test_point_filter_matches_spark_filter(spark, doc_chunks):
    src, chunks = doc_chunks
    target = src.select("doc_id").first()["doc_id"]
    pushed = decode_dataframe(
        chunks, src.schema, row_filter=[("doc_id", "==", target)]
    ).filter(F.col("doc_id") == target)
    plain = decode_dataframe(chunks, src.schema).filter(
        F.col("doc_id") == target
    )
    assert sorted(map(tuple, pushed.collect())) == sorted(
        map(tuple, plain.collect())
    )
    assert pushed.count() == 1


def test_range_conjuncts_match(spark, doc_chunks):
    src, chunks = doc_chunks
    flt = [("n_chars", ">=", 50), ("n_chars", "<", 200)]
    pushed = decode_dataframe(chunks, src.schema, row_filter=flt)
    expected = src.filter((F.col("n_chars") >= 50) & (F.col("n_chars") < 200))
    a = sorted(r["doc_id"] for r in pushed.collect())
    b = sorted(r["doc_id"] for r in expected.collect())
    assert a == b


def test_string_eq_and_null_semantics(spark, doc_chunks):
    """Null lang rows must NOT pass a lang == literal filter (SQL
    WHERE), and non-null matches must all survive."""
    src, chunks = doc_chunks
    lang = src.filter(F.col("lang").isNotNull()).select("lang").first()["lang"]
    pushed = decode_dataframe(
        chunks, src.schema, row_filter=[("lang", "==", lang)]
    )
    assert pushed.filter(F.col("lang").isNull()).count() == 0
    assert (
        pushed.count()
        == src.filter(F.col("lang") == lang).count()
    )


def test_unfiltered_decode_unchanged(spark, doc_chunks):
    src, chunks = doc_chunks
    assert decode_dataframe(chunks, src.schema).count() == src.count()


def test_bad_filter_rejected(spark, doc_chunks):
    src, chunks = doc_chunks
    with pytest.raises(Exception, match="row_filter"):
        decode_dataframe(
            chunks, src.schema, row_filter=[("nope", "==", 1)]
        ).count()
    with pytest.raises(Exception, match="row_filter"):
        decode_dataframe(
            chunks, src.schema, row_filter=[("doc_id", "~", 1)]
        ).count()
