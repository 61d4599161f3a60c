"""Skew handling: the pathological host (~20% of rows in the fixture)
must be split across partitions; salted pids must stay deterministic
(resume depends on it) and balanced."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators.encode import (
    PID_COL,
    decode_dataframe,
    encode_dataframe,
)
from osm_pbf_parquet_spark.operators.partitioning import (
    host_col,
    partition_balance,
    salted_pids,
)
from osm_pbf_parquet_spark.sources.pages import HEAVY_HOST

N = 16


def test_unsalted_host_partitioning_is_skewed(spark, pages_path):
    df = spark.read.parquet(pages_path)
    naive = df.withColumn(
        PID_COL, F.pmod(F.xxhash64(host_col()), F.lit(N)).cast("long")
    )
    assert partition_balance(naive)["skew"] > 2.0, "fixture should be skewed"


def test_salted_pids_balance(spark, pages_path):
    df = spark.read.parquet(pages_path)
    salted = salted_pids(df, num_partitions=N)
    bal = partition_balance(salted)
    assert bal["n_partitions"] == N
    assert bal["skew"] < 1.8, bal


def test_heavy_host_is_split(spark, pages_path):
    df = spark.read.parquet(pages_path)
    salted = salted_pids(df, num_partitions=N)
    heavy_parts = (
        salted.filter(host_col() == HEAVY_HOST).select(PID_COL).distinct().count()
    )
    assert heavy_parts >= 3, f"heavy host landed in only {heavy_parts} partitions"


def test_salted_pids_deterministic(spark, pages_path):
    df = spark.read.parquet(pages_path)
    a = salted_pids(df, num_partitions=N).select("url", PID_COL)
    b = salted_pids(df, num_partitions=N).select("url", PID_COL)
    diff = a.alias("a").join(b.alias("b"), "url").filter(
        f"a.{PID_COL} != b.{PID_COL}"
    ).count()
    assert diff == 0


def test_encode_with_salted_pids_roundtrip(spark, pages_path):
    df = spark.read.parquet(pages_path)
    salted = salted_pids(df, num_partitions=N)
    chunks = encode_dataframe(salted, num_partitions=N)
    dec = decode_dataframe(chunks, df.schema)
    assert dec.count() == df.count()
    joined = df.alias("a").join(dec.alias("b"), "url")
    cols = [c for c in df.columns if c != "url"]
    ok = joined.filter(F.expr(" AND ".join(f"a.{c} <=> b.{c}" for c in cols))).count()
    assert ok == df.count()


def test_range_pids_cluster_and_prune(spark, sf_dir):
    """Range partitioning globally clusters values: each pid covers a
    disjoint range, zone maps then skip most chunk groups for a range
    predicate, and the decode equals the plain filter."""
    import pyspark.sql.functions as F

    from osm_pbf_parquet_spark.operators.encode import (
        PID_COL,
        decode_dataframe,
        encode_dataframe,
    )
    from osm_pbf_parquet_spark.operators.partitioning import range_pids
    from osm_pbf_parquet_spark.operators.pruning import prune_by_range

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with_pid = range_pids(ev, "value", num_partitions=8)
    # disjoint ranges per pid: max(value) of pid k <= min(value) of pid k+1
    spans = (
        with_pid.groupBy(PID_COL)
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .orderBy(PID_COL)
        .collect()
    )
    assert len(spans) >= 6
    for a, b in zip(spans, spans[1:]):
        assert a["hi"] <= b["lo"], f"overlapping ranges: {a} vs {b}"
    chunks = encode_dataframe(
        with_pid, num_partitions=8, target_chunk_bytes=8 << 10
    ).cache()
    n_groups = chunks.select("partition_id", "chunk_seq").distinct().count()
    lo = spans[0]["hi"]  # a range inside the first partition only
    pruned = prune_by_range(chunks, "value", upper=float(lo))
    kept = pruned.select("partition_id", "chunk_seq").distinct().count()
    assert kept < n_groups / 2, f"range layout did not prune: {kept}/{n_groups}"
    dec = decode_dataframe(pruned, ev.schema).filter(F.col("value") <= lo)
    want = ev.filter(F.col("value") <= lo)
    assert sorted(r["event_id"] for r in dec.collect()) == sorted(
        r["event_id"] for r in want.collect()
    )
    chunks.unpersist()
