"""Vacuum GC + metadata-only aggregates over the chunk store."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators.encode import encode_dataframe
from osm_pbf_parquet_spark.operators.pruning import store_count, store_minmax
from osm_pbf_parquet_spark.plans.compact import compact_partitions
from osm_pbf_parquet_spark.plans.manifest import (
    chunks_dir,
    encode_job,
    read_encoded,
)
from osm_pbf_parquet_spark.plans.vacuum import vacuum


def _chunk_files(out_dir: str) -> set[str]:
    cdir = chunks_dir(out_dir)
    found = set()
    for root, _, files in os.walk(cdir):
        for f in files:
            if f.endswith(".parquet"):
                found.add(os.path.join(root, f))
    return found


def test_vacuum_reclaims_superseded_chunks(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "store")
    encode_job(spark, src, out, key_col="doc_id", num_partitions=4,
               target_chunk_bytes=16 << 10)
    before = _chunk_files(out)
    # compaction supersedes every partition → the original files die
    res = compact_partitions(spark, out, min_chunks=2)
    assert res["compacted_partitions"] > 0
    stats = vacuum(spark, out, older_than_s=0.0)
    assert stats["files_deleted"] > 0
    assert stats["bytes_reclaimed"] > 0
    after = _chunk_files(out)
    assert after < before | after  # something removed, nothing added
    # the committed view still decodes identically
    decoded = read_encoded(spark, out, src.schema)
    assert decoded.count() == src.count()
    a = {r["doc_id"] for r in src.select("doc_id").collect()}
    b = {r["doc_id"] for r in decoded.select("doc_id").collect()}
    assert a == b
    # vacuum record committed
    assert any(
        f.endswith(".parquet") for f in os.listdir(os.path.join(out, "vacuum"))
    )


def test_vacuum_keeps_live_and_young_files(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "store2")
    encode_job(spark, src, out, key_col="doc_id", num_partitions=4)
    before = _chunk_files(out)
    # nothing superseded → nothing deleted even at horizon 0
    stats = vacuum(spark, out, older_than_s=0.0)
    assert stats["files_deleted"] == 0
    assert _chunk_files(out) == before
    # superseded BUT young (default 24h retention) → kept
    compact_partitions(spark, out, min_chunks=2)
    mid = _chunk_files(out)
    stats = vacuum(spark, out)  # default older_than_s = 24h
    assert stats["files_deleted"] == 0
    assert _chunk_files(out) == mid


def test_vacuum_dry_run_deletes_nothing(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "store3")
    encode_job(spark, src, out, key_col="doc_id", num_partitions=4,
               target_chunk_bytes=16 << 10)
    compact_partitions(spark, out, min_chunks=2)
    before = _chunk_files(out)
    stats = vacuum(spark, out, older_than_s=0.0, dry_run=True)
    assert stats["candidates"] > 0
    assert stats["files_deleted"] == 0
    assert _chunk_files(out) == before
    assert not os.path.isdir(os.path.join(out, "vacuum"))


def test_store_report_sums_match_store(spark, sf_dir):
    from osm_pbf_parquet_spark.operators.pruning import store_report

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = encode_dataframe(
        src, key_col="doc_id", num_partitions=4, target_chunk_bytes=32 << 10
    ).cache()
    try:
        rep = store_report(chunks).collect()
        assert {r["column"] for r in rep} == set(src.columns)
        tot = chunks.agg(
            F.sum("bytes_in").alias("bi"), F.sum("bytes_out").alias("bo")
        ).collect()[0]
        assert sum(r["bytes_in"] for r in rep) == tot["bi"]
        assert sum(r["bytes_out"] for r in rep) == tot["bo"]
        for r in rep:
            assert r["chunks"] > 0 and r["rows"] > 0
            assert 0 < r["ratio"]
    finally:
        chunks.unpersist()


def test_store_count_and_minmax_from_metadata(spark, sf_dir):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = encode_dataframe(
        src, key_col="doc_id", num_partitions=4, target_chunk_bytes=32 << 10
    ).cache()
    try:
        n = store_count(chunks).collect()[0]["n"]
        assert n == src.count()
        mm = store_minmax(chunks, "n_chars").collect()[0]
        exp = src.agg(
            F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
        ).collect()[0]
        assert mm["min_value"] == float(exp["lo"])
        assert mm["max_value"] == float(exp["hi"])
        # string column, lexicographic
        ms = store_minmax(chunks, "lang", numeric=False).collect()[0]
        es = src.agg(F.min("lang").alias("lo"), F.max("lang").alias("hi")).collect()[0]
        assert ms["min_value"] == es["lo"]
        assert ms["max_value"] == es["hi"]
    finally:
        chunks.unpersist()


def test_time_travel_past_vacuum_horizon_fails_clearly(spark, tmp_path):
    """r6 review: after vacuum physically removes superseded files,
    an as_of read into the vacuumed window must fail with a clear
    'no longer served' error (detected via the vacuum record), not an
    opaque missing-file scan exception — and a same-window
    incremental replay likewise."""
    import time as _time

    import pytest as _pytest

    import pyspark.sql.functions as F

    from osm_pbf_parquet_spark.plans.compact import compact_partitions
    from osm_pbf_parquet_spark.plans.manifest import (
        encode_job,
        read_encoded,
        read_incremental,
    )
    from osm_pbf_parquet_spark.plans.vacuum import vacuum

    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    out = str(tmp_path / "ttv")
    encode_job(spark, df, out, key_col="k", num_partitions=4,
               target_chunk_bytes=512)
    t_pre = _time.time()
    _time.sleep(0.05)
    compact_partitions(spark, out, min_chunks=1)
    assert vacuum(spark, out, older_than_s=0.0)["files_deleted"] > 0

    with _pytest.raises(ValueError, match="no longer served"):
        read_encoded(spark, out, df.schema, as_of=t_pre)
    with _pytest.raises(ValueError, match="no longer served"):
        read_incremental(spark, out, df.schema, since=0.0, until=t_pre)
    # the current view is unaffected, and — r6 review — an as_of
    # AFTER the superseding (compaction) commit is still fully
    # servable: the cutoff is the superseding-commit time, NOT the
    # vacuum's mtime retention horizon (which is ~now here)
    assert read_encoded(spark, out, df.schema).count() == 200
    assert read_encoded(
        spark, out, df.schema, as_of=_time.time()
    ).count() == 200


def test_partial_vacuum_keeps_mid_history_views_servable(spark, tmp_path):
    """r6 review (over-block): the serving cutoff must be each deleted
    file's DIRECT-successor commit, not the partition's newest commit.
    Store history: encode A → compact C1 → compact C2. A partial
    vacuum whose mtime horizon removes only A's files must leave an
    as_of inside [C1, C2) fully servable (C1's files survive), while
    as_of before C1 fails clearly."""
    import time as _time

    import pytest as _pytest

    import pyspark.sql.functions as F

    from osm_pbf_parquet_spark.plans.compact import compact_partitions
    from osm_pbf_parquet_spark.plans.manifest import (
        encode_job,
        read_encoded,
    )
    from osm_pbf_parquet_spark.plans.vacuum import vacuum

    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    out = str(tmp_path / "midhist")
    encode_job(spark, df, out, key_col="k", num_partitions=4,
               target_chunk_bytes=512)
    t_a_done = _time.time()
    _time.sleep(1.1)
    assert compact_partitions(spark, out, min_chunks=1)[
        "compacted_partitions"] > 0
    t_c1_done = _time.time()
    _time.sleep(1.1)
    assert compact_partitions(spark, out, min_chunks=1)[
        "compacted_partitions"] > 0

    # horizon between A's files and C1's files: only A gets deleted
    gc = vacuum(spark, out, older_than_s=_time.time() - (t_a_done + 0.5))
    assert gc["files_deleted"] > 0

    # inside [C1, C2): C1's files survived — must be servable
    assert read_encoded(spark, out, df.schema, as_of=t_c1_done).count() == 200
    # before C1: A's files are gone — clear refusal
    with _pytest.raises(ValueError, match="no longer served"):
        read_encoded(spark, out, df.schema, as_of=t_a_done)
    # current view untouched
    assert read_encoded(spark, out, df.schema).count() == 200
