"""Lineage manifest + idempotent resume (north_rule checkpoint/restart).

Simulates the crash the reference cannot survive (its progress lives in
in-memory counters, reference src/pbf.rs:54-58): encode k of N
partitions, "crash", re-run, and require (a) no duplicate work, (b) a
final decoded table bit-identical to the source, (c) orphan chunks from
uncommitted runs invisible to readers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pbf_parquet_spark.plans.manifest import (
    encode_job,
    read_encoded,
    read_manifest,
)

N_PARTS = 8


def test_resume_after_partial_run(spark, pages_path, tmp_path):
    out = str(tmp_path / "enc")
    src = spark.read.parquet(pages_path)

    r1 = encode_job(
        spark, src, out, key_col="url", num_partitions=N_PARTS,
        fail_after_partitions=3,
    )
    assert r1["partitions"] == 3
    m1 = read_manifest(spark, out)
    assert m1.count() == 3

    r2 = encode_job(spark, src, out, key_col="url", num_partitions=N_PARTS)
    assert r2["partitions"] == N_PARTS - 3, "resume must not redo done partitions"

    m2 = read_manifest(spark, out)
    assert m2.count() == N_PARTS
    assert (
        m2.groupBy("partition_id").count().filter("count > 1").count() == 0
    ), "duplicate manifest entries"

    dec = read_encoded(spark, out, src.schema)
    assert dec.count() == src.count()
    joined = src.alias("a").join(dec.alias("b"), "url")
    cols = [c for c in src.columns if c != "url"]
    ok = joined.filter(
        F.expr(" AND ".join(f"a.{c} <=> b.{c}" for c in cols))
    ).count()
    assert ok == src.count()


def test_rerun_is_noop(spark, pages_path, tmp_path):
    out = str(tmp_path / "enc2")
    src = spark.read.parquet(pages_path)
    r1 = encode_job(spark, src, out, key_col="url", num_partitions=4)
    assert r1["partitions"] == 4
    r2 = encode_job(spark, src, out, key_col="url", num_partitions=4)
    assert r2["partitions"] == 0, "full re-run must be a no-op"
    assert read_manifest(spark, out).count() == 4


def test_manifest_records_codecs_and_sizes(spark, pages_path, tmp_path):
    import json

    out = str(tmp_path / "enc3")
    src = spark.read.parquet(pages_path)
    encode_job(spark, src, out, key_col="url", num_partitions=4)
    m = read_manifest(spark, out).collect()
    for row in m:
        codecs = json.loads(row["codecs"])
        assert set(codecs) == set(src.columns)
        assert row["bytes_in"] > 0 and row["bytes_out"] > 0
        assert row["n_rows"] > 0 and row["status"] == "done"
    total = sum(r["n_rows"] for r in m)
    assert total == src.count()


def test_file_rotation_bounds_chunk_files(spark, tmp_path):
    """B4 parity (reference src/sink.rs:75-94): physical chunk-parquet
    files rotate near rotate_bytes — no file may exceed ~2× the cap."""
    import glob
    import os

    import pyspark.sql.functions as F

    from osm_pbf_parquet_spark.plans.manifest import encode_job

    df = spark.range(0, 20000).select(
        F.col("id").alias("k"),
        # sha2-512 hex ≈ incompressible payload so size bounds bite
        F.sha2(F.col("id").cast("string"), 512).alias("v"),
    )
    out = str(tmp_path / "rot")
    rotate = 256 << 10
    stats = encode_job(
        spark, df, out, key_col="k", num_partitions=4,
        target_chunk_bytes=128 << 10, rotate_bytes=rotate,
    )
    assert stats["rows"] == 20000
    files = glob.glob(f"{out}/chunks/**/part-*.parquet", recursive=True) or \
        glob.glob(f"{out}/chunks/part-*.parquet")
    sizes = [os.path.getsize(f) for f in files]
    assert len(files) > 4, f"rotation produced too few files: {len(files)}"
    assert max(sizes) <= 2 * rotate, f"file exceeds rotation bound: {max(sizes)}"


def test_snapshot_scoped_and_time_travel_reads(spark, tmp_path):
    """snapshot_id scopes a read to one epoch; as_of time-travels to
    the pre-compaction store state (Iceberg-style, append-only)."""
    import time as _time

    import pyspark.sql.functions as F

    from osm_pbf_parquet_spark.plans.compact import compact_partitions
    from osm_pbf_parquet_spark.plans.manifest import encode_job, read_encoded

    df1 = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    df2 = spark.range(300, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    out = str(tmp_path / "tt")
    encode_job(spark, df1, out, key_col="k", num_partitions=4,
               snapshot_id="epoch-1", target_chunk_bytes=512)
    t_between = _time.time()
    _time.sleep(0.05)
    encode_job(spark, df2, out, key_col="k", num_partitions=4,
               snapshot_id="epoch-2", target_chunk_bytes=4 << 10)

    # full read = union of epochs; scoped reads see only their epoch
    assert read_encoded(spark, out, df1.schema).count() == 500
    assert read_encoded(spark, out, df1.schema, snapshot_id="epoch-1").count() == 300
    assert read_encoded(spark, out, df1.schema, snapshot_id="epoch-2").count() == 200
    # time travel to before epoch-2 existed
    assert read_encoded(spark, out, df1.schema, as_of=t_between).count() == 300

    # compaction supersedes epoch-1's chunks, but as_of still resolves
    # to the pre-compaction rows (append-only: nothing was deleted)
    stats = compact_partitions(spark, out, snapshot_id="epoch-1", min_chunks=2)
    assert stats["compacted_partitions"] > 0
    assert read_encoded(spark, out, df1.schema, snapshot_id="epoch-1").count() == 300
    before = read_encoded(spark, out, df1.schema, as_of=t_between)
    assert sorted(r["k"] for r in before.collect()) == list(range(300))


def test_compact_manifest_preserves_resolution_and_time_travel(
    spark, pages_path, tmp_path
):
    """r6 review: manifest parts accumulate one per commit, making
    every read_manifest O(#commits) round trips on an object store.
    compact_manifest folds them into ONE part; default keeps full
    history (as_of unchanged), squash keeps only last-wins rows —
    resolved view identical either way."""
    import os as _os
    import time as _time

    from osm_pbf_parquet_spark.plans.manifest import (
        compact_manifest,
        encode_job,
        read_encoded,
        read_manifest,
    )
    from osm_pbf_parquet_spark.plans.merge import merge_job

    src = spark.read.parquet(pages_path).limit(200)
    out = str(tmp_path / "mstore")
    encode_job(spark, src, out, key_col="url", num_partitions=4)
    t_mid = _time.time()
    _time.sleep(0.05)
    upd = src.limit(7).withColumn("text", F.concat("text", F.lit(" v2")))
    merge_job(spark, out, src.schema, updates=upd, key_col="url")
    upd2 = src.limit(3).withColumn("text", F.concat("text", F.lit(" v3")))
    merge_job(spark, out, src.schema, updates=upd2, key_col="url")

    mdir = _os.path.join(out, "manifest")
    parts_before = [
        f for f in _os.listdir(mdir) if f.endswith(".parquet")
    ]
    assert len(parts_before) >= 3
    want = {
        (r.partition_id, r.run_id, r.n_rows)
        for r in read_manifest(spark, out).collect()
    }
    want_asof = {
        (r.partition_id, r.run_id)
        for r in read_manifest(spark, out, as_of=t_mid).collect()
    }

    st = compact_manifest(spark, out)
    assert st["parts_before"] == len(parts_before)
    assert st["parts_after"] == 1 and st["rows_dropped"] == 0
    parts_after = [
        f for f in _os.listdir(mdir) if f.endswith(".parquet")
    ]
    assert len(parts_after) == 1
    got = {
        (r.partition_id, r.run_id, r.n_rows)
        for r in read_manifest(spark, out).collect()
    }
    assert got == want, "resolved manifest must be unchanged"
    got_asof = {
        (r.partition_id, r.run_id)
        for r in read_manifest(spark, out, as_of=t_mid).collect()
    }
    assert got_asof == want_asof, "history (time travel) preserved"

    # idempotent no-op below min_parts
    st2 = compact_manifest(spark, out)
    assert st2["parts_before"] == 1 and st2["parts_after"] == 1

    # squash: history rows drop, resolved view identical, reads work
    merge_job(
        spark, out, src.schema,
        updates=src.limit(2).withColumn(
            "text", F.concat("text", F.lit(" v4"))
        ),
        key_col="url",
    )
    st3 = compact_manifest(spark, out, squash=True)
    assert st3["rows_dropped"] > 0
    got3 = {
        (r.partition_id, r.run_id)
        for r in read_manifest(spark, out).collect()
    }
    # resolved winners after the 4th commit: same pids, maybe new runs
    assert {p for p, _ in got3} == {p for p, _, _ in want}
    assert read_encoded(spark, out, src.schema).count() == 200

    # squash on an ALREADY-compacted (single-part) manifest must still
    # run (it rewrites rows, not just file count) — r6 review
    st4 = compact_manifest(spark, out, squash=True)
    assert st4["rows"] is not None and st4["parts_after"] == 1


def test_file_level_manifest_excludes_zombie_and_legacy_falls_back(
    spark, pages_path, tmp_path
):
    """r6: manifest rows record each partition's chunk-file names
    (Iceberg-style file-level manifest). A zombie object — a dead
    task attempt's stray carrying a committed (pid, run_id) pair —
    must be invisible to reads (pre-tracking it silently DOUBLED
    rows) and vacuum must delete it despite the visible pair. Rows
    committed before tracking (files NULL) fall back to the listing
    path wholesale."""
    import glob
    import json as _json
    import shutil

    import pyarrow.parquet as _pq

    from osm_pbf_parquet_spark.plans.manifest import (
        encode_job,
        read_encoded,
        read_manifest,
    )
    from osm_pbf_parquet_spark.plans.vacuum import vacuum

    src = spark.read.parquet(pages_path).limit(150)
    out = str(tmp_path / "zstore")
    stats = encode_job(spark, src, out, key_col="url", num_partitions=3)
    run = stats["run_id"]
    mrows = read_manifest(spark, out).collect()
    assert all(r.files is not None for r in mrows)
    recorded = set()
    for r in mrows:
        recorded.update(_json.loads(r.files))
    cdir = str(tmp_path / "zstore" / "chunks")
    on_disk = {p.split("/")[-1] for p in glob.glob(f"{cdir}/*.parquet")}
    # subset, not equality: the JVM writer emits an empty part for a
    # zero-row task, which no chunk row (and so no manifest) references
    assert recorded and recorded <= on_disk

    # plant a zombie: a real chunk file under an unrecorded name,
    # same committed run_id inside
    victim = sorted(recorded)[0]  # a non-empty, referenced file
    zombie = f"part-{run}-zombiezombie.parquet"
    shutil.copy(f"{cdir}/{victim}", f"{cdir}/{zombie}")
    assert read_encoded(spark, out, src.schema).count() == 150, (
        "zombie must be invisible to the file-level read"
    )
    gc = vacuum(spark, out, older_than_s=0.0)
    assert gc["files_deleted"] == 1
    assert not glob.glob(f"{cdir}/{zombie}")
    assert read_encoded(spark, out, src.schema).count() == 150

    # legacy fallback: strip the files column from every manifest part
    mdir = str(tmp_path / "zstore" / "manifest")
    for p in glob.glob(f"{mdir}/*.parquet"):
        t = _pq.read_table(p)
        _pq.write_table(t.drop_columns(["files"]), p)
    legacy = read_manifest(spark, out)
    assert legacy.filter(F.col("files").isNotNull()).count() == 0
    assert read_encoded(spark, out, src.schema).count() == 150
