"""Row-level MERGE (copy-on-write upsert/delete) on the chunk store.

The reference sink is append-only (src/sink.rs:75-94); merge is part of
this engine's Iceberg-table upgrade: re-crawls (upsert by url) and
takedowns (delete by url) must rewrite ONLY the touched partitions and
supersede atomically via the manifest's last-wins rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pbf_parquet_spark.plans.manifest import (
    encode_job,
    read_encoded,
    read_manifest,
)
from osm_pbf_parquet_spark.plans.merge import merge_job

N_PARTS = 8


def _bit_identical(src, dec, key="url"):
    assert dec.count() == src.count()
    joined = src.alias("a").join(dec.alias("b"), key)
    cols = [c for c in src.columns if c != key]
    ok = joined.filter(
        F.expr(" AND ".join(f"a.{c} <=> b.{c}" for c in cols))
    ).count()
    assert ok == src.count()


def test_upsert_and_delete(spark, pages_path, tmp_path):
    out = str(tmp_path / "store")
    src = spark.read.parquet(pages_path)
    encode_job(spark, src, out, key_col="url", num_partitions=N_PARTS)

    # upsert: re-crawl 100 urls with new text; insert 50 brand-new urls
    recrawl = (
        src.limit(100)
        .withColumn("text", F.concat(F.col("text"), F.lit(" [v2]")))
    )
    fresh = (
        src.limit(50)
        .withColumn("url", F.concat(F.lit("https://new.example/"), F.col("url")))
    )
    updates = recrawl.unionByName(fresh)
    # delete: takedown 40 OTHER urls (merge_job refuses overlapping
    # update/delete key sets, so make "other" explicit)
    doomed = (
        src.select("url")
        .join(updates.select("url"), "url", "left_anti")
        .orderBy(F.desc("url"))
        .limit(40)
    )

    stats = merge_job(
        spark, out, src.schema, updates=updates, deletes=doomed,
        key_col="url", num_partitions=N_PARTS,
    )
    assert stats["upserted"] == 150
    assert stats["deleted"] == 40

    expected = (
        src.join(updates.select("url"), "url", "left_anti")
        .join(doomed, "url", "left_anti")
        .unionByName(updates)
    )
    dec = read_encoded(spark, out, src.schema)
    _bit_identical(expected, dec)


def test_delete_all_rows_of_partition_tombstones(spark, pages_path, tmp_path):
    out = str(tmp_path / "store2")
    src = spark.read.parquet(pages_path).limit(200).cache()
    encode_job(spark, src, out, key_col="url", num_partitions=2)

    # wipe out every row of one partition: delete all urls routed there
    from osm_pbf_parquet_spark.operators.encode import (
        PID_COL,
        with_partition_id,
    )

    with_pid = with_partition_id(src, "url", 2)
    victims = with_pid.filter(F.col(PID_COL) == 0).select("url")
    n_victims = victims.count()
    assert n_victims > 0

    merge_job(spark, out, src.schema, deletes=victims,
              key_col="url", num_partitions=2)

    dec = read_encoded(spark, out, src.schema)
    assert dec.count() == src.count() - n_victims
    assert dec.join(victims, "url", "left_semi").count() == 0, (
        "tombstoned partition's old chunks must be invisible"
    )
    # manifest's latest row for pid 0 is the explicit empty commit
    m = read_manifest(spark, out)
    row = m.filter(F.col("partition_id") == 0).collect()[0]
    assert row["n_rows"] == 0 and row["status"] == "done"


def test_merge_is_partition_scoped(spark, pages_path, tmp_path):
    """Untouched partitions keep their original run_id — merge must
    not rewrite the whole table."""
    out = str(tmp_path / "store3")
    src = spark.read.parquet(pages_path)
    encode_job(spark, src, out, key_col="url", num_partitions=N_PARTS)
    before = {
        r["partition_id"]: r["run_id"]
        for r in read_manifest(spark, out).collect()
    }

    one = src.limit(1).withColumn("text", F.lit("changed"))
    merge_job(spark, out, src.schema, updates=one,
              key_col="url", num_partitions=N_PARTS)

    after = {
        r["partition_id"]: r["run_id"]
        for r in read_manifest(spark, out).collect()
    }
    changed = [p for p in before if after[p] != before[p]]
    assert len(changed) == 1, f"merge touched {len(changed)} partitions"


def test_merge_rejects_key_in_both_update_and_delete(spark, pages_path, tmp_path):
    """r3 advice: a key in both sets would silently resolve to the
    upsert (delete ignored) — merge_job must refuse."""
    import pytest

    out = str(tmp_path / "store")
    src = spark.read.parquet(pages_path)
    encode_job(spark, src, out, key_col="url", num_partitions=N_PARTS)
    both = src.limit(5)
    with pytest.raises(ValueError, match="BOTH updates and deletes"):
        merge_job(
            spark, out, src.schema,
            updates=both.withColumn("text", F.lit("x")),
            deletes=both.select("url"),
            key_col="url", num_partitions=N_PARTS,
        )


def test_merge_validates_store_routing(spark, pages_path, tmp_path):
    """r3 advice: a merge with mismatched num_partitions routes change
    keys to different pids — stale rows survive in untouched
    partitions. The store records its routing contract at first commit
    and later writers are validated against it."""
    import pytest

    out = str(tmp_path / "store")
    src = spark.read.parquet(pages_path)
    encode_job(spark, src, out, key_col="url", num_partitions=N_PARTS)
    upd = src.limit(3).withColumn("text", F.lit("y"))
    with pytest.raises(ValueError, match="num_partitions"):
        merge_job(spark, out, src.schema, updates=upd,
                  key_col="url", num_partitions=N_PARTS * 2)
    with pytest.raises(ValueError, match="key_col"):
        merge_job(spark, out, src.schema, updates=upd,
                  key_col="text", num_partitions=N_PARTS)
    # resume with mismatched routing is refused too
    with pytest.raises(ValueError, match="routing mismatch"):
        encode_job(spark, src, out, key_col="url",
                   num_partitions=N_PARTS * 2)
