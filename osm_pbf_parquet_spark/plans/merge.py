"""Row-level MERGE (upsert + delete) on the encoded chunk store.

Iceberg-style copy-on-write: only the partitions a change touches are
rewritten — decode the affected partitions' current rows, drop rows
whose unique key appears in the updates/deletes, union the new rows,
re-encode, and append-commit. The manifest's last-wins rule
(manifest.read_manifest) makes the new per-partition rows supersede
the old ones atomically; a crash mid-merge leaves only invisible
orphan chunks (same guarantee as encode_job / compact_partitions).

The reference is append-only (src/sink.rs:75-94 rotates files, never
rewrites); row-level ops are part of this engine's mandated upgrade —
an Iceberg table of web pages gets re-crawls (upserts by url) and
takedowns (deletes by url) continuously.

Scale shape: the change set routes to partitions by the SAME
deterministic url-hash pid as the original encode, so only
|touched pids| partitions are decoded and re-encoded — cost is
O(changed partitions), not O(table). The anti-join's right side is
the change-key set (broadcast when small); untouched partitions are
never read.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.encode import PID_COL, decode_dataframe, with_partition_id
from .manifest import (
    check_store_routing,
    commit_manifest,
    encode_dataframe,
    read_committed_chunks,
    read_manifest,
    write_and_commit_run,
)


def merge_job(
    spark: SparkSession,
    out_dir: str,
    schema,
    updates: DataFrame | None = None,
    deletes: DataFrame | None = None,
    key_col: str = "url",
    unique_col: str | None = None,
    num_partitions: int | None = None,
    snapshot_id: str = "snap-0",
    codecs: dict[str, str] | None = None,
    target_chunk_bytes: int | None = None,
    zstd_level: int = 3,
    rotate_bytes: int = 512 << 20,
) -> dict:
    """Copy-on-write merge: upsert `updates` rows (full schema) and
    remove `deletes` rows (single column = the unique key) by
    `unique_col` (default: key_col — the url is the row identity for
    a web-page table).

    Returns commit stats. Partitions whose rows are ALL removed get an
    explicit n_rows=0 tombstone manifest row, so last-wins hides their
    old chunks (otherwise the stale commit would stay visible).
    """
    if updates is None and deletes is None:
        return {"merged_partitions": 0}
    unique_col = unique_col or key_col
    # the change set must route to pids EXACTLY like the original
    # encode — validate against the store's recorded contract instead
    # of trusting the caller to repeat it (r3 advice); num_partitions
    # left None resolves FROM that contract
    if num_partitions is None:
        from .manifest import read_store_meta

        meta = read_store_meta(out_dir, spark)
        if meta is None or "num_partitions" not in meta:
            raise ValueError(
                f"merge_job: num_partitions not given and {out_dir} has "
                "no store_meta.json recording it — pass the value the "
                "original encode used"
            )
        num_partitions = int(meta["num_partitions"])
    check_store_routing(out_dir, key_col, num_partitions, spark=spark)
    if target_chunk_bytes is None:
        from ..config import derive_chunk_target

        target_chunk_bytes = derive_chunk_target(spark)
    if updates is not None and deletes is not None:
        # a key in BOTH sets would silently resolve to the upsert (the
        # delete is anti-joined away then the update row unioned back);
        # there is no principled order inside one call, so refuse —
        # merge_stream reduces each batch to the LAST op per key first
        clash = (
            updates.select(unique_col)
            .join(deletes.select(unique_col), unique_col, "left_semi")
            .take(1)
        )
        if clash:
            raise ValueError(
                f"merge_job: key {clash[0][0]!r} appears in BOTH updates "
                "and deletes — reduce the change set to one op per key "
                "first (merge_stream does this by batch order)"
            )

    # route changes to partitions exactly like the original encode
    upd = (
        with_partition_id(updates, key_col, num_partitions)
        if updates is not None
        else None
    )
    # deletes carry only the unique key; when it is not the pid key the
    # caller must supply full rows (we need key_col to route) — for the
    # common unique_col == key_col case a 1-column frame suffices
    dels = (
        with_partition_id(deletes, key_col, num_partitions)
        if deletes is not None
        else None
    )
    changed_keys = None
    for side in (upd, dels):
        if side is None:
            continue
        k = side.select(F.col(unique_col), F.col(PID_COL))
        changed_keys = k if changed_keys is None else changed_keys.union(k)
    changed_keys = changed_keys.distinct()
    touched = changed_keys.select(PID_COL).distinct()

    manifest = read_manifest(spark, out_dir)
    stats = {"merged_partitions": 0, "upserted": 0, "deleted": 0}
    base_kept = None
    existing_pids: set[int] = set()
    if manifest is not None:
        targets = (
            manifest.filter(
                (F.col("snapshot_id") == snapshot_id)
                & (F.col("status") == "done")
            )
            .select("partition_id", "run_id", "files")
            .join(
                touched.withColumnRenamed(PID_COL, "partition_id"),
                "partition_id",
                "left_semi",
            )
        )
        # manifest metadata is tiny (one row per partition) — driver-
        # side pid list is bounded by the change set, not the table;
        # ONE collect serves both the pid set and the chunk read
        target_rows = targets.select(
            "partition_id", "run_id", "files"
        ).collect()
        existing_pids = {r["partition_id"] for r in target_rows}
        if existing_pids:
            current = read_committed_chunks(spark, out_dir, target_rows)
            decoded = decode_dataframe(current, schema)
            # drop rows superseded by an update or removed by a delete
            base_kept = decoded.join(
                changed_keys.select(unique_col), unique_col, "left_anti"
            )

    merged = None
    for part in (base_kept, upd.drop(PID_COL) if upd is not None else None):
        if part is None:
            continue
        merged = part if merged is None else merged.unionByName(part)

    run_id = uuid.uuid4().hex[:12]
    committed_pids: set[int] = set()
    rows: list[dict] = []
    if merged is not None:
        chunks = encode_dataframe(
            merged,
            key_col=key_col,
            num_partitions=num_partitions,
            codecs=codecs,
            target_chunk_bytes=target_chunk_bytes,
            zstd_level=zstd_level,
        ).withColumn("run_id", F.lit(run_id))
        # bound the pyarrow writer's in-memory buffer exactly like
        # encode_job: with no max_records the s3 route would hold a
        # task's whole partition (payload included) before one flush
        n_cols = max(1, len(merged.columns))
        max_records = max(
            n_cols, (rotate_bytes // max(1, target_chunk_bytes)) * n_cols
        )
        rows = write_and_commit_run(
            spark, chunks, out_dir, run_id, snapshot_id, max_records
        )
        committed_pids = {r["partition_id"] for r in rows}
        stats["merged_partitions"] = len(rows)

    # tombstones: touched partitions that existed before but have no
    # surviving rows — an explicit n_rows=0 commit supersedes them
    empty = sorted(existing_pids - committed_pids)
    if empty:
        tomb = [
            {
                "snapshot_id": snapshot_id,
                "partition_id": int(pid),
                "run_id": run_id,
                "n_rows": 0,
                "n_chunks": 0,
                "bytes_in": 0,
                "bytes_out": 0,
                "codecs": json.dumps({}),
                "checksum": "",
                "committed_at": time.time(),
                "status": "done",
                # a tombstone references no chunk files; an explicit
                # empty list (not NULL) keeps the store on the
                # file-level read path
                "files": json.dumps([]),
            }
            for pid in empty
        ]
        commit_manifest(tomb, out_dir, f"{run_id}-tomb", spark)
        stats["merged_partitions"] += len(tomb)

    if updates is not None:
        stats["upserted"] = updates.count()
    if deletes is not None:
        stats["deleted"] = deletes.count()
    stats["run_id"] = run_id
    return stats
