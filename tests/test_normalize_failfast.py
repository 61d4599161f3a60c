"""P1–P7 normalization parity + X6 fail-fast + X5 progress counter."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def typed_inputs(spark):
    nodes = spark.createDataFrame(
        [
            (1, 10.5, -3.25, ["highway"], ["bus_stop"], 100, 1_500_000_000_123, 7, "alice", 2, True),
            (2, -45.0, 170.0, [], [], None, 1_500_000_001_000, None, None, 1, True),
        ],
        "id long, lat double, lon double, tag_keys array<string>,"
        " tag_vals array<string>, changeset long, ts_ms long, uid int,"
        " user string, version int, visible boolean",
    )
    ways = spark.createDataFrame(
        [
            (10, ["name"], ["Main St"], [1, 2, 3], 200, 1_500_000_002_000, 8, "bob", 3, True),
        ],
        "id long, tag_keys array<string>, tag_vals array<string>,"
        " refs array<long>, changeset long, ts_ms long, uid int,"
        " user string, version int, visible boolean",
    )
    rels = spark.createDataFrame(
        [
            (
                20, ["type"], ["route"],
                [0, 1, 2], [1, 10, 21], ["stop", None, "child"],
                300, 1_500_000_003_000, 9, "carol", 4, False,
            ),
        ],
        "id long, tag_keys array<string>, tag_vals array<string>,"
        " member_types array<int>, member_refs array<long>,"
        " member_roles array<string>, changeset long, ts_ms long,"
        " uid int, user string, version int, visible boolean",
    )
    return nodes, ways, rels


def test_normalize_unified_schema(spark, typed_inputs):
    from osm_pbf_parquet_spark.operators.normalize import (
        UNIFIED_COLUMNS,
        normalize_elements,
    )

    out = normalize_elements(*typed_inputs)
    assert out.columns == UNIFIED_COLUMNS
    rows = {(r["id"], r["type"]): r for r in out.collect()}
    assert len(rows) == 4

    n1 = rows[(1, "node")]
    assert n1["tags"] == {"highway": "bus_stop"} and n1["lat"] == 10.5
    assert n1["nds"] is None and n1["members"] is None
    assert n1["timestamp"].microsecond == 123000  # P7: ms precision kept

    n2 = rows[(2, "node")]
    assert n2["tags"] is None and n2["user"] == ""  # P1: '' fallback
    assert n2["uid"] is None and n2["changeset"] is None  # P2: NULL-lifted

    w = rows[(10, "way")]
    assert w["lat"] is None and w["lon"] is None  # src/sink.rs:237-238
    assert [x["ref"] for x in w["nds"]] == [1, 2, 3]  # P3

    r = rows[(20, "relation")]
    assert [(m["type"], m["ref"], m["role"]) for m in r["members"]] == [
        ("node", 1, "stop"), ("way", 10, None), ("relation", 21, "child"),
    ]  # P4: enum→lowercase string, null role kept


def test_normalized_roundtrips_through_engine(spark, typed_inputs):
    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
    )
    from osm_pbf_parquet_spark.operators.normalize import normalize_elements

    out = normalize_elements(*typed_inputs)
    chunks = encode_dataframe(out, key_col="id", num_partitions=2)
    dec = decode_dataframe(chunks, out.schema)
    assert dec.count() == out.count()
    joined = out.alias("a").join(dec.alias("b"), ["id", "type"])
    cols = [c for c in out.columns if c not in ("id", "type", "tags")]
    pred = " AND ".join(f"a.{c} <=> b.{c}" for c in cols)
    assert joined.filter(f"NOT ({pred} AND map_entries(a.tags) <=> map_entries(b.tags))").count() == 0


def test_fail_fast_on_corrupt_chunk(spark, sf_dir):
    """X6 parity: the reference panics on undecodable input
    (src/pbf.rs:77-82); a corrupt payload must fail the decode job,
    never silently skip."""
    from pyspark.sql.utils import PythonException

    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
    )

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = encode_dataframe(src, key_col="doc_id", num_partitions=2)
    corrupted = chunks.withColumn(
        "payload",
        F.when(F.col("col_idx") == 0, F.lit(b"\x00garbage")).otherwise(
            F.col("payload")
        ),
    )
    with pytest.raises(Exception):
        decode_dataframe(corrupted, src.schema).count()


def test_progress_accumulator_counts_rows(spark, sf_dir, tmp_path):
    from osm_pbf_parquet_spark.plans.manifest import encode_job

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = encode_job(spark, src, str(tmp_path / "o"), key_col="doc_id",
                       num_partitions=2)
    assert stats["rows_seen"] == src.count() == stats["rows"]
