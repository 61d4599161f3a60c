"""Turnkey CLI (cli.py) — reference argument-surface parity
(reference src/util.rs:22-61) + store lifecycle verbs."""

from __future__ import annotations

import json
import os

import pytest

from osm_pbf_parquet_spark.cli import build_parser, main


def test_flag_parity_with_reference():
    """Every reference CLI flag has a CLI twin (util.rs:22-61:
    input, output, compression, record_batch_target_bytes,
    file_target_size, worker_threads)."""
    ap = build_parser()
    help_text = ap.format_help()
    assert "encode" in help_text
    enc = next(
        a for a in ap._subparsers._group_actions[0].choices.items()
        if a[0] == "encode"
    )[1]
    enc_help = enc.format_help()
    for flag in ("--input", "--output", "--compression",
                 "--record-batch-target-bytes", "--file-target-size",
                 "--worker-threads"):
        assert flag in enc_help, flag


def test_encode_decode_report_cli(spark, pages_path, tmp_path, capsys):
    out = str(tmp_path / "store")
    rc = main([
        "encode", "--input", pages_path, "--output", out,
        "--key-col", "url", "--partitions", "4",
        "--compression", "3",
        "--codecs", '{"text": "str_fsst"}',
    ])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and captured["verified_identical"]
    assert captured["partitions"] == 4

    # resume no-op through the CLI
    rc = main(["encode", "--input", pages_path, "--output", out,
               "--key-col", "url", "--partitions", "4"])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and captured["partitions"] == 0

    # report: text column shows the forced codec
    rc = main(["report", "--store", out])
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert rc == 0
    assert any(r["column"] == "text" and r["codec"] == "str_fsst" for r in rows)

    # decode a projection back to parquet
    dec_out = str(tmp_path / "decoded")
    rc = main([
        "decode", "--store", out, "--output", dec_out,
        "--schema-from", pages_path, "--columns", "url,lang",
    ])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert captured["rows"] == spark.read.parquet(pages_path).count()
    assert set(spark.read.parquet(dec_out).columns) == {"url", "lang"}


def test_encode_osm_pbf_input_cli(spark, tmp_path, capsys):
    """--input-format osm-pbf: a real .osm.pbf encodes into a store
    through the CLI (the reference's turnkey transcode, one command)."""
    from osm_pbf_parquet_spark.sources import pbf as pbf_mod
    from tests.test_pbf import _nodes, _ways

    path = str(tmp_path / "in.osm.pbf")
    pbf_mod.write_osm_pbf(path, _nodes(100), _ways(10), nodes_per_block=40)
    out = str(tmp_path / "store")
    rc = main([
        "encode", "--input", path, "--input-format", "osm-pbf",
        "--output", out, "--key-col", "id", "--partitions", "4",
        "--no-verify",  # id repeats across element types → join not 1:1
    ])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and captured["rows"] == 110


def test_vacuum_dry_run_cli(spark, pages_path, tmp_path, capsys):
    out = str(tmp_path / "store")
    main(["encode", "--input", pages_path, "--output", out,
          "--key-col", "url", "--partitions", "2", "--no-verify"])
    capsys.readouterr()
    rc = main(["vacuum", "--store", out, "--older-than-s", "0",
               "--dry-run"])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and captured["dry_run"] is True
    assert captured["files_deleted"] == 0  # nothing superseded yet


def test_unknown_command_errors():
    with pytest.raises(SystemExit):
        main(["transmogrify"])


def test_encode_verify_osm_pbf_map_column(spark, tmp_path, capsys):
    """CLI verify must handle MAP columns (OSM tags): `<=>` cannot
    order maps, so the predicate compares sort_array(map_entries(..))
    — regression for the osm-pbf input format crashing at verify."""
    from osm_pbf_parquet_spark.sources.pbf import write_osm_pbf

    pbf = str(tmp_path / "tiny.osm.pbf")
    nodes = [
        {"id": 10 + i, "lat_units": i * 1000, "lon_units": -i * 1000,
         "tags": {"name": f"n{i}"} if i % 3 == 0 else {},
         # second-aligned per the writer's DATE_GRANULARITY contract
         # (r5: the dense path now raises instead of silently flooring)
         "ts_ms": 1_500_000_000_000 + i * 1000, "changeset": 1, "uid": 7,
         "user": "u", "version": 1, "visible": True}
        for i in range(200)
    ]
    ways = [
        {"id": 9000 + i, "tags": {"highway": "x"},
         "refs": [10 + i, 11 + i, 12 + i], "ts_ms": 1_500_000_000_000,
         "changeset": 1, "uid": 7, "user": "u", "version": 1,
         "visible": True}
        for i in range(20)
    ]
    write_osm_pbf(pbf, nodes, ways, nodes_per_block=100)
    out = str(tmp_path / "pbf_store")
    rc = main([
        "encode", "--input", pbf, "--input-format", "osm-pbf",
        "--output", out, "--key-col", "id", "--partitions", "4",
    ])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert captured["rows"] == 220
    assert captured["verified_identical"] is True


def test_verify_roundtrip_catches_duplicate_key_corruption(spark):
    """The r4 verify counted JOIN PAIRS: with duplicate key values,
    pair multiplication could mask exact-duplicate corruption (ok ==
    n_src with a wrong store). The multiset-faithful verify must fail
    these and still pass identical multisets."""
    from osm_pbf_parquet_spark.plans.manifest import verify_roundtrip

    src = spark.createDataFrame(
        [("k", 1), ("k", 1), ("x", 9)], "url string, v int"
    )
    # identical multiset (row order permuted) -> identical
    ok = verify_roundtrip(
        src, spark.createDataFrame([("x", 9), ("k", 1), ("k", 1)],
                                   "url string, v int")
    )
    assert ok["identical"]
    # same count, one dup replaced by a DIFFERENT row under the same
    # key: the old pair count was 2x1 + 1 = 3 == n_src ("verified");
    # the anti-joins catch it
    bad = verify_roundtrip(
        src, spark.createDataFrame([("k", 1), ("k", 2), ("x", 9)],
                                   "url string, v int")
    )
    assert not bad["identical"] and bad["dec_unmatched"] == 1
    # lost dup + extra row under an existing key (counts equal both
    # directions of drift)
    bad2 = verify_roundtrip(
        src, spark.createDataFrame([("k", 1), ("x", 9), ("x", 9)],
                                   "url string, v int")
    )
    assert not bad2["identical"]
    # count mismatch alone
    bad3 = verify_roundtrip(
        src, spark.createDataFrame([("k", 1), ("x", 9)], "url string, v int")
    )
    assert not bad3["identical"] and bad3["n_dec"] == 2


def test_decode_where_point_prunes_to_one_group(spark, sf_dir, tmp_path,
                                                capsys):
    """r4 verdict #7: the CLI decode verb exposes the read-path
    pushdown — a bloom-indexed point query decodes ~1 chunk group out
    of the store, not all of them, and the worker-side row filter
    returns exactly the matching row."""
    docs = os.path.join(sf_dir, "documents.parquet")
    out = str(tmp_path / "store")
    rc = main([
        "encode", "--input", docs, "--output", out,
        "--key-col", "doc_id", "--partitions", "8",
        "--record-batch-target-bytes", str(64 << 10),
        "--bloom-cols", "doc_id", "--no-verify",
    ])
    capsys.readouterr()
    assert rc == 0

    dec_out = str(tmp_path / "hit")
    rc = main([
        "decode", "--store", out, "--output", dec_out,
        "--schema-from", docs, "--where", "doc_id == 123",
    ])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert got["rows"] == 1
    assert got["chunk_groups_total"] >= 8
    # bloom prunes to the one group that can hold doc_id=123 (hash-
    # partitioned high-cardinality key: zone maps alone are blind here)
    assert got["chunk_groups_decoded"] <= 2
    row = spark.read.parquet(dec_out).collect()[0]
    src = spark.read.parquet(docs).filter("doc_id = 123").collect()[0]
    assert row.asDict() == src.asDict()

    # range conjunct + projection: filter column (n_chars) is decoded
    # for the worker-side filter but projected away on request
    rng_out = str(tmp_path / "range")
    rc = main([
        "decode", "--store", out, "--output", rng_out,
        "--schema-from", docs, "--columns", "doc_id,lang",
        "--where", "n_chars >= 50", "--where", "n_chars < 200",
    ])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    res = spark.read.parquet(rng_out)
    assert set(res.columns) == {"doc_id", "lang"}
    expect = (spark.read.parquet(docs)
              .filter("n_chars >= 50 AND n_chars < 200").count())
    assert res.count() == expect == got["rows"]


def test_read_encoded_where_and_columns(spark, sf_dir, tmp_path):
    """read_encoded's programmatic pushdown twin: where conjuncts
    (string or tuple form) + column projection give the same rows as
    the parquet source filtered exactly."""
    from osm_pbf_parquet_spark.plans.manifest import encode_job, read_encoded

    docs_path = os.path.join(sf_dir, "documents.parquet")
    docs = spark.read.parquet(docs_path)
    out = str(tmp_path / "store")
    encode_job(spark, docs, out, key_col="doc_id", num_partitions=4,
               bloom_cols=["doc_id"])

    got = read_encoded(
        spark, out, docs.schema,
        columns=["doc_id", "text"], where=["n_chars >= 100", ("lang", "==", "en")],
    )
    assert set(got.columns) == {"doc_id", "text"}
    expect = docs.filter("n_chars >= 100 AND lang = 'en'")
    assert got.count() == expect.count()
    assert got.exceptAll(expect.select("doc_id", "text")).count() == 0

    point = read_encoded(spark, out, docs.schema, where=["doc_id = 42"])
    assert point.count() == 1
    assert point.first()["doc_id"] == 42


def test_dedup_cli(spark, sf_dir, tmp_path, capsys):
    """The dedup verb end to end: substring method with a benchmark
    decontamination pass, survivors written to parquet, accounting in
    the JSON line adds up."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    bench_path = str(tmp_path / "bench.parquet")
    docs = spark.read.parquet(docs_path)
    docs.filter("doc_id % 50 = 0").write.parquet(bench_path)
    corpus_path = str(tmp_path / "corpus.parquet")
    docs.filter("doc_id % 50 != 0").write.parquet(corpus_path)

    out = str(tmp_path / "survivors")
    rc = main([
        "dedup", "--input", corpus_path, "--output", out,
        "--method", "substring", "--gram-k", "20", "--winnow-w", "0",
        "--benchmark", bench_path,
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert rep["rows_in"] == rep["rows_out"] + rep["dropped_contaminated"] + \
        rep["dropped_duplicates"]
    assert rep["dropped_contaminated"] > 0
    survivors = spark.read.parquet(out)
    assert survivors.count() == rep["rows_out"] > 0
    assert set(survivors.columns) == set(docs.columns)

    # exact method: survivor count == distinct texts
    out2 = str(tmp_path / "survivors_exact")
    rc = main([
        "dedup", "--input", corpus_path, "--output", out2,
        "--method", "exact",
    ])
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    n_distinct = spark.read.parquet(corpus_path).select("text").distinct().count()
    assert rep2["rows_out"] == n_distinct


def test_dedup_cli_strip(spark, sf_dir, tmp_path, capsys):
    """--method strip: dedup BY REMOVAL — every row survives, the
    duplicated spans are cut from the text, stripped_bytes accounts
    for the removed volume, and no text GREW."""
    from pyspark.sql import functions as F

    docs_path = os.path.join(sf_dir, "documents.parquet")
    out = str(tmp_path / "stripped")
    rc = main([
        "dedup", "--input", docs_path, "--output", out,
        "--method", "strip", "--gram-k", "30",
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    res = spark.read.parquet(out)
    assert rep["rows_out"] == rep["rows_in"] == res.count()
    assert rep["stripped_bytes"] > 0
    src = spark.read.parquet(docs_path).select(
        "doc_id", F.length("text").alias("orig_len"))
    joined = res.select(
        "doc_id", F.length("text").alias("new_len"), "dup_bytes"
    ).join(src, "doc_id")
    bad = joined.filter(
        F.col("new_len") + F.col("dup_bytes") != F.col("orig_len")
    ).count()
    assert bad == 0


def test_compact_manifest_cli(spark, pages_path, tmp_path, capsys):
    out = str(tmp_path / "store")
    main(["encode", "--input", pages_path, "--output", out,
          "--key-col", "url", "--partitions", "2", "--no-verify"])
    main(["compact", "--store", out, "--min-chunks", "1"])
    capsys.readouterr()
    rc = main(["compact-manifest", "--store", out])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and captured["parts_after"] == 1
    assert captured["parts_before"] >= 2 and captured["rows_dropped"] == 0
