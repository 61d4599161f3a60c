"""Turnkey CLI — flag-level parity with the reference's argument
surface (reference src/util.rs:22-61: --input, --output,
--compression <zstd level>, --record-batch-target-bytes,
--file-target-size, --worker-threads) plus this engine's store
lifecycle verbs. Run it either way:

    spark-submit --py-files engine.zip -m … tools/submit_encode_job.py  (bench path)
    python -m osm_pbf_parquet_spark encode --input in.parquet --output store/
    python -m osm_pbf_parquet_spark --help

Under spark-submit the active session is reused; standalone, a
local[worker_threads] session is built (--worker-threads ↔ the
reference's flag of the same name, default = all cores like its
num_cpus::get(), util.rs:53-60).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--worker-threads", type=int, default=0,
        help="cores for a standalone local[N] session (default: all, "
        "the reference's num_cpus default); ignored under spark-submit",
    )


def _session(args):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    n = args.worker_threads or "*"
    return (
        SparkSession.builder.master(f"local[{n}]")
        .appName("osm-pbf-parquet-spark")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _read_input(spark, path: str, fmt: str):
    if fmt == "osm-pbf":
        from .sources.pbf import read_osm_pbf

        return read_osm_pbf(spark, path)
    if fmt == "framed":
        from .sources.framed import read_framed

        return read_framed(spark, path)
    return spark.read.format(fmt).load(path)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="osm_pbf_parquet_spark",
        description="PySpark-native per-column compression engine "
        "(chunk store + lineage manifest).",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser(
        "encode",
        help="encode a table into a chunk store (resumable, verified)",
    )
    enc.add_argument("--input", required=True, help="input path")
    enc.add_argument(
        "--input-format", default="parquet",
        choices=["parquet", "osm-pbf", "framed", "orc", "json", "csv"],
        help="osm-pbf reads real .osm.pbf via sources/pbf.py",
    )
    enc.add_argument("--output", required=True, help="store directory (any Hadoop URI)")
    enc.add_argument("--key-col", default="url", help="partition-routing key")
    enc.add_argument(
        "--partitions", type=int, default=0,
        help="engine partitions (default: 8 x cores, recorded in "
        "store_meta and reused on resume)",
    )
    enc.add_argument(
        "--compression", type=int, default=3, metavar="LEVEL",
        help="zstd level 1-22 (reference --compression default 3, "
        "util.rs:35-37)",
    )
    enc.add_argument(
        "--record-batch-target-bytes", type=int, default=0,
        help="chunk byte target (reference flag; default memory/cores/8, "
        "util.rs:97-101)",
    )
    enc.add_argument(
        "--file-target-size", type=int, default=512 << 20,
        help="output file rotation bytes (reference --file-target-size, "
        "~500 MB default)",
    )
    enc.add_argument(
        "--codecs", default=None,
        help='JSON column->codec override, e.g. \'{"text": "str_fsst"}\'',
    )
    enc.add_argument("--sort-cols", default=None,
                     help="comma list: cluster within partitions (zone maps)")
    enc.add_argument("--bloom-cols", default=None,
                     help="comma list: build per-chunk Bloom filters")
    enc.add_argument("--snapshot-id", default="snap-0")
    enc.add_argument("--no-verify", action="store_true",
                     help="skip the decode-back bit-identity check")
    _add_common(enc)

    dec = sub.add_parser("decode", help="decode a store back to parquet")
    dec.add_argument("--store", required=True)
    dec.add_argument("--output", required=True)
    dec.add_argument("--schema-from", required=True,
                     help="parquet path whose schema the store was encoded with")
    dec.add_argument("--columns", default=None, help="comma list to project")
    dec.add_argument("--where", action="append", default=None,
                     metavar="'col op literal'",
                     help="predicate conjunct (repeatable, ANDed): ops "
                          "==/=/!=/</<=/>/>= — pushes down as bloom "
                          "point pruning + zone-map group pruning + "
                          "worker-side row filter")
    dec.add_argument("--as-of", type=float, default=None,
                     help="time-travel horizon (unix seconds)")
    _add_common(dec)

    cmp_ = sub.add_parser("compact", help="merge small chunk groups")
    cmp_.add_argument("--store", required=True)
    cmp_.add_argument("--min-chunks", type=int, default=2)
    cmp_.add_argument("--snapshot-id", default="snap-0")
    _add_common(cmp_)

    mcp = sub.add_parser(
        "compact-manifest",
        help="fold per-commit manifest parts into one (O(#commits) "
        "read round trips otherwise)",
    )
    mcp.add_argument("--store", required=True)
    mcp.add_argument(
        "--squash", action="store_true",
        help="keep only last-wins rows (drops pre-compaction time travel)",
    )
    _add_common(mcp)

    vac = sub.add_parser("vacuum", help="GC superseded/orphan chunk files")
    vac.add_argument("--store", required=True)
    vac.add_argument("--older-than-s", type=float, default=24 * 3600.0)
    vac.add_argument("--dry-run", action="store_true")
    _add_common(vac)

    rep = sub.add_parser("report", help="per-column codec/ratio report")
    rep.add_argument("--store", required=True)
    _add_common(rep)

    mrg = sub.add_parser("merge", help="copy-on-write upsert/delete by key")
    mrg.add_argument("--store", required=True)
    mrg.add_argument("--schema-from", required=True)
    mrg.add_argument("--updates", default=None, help="parquet of full rows")
    mrg.add_argument("--deletes", default=None, help="parquet of key column")
    mrg.add_argument("--key-col", default="url")
    _add_common(mrg)

    ddp = sub.add_parser(
        "dedup",
        help="deduplicate a text corpus and write the survivors "
        "(optionally decontaminating against a benchmark set first)",
    )
    ddp.add_argument("--input", required=True)
    ddp.add_argument("--input-format", default="parquet")
    ddp.add_argument("--output", required=True)
    ddp.add_argument(
        "--method", default="minhash",
        choices=["exact", "minhash", "simhash", "substring", "strip"],
        help="exact: identical texts; minhash/simhash: near-dup LSH; "
        "substring: shared long byte spans (winnowed fingerprints); "
        "strip: dedup BY REMOVAL — cut duplicated spans out of every "
        "doc instead of dropping docs (Lee-et-al semantics)",
    )
    ddp.add_argument("--text-col", default="text")
    ddp.add_argument("--id-col", default="doc_id")
    ddp.add_argument("--gram-k", type=int, default=None,
                     help="shingle/gram length (method default)")
    ddp.add_argument("--winnow-w", type=int, default=25,
                     help="substring method: winnowing window (0 = every "
                     "gram; guarantee floor is winnow_w + gram_k - 1 bytes)")
    ddp.add_argument("--benchmark", default=None,
                     help="parquet of held-out docs: corpus docs sharing a "
                     "gram with it are dropped BEFORE dedup")
    _add_common(ddp)
    return ap


def cmd_encode(args) -> int:
    from .plans.manifest import encode_job, read_encoded

    spark = _session(args)
    src = _read_input(spark, args.input, args.input_format)
    if not args.no_verify:
        # the verify join re-reads the source after the encode consumed
        # it — for an osm-pbf input that's the whole decode again;
        # persist so the file is decoded ONCE (spills to disk when the
        # extract outgrows executor memory)
        from pyspark import StorageLevel

        src = src.persist(StorageLevel.MEMORY_AND_DISK)
    t0 = time.time()
    stats = encode_job(
        spark, src, args.output,
        key_col=args.key_col,
        num_partitions=args.partitions or None,
        snapshot_id=args.snapshot_id,
        codecs=json.loads(args.codecs) if args.codecs else None,
        target_chunk_bytes=args.record_batch_target_bytes or None,
        zstd_level=args.compression,
        rotate_bytes=args.file_target_size,
        sort_cols=args.sort_cols.split(",") if args.sort_cols else None,
        bloom_cols=args.bloom_cols.split(",") if args.bloom_cols else None,
    )
    out = {
        **{k: stats[k] for k in
           ("rows", "partitions", "bytes_in", "bytes_out")},
        "ratio": round(stats["bytes_out"] / max(1, stats["bytes_in"]), 4),
        "encode_sec": round(time.time() - t0, 2),
    }
    rc = 0
    if not args.no_verify:
        from .plans.manifest import verify_roundtrip

        # NOT stats["rows"]: a resumed encode only counts the pending
        # partitions, but verify compares the FULL store; the counts
        # read the persisted source, not the file again
        dec = read_encoded(spark, args.output, src.schema)
        v = verify_roundtrip(src, dec)
        src.unpersist()
        out["verified_identical"] = v["identical"]
        out["verified_rows"] = v["n_src"] - v["src_unmatched"]
        out["decoded_rows"] = v["n_dec"]
        rc = 0 if v["identical"] else 1
    print(json.dumps(out))
    return rc


def cmd_decode(args) -> int:
    """Store → parquet, with the full read-path pushdown surface:
    --columns projects (only those payloads are read), --where
    conjuncts prune whole chunk GROUPS via bloom point + zone-map
    stats on the metadata before any payload decode, then filter
    exactly inside the Arrow worker (reference parity: the planet-
    scale point-read path, src/pbf.rs element fetch)."""
    from .operators.encode import decode_dataframe
    from .operators.pruning import parse_where, prune_where
    from .plans.manifest import (
        check_time_travel_served,
        read_committed_chunks,
        read_manifest,
    )
    from pyspark.sql import functions as F

    spark = _session(args)
    schema = spark.read.parquet(args.schema_from).schema
    check_time_travel_served(spark, args.store, args.as_of)
    manifest = read_manifest(spark, args.store, as_of=args.as_of)
    if manifest is None:
        raise FileNotFoundError(f"no manifest under {args.store}")
    committed = manifest.filter(F.col("status") == "done")
    chunks = read_committed_chunks(spark, args.store, committed)
    n_groups_total = (
        chunks.select("partition_id", "chunk_seq").distinct().count()
    )
    conj = parse_where(args.where)
    if conj:
        chunks = prune_where(chunks, conj, schema)
    n_groups = (
        chunks.select("partition_id", "chunk_seq").distinct().count()
        if conj else n_groups_total
    )
    cols = args.columns.split(",") if args.columns else None
    if cols is not None:
        need = list(dict.fromkeys(cols + [c for c, _, _ in conj]))
        schema = type(schema)(
            [f for f in schema.fields if f.name in need]
        )
        chunks = chunks.filter(
            F.col("column").isin([f.name for f in schema.fields])
        )
    dec = decode_dataframe(chunks, schema, row_filter=conj or None)
    if cols is not None:
        dec = dec.select(*[c for c in cols if c in dec.columns])
    dec.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": spark.read.parquet(args.output).count(),
                      "chunk_groups_decoded": n_groups,
                      "chunk_groups_total": n_groups_total,
                      "output": args.output}))
    return 0


def cmd_compact(args) -> int:
    from .plans.compact import compact_partitions

    spark = _session(args)
    stats = compact_partitions(
        spark, args.store, snapshot_id=args.snapshot_id,
        min_chunks=args.min_chunks,
    )
    print(json.dumps(stats))
    return 0


def cmd_compact_manifest(args) -> int:
    from .plans.manifest import compact_manifest

    spark = _session(args)
    stats = compact_manifest(spark, args.store, squash=args.squash)
    print(json.dumps(stats))
    return 0


def cmd_vacuum(args) -> int:
    from .plans.vacuum import vacuum

    spark = _session(args)
    stats = vacuum(spark, args.store, older_than_s=args.older_than_s,
                   dry_run=args.dry_run)
    print(json.dumps(stats))
    return 0


def cmd_report(args) -> int:
    from .operators.pruning import store_report
    from .plans.manifest import read_chunks

    spark = _session(args)
    for r in store_report(read_chunks(spark, args.store)).collect():
        print(json.dumps(r.asDict()))
    return 0


def cmd_merge(args) -> int:
    from .plans.merge import merge_job

    spark = _session(args)
    schema = spark.read.parquet(args.schema_from).schema
    stats = merge_job(
        spark, args.store, schema,
        updates=spark.read.parquet(args.updates) if args.updates else None,
        deletes=spark.read.parquet(args.deletes) if args.deletes else None,
        key_col=args.key_col,
    )
    print(json.dumps(stats))
    return 0


def cmd_dedup(args) -> int:
    """Corpus → survivors parquet. The composed pipeline a
    training-data run actually executes: optional benchmark
    decontamination (broadcast fingerprint anti-join), then candidate
    pairs by the chosen method, connected components, and the
    keep-component-min collapse (operators/components.canonicalize).
    `exact` skips the pair machinery entirely — one hash groupBy."""
    from pyspark.sql import functions as F

    spark = _session(args)
    df = _read_input(spark, args.input, args.input_format)
    n_in = df.count()
    text_col, id_col = args.text_col, args.id_col
    n_decon = 0
    if args.benchmark:
        from .operators.substring import decontaminate

        bench = spark.read.parquet(args.benchmark)
        k = args.gram_k or 50
        w = args.winnow_w or None
        kept = decontaminate(df, bench, text_col, id_col, k=k, winnow_w=w)
        kept = kept.localCheckpoint()
        n_decon = n_in - kept.count()
        df = kept
    stripped_bytes = 0
    if args.method == "strip":
        from .operators.substring import strip_dup_spans

        # dedup BY REMOVAL: every row survives; duplicated spans are
        # cut out of the text (dup_bytes column records how much)
        out = strip_dup_spans(
            df, text_col, id_col, k=args.gram_k or 50
        )
        out.write.mode("overwrite").parquet(args.output)
        res = spark.read.parquet(args.output)
        n_out = res.count()
        stripped_bytes = res.agg(F.sum("dup_bytes")).collect()[0][0] or 0
        print(json.dumps({
            "method": args.method,
            "rows_in": n_in,
            "dropped_contaminated": n_decon,
            "rows_out": n_out,
            "stripped_bytes": int(stripped_bytes),
            "output": args.output,
        }))
        return 0
    if args.method == "exact":
        from .operators.dedup import dedup_exact

        # keep-set is ~the whole corpus (dup fraction << 1): a plain
        # shuffle semi-join; broadcasting would ship the BIG side
        keep = dedup_exact(df, text_col, id_col)
        out = df.join(keep, id_col, "left_semi")
    else:
        from .operators.components import canonicalize

        if args.method == "minhash":
            from .operators.dedup import minhash_lsh_pairs

            pairs = minhash_lsh_pairs(
                df, text_col, id_col,
                shingle_k=args.gram_k or 4,
            )
        elif args.method == "simhash":
            from .operators.dedup import simhash_pairs

            pairs = simhash_pairs(df, text_col, id_col)
        else:
            from .operators.substring import substring_dup_pairs

            pairs = substring_dup_pairs(
                df, text_col, id_col,
                k=args.gram_k or 50,
                winnow_w=args.winnow_w or None,
            )
        out = canonicalize(df, pairs, id_col)
    out.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    print(json.dumps({
        "method": args.method,
        "rows_in": n_in,
        "dropped_contaminated": n_decon,
        "rows_out": n_out,
        "dropped_duplicates": n_in - n_decon - n_out,
        "output": args.output,
    }))
    return 0


_DISPATCH = {
    "encode": cmd_encode,
    "decode": cmd_decode,
    "compact": cmd_compact,
    "compact-manifest": cmd_compact_manifest,
    "vacuum": cmd_vacuum,
    "report": cmd_report,
    "merge": cmd_merge,
    "dedup": cmd_dedup,
}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return _DISPATCH[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
