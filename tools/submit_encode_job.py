"""spark-submit entry script (north_rule launch mode).

Usage:
    spark-submit --master local[N] --py-files engine.zip \
        tools/submit_encode_job.py <input_parquet> <out_dir> \
        [key_col] [num_partitions] [zstd_level] [target_chunk_mb]

Config knobs mirror the reference CLI (src/util.rs:24-61):
zstd_level = --compression (default 3); target_chunk_mb = the
batch/file size target (default: derived from memory/cores/8,
src/util.rs:97-101). Encodes the input table into chunk+manifest
output, decodes it back, verifies bit-identity, and prints one JSON
line of metrics.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> int:
    inp, out = sys.argv[1], sys.argv[2]
    key_col = sys.argv[3] if len(sys.argv) > 3 else "url"
    nparts = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    zstd_level = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    chunk_mb = int(sys.argv[6]) if len(sys.argv) > 6 else 0

    spark = SparkSession.builder.appName("encode-job").getOrCreate()
    from osm_pbf_parquet_spark.plans.manifest import encode_job, read_encoded

    src = spark.read.parquet(inp)
    t0 = time.time()
    stats = encode_job(
        spark, src, out, key_col=key_col, num_partitions=nparts,
        zstd_level=zstd_level,
        target_chunk_bytes=(chunk_mb << 20) if chunk_mb else None,
    )
    encode_s = time.time() - t0

    from osm_pbf_parquet_spark.plans.manifest import verify_roundtrip

    # multiset-faithful verify (counts both ways + anti-join each way;
    # join-PAIR counting is fooled by duplicate keys) — shared helper
    dec = read_encoded(spark, out, src.schema)
    v = verify_roundtrip(src, dec)
    identical = v["identical"]
    n_src, n_dec, src_unmatched = v["n_src"], v["n_dec"], v["src_unmatched"]
    print(
        json.dumps(
            {
                "rows": stats["rows"],
                "partitions": stats["partitions"],
                "bytes_in": stats["bytes_in"],
                "bytes_out": stats["bytes_out"],
                "ratio": round(stats["bytes_out"] / max(1, stats["bytes_in"]), 4),
                "encode_sec": round(encode_s, 2),
                "rows_per_sec": round(stats["rows"] / encode_s, 1),
                "verified_identical": identical,
                "verified_rows": n_src - src_unmatched,
                "decoded_rows": n_dec,
            }
        )
    )
    spark.stop()
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
