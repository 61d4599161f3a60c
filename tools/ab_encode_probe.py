"""One A/B probe leg: time encode_lineitem / encode_events /
decode_lineitem exactly as bench.py does, importing the engine from
$AB_REPO (PYTHONPATH-style), and print one JSON line.

Used by tools/ab_encode_regression.py to answer r5 verdict #2: the
encode-path queries regressed 16-39% r4→r5 while everything else got
faster — paired same-session A/B against the r4 commit (007faf7)
either names the cause or records that it is host drift.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    repo = os.environ["AB_REPO"]
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    amplify = 4

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-encode-probe")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod
    from osm_pbf_parquet_spark.operators.encode import (
        decode_dataframe,
        encode_dataframe,
        encode_input_partitions,
    )

    entry_mod._ensure_workers_see_package(spark)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for _ in range(amplify - 1):
        li = li.union(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    li = li.cache()
    li.count()
    events = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    events.count()

    # warm-up identical to bench.py (workers spawned, kernels imported)
    warm = encode_dataframe(li.limit(50_000), key_col="l_orderkey",
                            num_partitions=2 * cpus)
    decode_dataframe(warm, li.schema).agg(F.count("*")).collect()

    def enc(df, key):
        chunks = encode_dataframe(df, key_col=key, num_partitions=2 * cpus)
        return chunks.agg(F.sum("bytes_in")).collect()

    def timed(fn, reps=3):
        fn()  # steady-state
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    out = {
        "repo": repo,
        "encode_lineitem": timed(lambda: enc(li, "l_orderkey")),
        "encode_events": timed(lambda: enc(events, "event_id")),
    }
    li_wide = li.repartition(2 * cpus).cache()
    li_wide.count()
    chunks_cached = encode_input_partitions(li_wide).cache()
    chunks_cached.count()
    out["decode_lineitem"] = timed(
        lambda: decode_dataframe(chunks_cached, li.schema)
        .agg(F.count("*")).collect()
    )
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
