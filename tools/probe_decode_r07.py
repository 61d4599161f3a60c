"""A/B the decode co-location shapes at a given sf dir.

Usage: python tools/probe_decode_r07.py <sf_dir>

Variants (bench decode_lineitem shape: cached chunk table -> decode ->
count agg, noop-equivalent):
  aqe       repartition("partition_id")            (current default)
  fixed64   repartition(2*cpus, "partition_id")    (r6 shape)
  est_ps    repartition(N_est, pid, chunk_seq)     (candidate)
  est_p     repartition(N_est, pid)
"""

from __future__ import annotations

import math
import sys

import probe_r07 as P


def main() -> int:
    sf = sys.argv[1]
    spark, ctx = P.setup(sf, ui=False)
    from pyspark.sql import functions as F

    from osm_pbf_parquet_spark.operators.encode import (
        _plan_size_estimate,
        encode_input_partitions,
        make_decode_fn,
    )

    li = ctx["li"]
    cpus = 32
    li_wide = li.repartition(2 * cpus).cache()
    li_wide.count()
    chunks = encode_input_partitions(li_wide).cache()
    print("chunk cells:", chunks.count())
    est = _plan_size_estimate(chunks)
    print("est bytes:", est)
    names = [f.name for f in li.schema]

    def dec(co):
        return (
            co.mapInArrow(make_decode_fn(names), li.schema)
            .agg(F.count("*")).collect()
        )

    n_est = max(1, min(math.ceil((est or 0) / (8 << 20)), 4 * cpus))
    print("n_est:", n_est)
    variants = {
        "aqe": lambda: dec(chunks.repartition("partition_id")),
        "fixed64": lambda: dec(chunks.repartition(2 * cpus, "partition_id")),
        "est_ps": lambda: dec(
            chunks.repartition(n_est, "partition_id", "chunk_seq")
        ),
        "est_p": lambda: dec(chunks.repartition(n_est, "partition_id")),
    }
    for name, fn in variants.items():
        P.best3(fn, label=f"decode[{name}] @ {sf}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
