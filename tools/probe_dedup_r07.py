"""A/B bounded_bucket_pairs exchange width + widen_for_kernel at a
given sf dir.

Usage: python tools/probe_dedup_r07.py <sf_dir>

Monkeypatches config.derive_shuffle_partitions / widen_for_kernel to
test shapes end-to-end through the real minhash_lsh_pairs /
substring_dup_pairs bench queries.
"""

from __future__ import annotations

import sys

import probe_r07 as P


def main() -> int:
    sf = sys.argv[1]
    spark, ctx = P.setup(sf, ui=False)
    docs = ctx["docs"]

    import osm_pbf_parquet_spark.config as C
    from osm_pbf_parquet_spark.operators.dedup import minhash_lsh_pairs
    from osm_pbf_parquet_spark.operators.substring import substring_dup_pairs

    orig_dsp = C.derive_shuffle_partitions
    orig_widen = C.widen_for_kernel

    def run_pair():
        mh = P.best3(lambda: minhash_lsh_pairs(docs).count(),
                     label=f"  minhash @ {sf}")
        ss = P.best3(
            lambda: substring_dup_pairs(docs, k=50, winnow_w=25).count(),
            label=f"  substring @ {sf}")
        return mh, ss

    print("== current (widen x2, exch 301) ==")
    run_pair()

    print("== exch = sql shuffle partitions (64, bypass writer) ==")
    C.derive_shuffle_partitions = lambda spark, floor=0: 64
    import osm_pbf_parquet_spark.operators.dedup as D
    import osm_pbf_parquet_spark.operators.substring as S
    run_pair()
    C.derive_shuffle_partitions = orig_dsp

    print("== no widen (input partitioning as-is) ==")
    C.widen_for_kernel = lambda df, factor=2: df
    D.widen_for_kernel = C.widen_for_kernel
    run_pair()
    C.widen_for_kernel = orig_widen
    D.widen_for_kernel = orig_widen

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
