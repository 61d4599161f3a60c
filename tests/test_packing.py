"""Sequence packing (operators/packing.py): next-fit recurrence
corner cases, invariants, and shard parallelism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _truth_nextfit(toks, budget):
    bins, b, acc = [], 0, 0
    for t in toks:
        if acc and acc + t > budget:
            b += 1
            acc = 0
        acc += t
        bins.append(b)
    return bins


@pytest.mark.parametrize(
    "toks",
    [
        [100, 200, 300, 50, 512, 1, 600, 2, 0, 0, 700, 10],
        [0, 0, 900, 5],          # zero-run then oversized: no early close
        [512, 512, 512],         # exact fits: one per bin
        [1] * 50,
        [513],                   # single oversized doc
    ],
)
def test_pack_matches_python_truth(spark, toks):
    from osm_pbf_parquet_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, nt long"
    )
    got = {
        r.doc_id: r.bin_id
        for r in pack_sequences(df, "nt", budget=512).collect()
    }
    expect = _truth_nextfit(toks, 512)
    assert [got[i] for i in range(len(toks))] == expect


def test_pack_invariants_and_stats(spark):
    from osm_pbf_parquet_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    rows = [(i, (i * 37) % 400 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, nt long")
    packed = pack_sequences(df, "nt", budget=512).cache()
    assert packed.count() == 200  # every doc assigned exactly once
    over = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("c"))
        .filter((F.col("s") > 512) & (F.col("c") > 1))
        .count()
    )
    assert over == 0  # only single-doc (oversized) bins may exceed
    stats = packing_stats(packed, 512).collect()[0]
    assert stats.n_docs == 200 and stats.oversized_bins == 0
    assert 0.5 < stats.fill_ratio <= 1.0  # next-fit >= 1/2 fill
    packed.unpersist()


def test_pack_shards_are_independent(spark):
    from osm_pbf_parquet_spark.operators.packing import pack_sequences

    rows = [(i, 300, i % 4) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, nt long, sh long")
    packed = pack_sequences(df, "nt", budget=512, shard_col="sh")
    per = (
        packed.groupBy("shard", "bin_id")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    # 300-token docs: one per bin (2 would exceed 512), per shard
    assert all(r.c == 1 for r in per)
    assert packed.select("shard").distinct().count() == 4
