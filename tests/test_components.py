"""Connected components (large-star/small-star): correctness against a
pure-Python union-find on random graphs, chains, and edge cases."""

from __future__ import annotations

import numpy as np
import pytest


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _check(spark, edges):
    from osm_pbf_parquet_spark.operators.components import connected_components

    nodes = sorted({x for e in edges for x in e})
    want = _union_find(edges, nodes)
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == want


def test_components_long_chain(spark):
    # a 40-node chain: worst case for label propagation, log rounds here
    _check(spark, [(i, i + 1) for i in range(40)])


def test_components_disjoint_cliques_and_chain(spark):
    edges = [(100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(200, 201), (201, 202), (300, 301)]
    edges += [(7, 9), (9, 7), (7, 9)]  # duplicates + both orientations
    _check(spark, edges)


def test_components_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 120, (150, 2))
        if a != b
    ]
    _check(spark, edges)


def test_components_star_already(spark):
    _check(spark, [(0, i) for i in range(1, 10)])


def test_dedup_pipeline_clusters(spark):
    """pairs → components → keep one representative per cluster:
    the dedup last mile, end-to-end on planted duplicates."""
    from pyspark.sql import functions as F

    from osm_pbf_parquet_spark.operators.components import connected_components
    from osm_pbf_parquet_spark.operators.dedup import minhash_lsh_pairs

    base = [
        "the quick brown fox jumps over the lazy dog and runs far away",
        "completely different text about columnar compression engines here",
    ]
    rows = []
    for g, t in enumerate(base):
        for j in range(4):  # 4 exact copies each
            rows.append((g * 10 + j, t))
    # sha256-hex fillers: templated filler text ("filler number {k}")
    # shares most of its 4-gram shingles and genuinely IS a near-dup
    # cluster — random hex has negligible pairwise jaccard instead
    import hashlib

    rows += [
        (100 + k, hashlib.sha256(str(k).encode()).hexdigest())
        for k in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs)
    comp = connected_components(pairs)
    keep = (
        docs.join(comp, docs.doc_id == comp.node, "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("component"))
        .groupBy("component").agg(F.min("doc_id").alias("rep"))
    )
    reps = {r["rep"] for r in keep.collect()}
    # each planted group collapses to its min id; fillers survive alone
    assert 0 in reps and 10 in reps
    assert not any(r in reps for r in (1, 2, 3, 11, 12, 13))
    assert all(100 + k in reps for k in range(20))
