"""IVF approximate nearest-neighbor: exactness at full probe, recall
at partial probe, deterministic centroids."""

from __future__ import annotations

import numpy as np


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    from osm_pbf_parquet_spark.functions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [round(float(np.sin(d + 1)), 6) for d in range(64)]
    brute = [(r["vec_id"], r["cos_sim"]) for r in cosine_topk(emb, q, 10).collect()]
    full = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(emb, q, 10, n_centroids=8, n_probe=8).collect()
    ]
    assert full == brute


def test_ivf_partial_probe_recall(spark, sf_dir):
    from osm_pbf_parquet_spark.functions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [round(float(np.sin(d + 1)), 6) for d in range(64)]
    brute = {r["vec_id"] for r in cosine_topk(emb, q, 10).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_topk(emb, q, 10, n_centroids=16, n_probe=6).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.5, f"recall {recall}"


def test_centroids_deterministic(spark, sf_dir):
    from osm_pbf_parquet_spark.functions.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = kmeans_centroids(emb)
    b = kmeans_centroids(emb)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_ivf_assign_is_vectorized_and_total(spark, sf_dir):
    from osm_pbf_parquet_spark.functions.similarity import (
        ivf_assign,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_centroids(emb, n_centroids=8)
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    cells = {r[0] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) >= 2
