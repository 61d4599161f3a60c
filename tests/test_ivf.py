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


def test_persisted_ivf_store_probe_prunes_to_cells(spark, tmp_path):
    """r3 verdict #6: the persisted index must let a probe touch ONLY
    the probed cells' chunks — partition_id pushdown into the chunk
    scan, no .cache() assumption — and still return the exact answer
    when every cell is probed."""
    import numpy as np
    from pyspark.sql import functions as F

    from osm_pbf_parquet_spark.functions.similarity import (
        cosine_topk,
        ivf_build_store,
        ivf_probe_chunks,
        ivf_search_store,
        ivf_store_spark_schema,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = str(tmp_path / "ivf")
    query = [float(x) for x in rng.standard_normal(16)]

    cents = ivf_build_store(spark, df, out, n_centroids=8)
    assert len(cents) == 8
    schema = ivf_store_spark_schema(df)

    # the probe's chunk scan contains ONLY the probed cells
    probe, chunks = ivf_probe_chunks(spark, out, query, n_probe=2)
    assert len(probe) == 2
    scanned = {
        r["partition_id"]
        for r in chunks.select("partition_id").distinct().collect()
    }
    assert scanned <= set(probe) and scanned

    # partition filter is pushed into the parquet scan (PushedFilters
    # carries the In(partition_id, ...) predicate)
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert "partition_id" in plan.split("PushedFilters")[1].splitlines()[0]

    # full probe == exact brute force (machinery correctness)
    full = ivf_search_store(spark, out, query, schema, k=5, n_probe=8)
    exact = cosine_topk(df, query, k=5)
    assert [r["vec_id"] for r in full.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]

    # partial probe returns exactly the probed cells' best
    part = ivf_search_store(spark, out, query, schema, k=5, n_probe=2)
    decoded_ids = {
        r["vec_id"]
        for r in part.select("vec_id").collect()
    }
    from osm_pbf_parquet_spark.operators.encode import decode_dataframe

    cell_rows = decode_dataframe(chunks, schema)
    best_in_cells = cosine_topk(cell_rows, query, k=5)
    assert decoded_ids == {r["vec_id"] for r in best_in_cells.collect()}
