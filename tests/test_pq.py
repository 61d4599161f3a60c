"""Product quantization: codes shape, determinism, planted recall.

PQ is lossy by design, so correctness is framed as recall guarantees
(like dedup_minhash_recall / ivf_topk_partial_recall): planted exact
near-copies of the query must be the ADC top-k through 8-byte codes.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.functions.pq import pq_encode, pq_topk, pq_train

M, K = 8, 16


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).cache()


def test_codebook_shape_and_determinism(emb):
    b1 = pq_train(emb, m=M, k=K)
    b2 = pq_train(emb, m=M, k=K)
    assert np.array(b1).shape == (M, K, 64 // M)
    assert np.allclose(np.array(b1), np.array(b2)), "training must be seeded"


def test_codes_are_m_bytes(emb):
    book = pq_train(emb, m=M, k=K)
    codes = pq_encode(emb, book).limit(50).collect()
    assert all(len(r["codes"]) == M for r in codes)


def test_planted_copies_are_top_k(spark, emb):
    query = [round(float(np.sin(d + 1)), 6) for d in range(64)]
    book = pq_train(emb, m=M, k=K)  # blind to the plant
    n_plant = 10
    rows = [
        (int(1_000_000 + i),
         [float(query[0] + (i + 1) * 1e-3)] + [float(x) for x in query[1:]])
        for i in range(n_plant)
    ]
    planted = spark.createDataFrame(rows, emb.schema)
    codes = pq_encode(emb.unionByName(planted), book)
    got = {r["vec_id"] for r in pq_topk(codes, book, query, topk=n_plant).collect()}
    assert got == {r[0] for r in rows}, f"ADC top-{n_plant} missed plants: {got}"


def test_compression_is_32x(emb):
    book = pq_train(emb, m=M, k=K)
    n = emb.count()
    code_bytes = n * M
    raw_bytes = n * 64 * 4  # float32
    assert raw_bytes / code_bytes == 32.0


def test_scores_rank_like_cosine_for_separated_data(spark):
    """On well-separated clusters, PQ ranking must agree with exact
    cosine: members of the query's cluster outrank the other cluster."""
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.05, (40, 64)) + np.tile([1.0] + [0.0] * 63, (40, 1))
    b = rng.normal(0, 0.05, (40, 64)) + np.tile([0.0] * 63 + [1.0], (40, 1))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([a, b]))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    book = pq_train(df, m=M, k=8, sample_size=80)
    codes = pq_encode(df, book)
    query = [1.0] + [0.0] * 63
    top = [r["vec_id"] for r in pq_topk(codes, book, query, topk=20).collect()]
    assert all(v < 40 for v in top), f"cluster-b ids leaked into top-20: {top}"
