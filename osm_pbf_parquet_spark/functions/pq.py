"""Product quantization: 32×-compressed embeddings + ADC top-k search.

The embedding twin of the string/int codec family (north_rule: encode
EVERY column type for 10^12-row scale): a 64-dim float32 vector is
256 bytes; its PQ code is m bytes (m=8 → 32×). IVF (similarity.py)
prunes WHICH vectors to score; PQ compresses HOW each vector is
scored — together they are the standard billion-scale ANN layout
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011; FAISS IVF-PQ).

Shapes, Spark-first:
  * train: driver-side k-means per subspace over a BOUNDED sample
    (≤ sample_size vectors regardless of table size — same contract
    as similarity.kmeans_centroids);
  * encode: mapInPandas, one numpy GEMM per (batch × subspace), codes
    out as m-byte binary — no per-row Python;
  * search: asymmetric distance (ADC) — the query builds an (m × k)
    lookup table once; each batch scores as m vectorized gathers +
    one sum, then Spark's orderBy(score).limit(k) collapses to
    TakeOrderedAndProject (no global sort).

Vectors are L2-normalized before training/encoding, so squared-L2 ADC
ranks identically to cosine — pq_topk agrees with cosine_topk up to
quantization error (verified by planted-copy recall in the contract).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 7,
) -> list:
    """(m, k, dim/m) codebook from a deterministic bounded sample
    (unbiased hash order — see kmeans_centroids for the rationale)."""
    sample = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    X = _normalize(np.array([r[1] for r in sample], dtype=np.float64))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    rng = np.random.default_rng(seed)
    book = np.empty((m, k, ds))
    for j in range(m):
        S = X[:, j * ds : (j + 1) * ds]
        cents = S[rng.choice(len(S), min(k, len(S)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = S[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        book[j, : len(cents)] = cents
        if len(cents) < k:  # degenerate tiny sample: pad by repetition
            book[j, len(cents) :] = cents[0]
    return [[[float(v) for v in c] for c in sub] for sub in book]


def pq_encode(
    df: DataFrame,
    codebook: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes: binary[m]) — one GEMM-shaped argmin per subspace per
    Arrow batch. mapInArrow end to end: the list column flattens
    zero-copy into the (n, dim) matrix and the code bytes emit as ONE
    buffer-backed BinaryArray — no per-row Python anywhere (r3 advice:
    the old genexp sliced codes.tobytes() per row)."""
    import pyarrow as pa

    book = [[list(map(float, c)) for c in sub] for sub in codebook]
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("codes", T.BinaryType())]
    )

    def fn(batches):
        B = np.array(book)  # (m, k, ds)
        m, k, ds = B.shape
        cn2 = (B**2).sum(axis=2)  # (m, k)
        for batch in batches:
            ids = batch.column(0)
            vec = batch.column(1)
            n = len(vec)
            if n == 0:
                continue
            if vec.null_count:
                raise ValueError("pq_encode: null embedding")
            flat = vec.flatten().to_numpy(zero_copy_only=False)
            X = _normalize(flat.astype(np.float64).reshape(n, -1))
            codes = np.empty((n, m), dtype=np.uint8)
            for j in range(m):
                S = X[:, j * ds : (j + 1) * ds]
                # argmin ||s-c||² = argmin (‖c‖² - 2 s·c)
                codes[:, j] = np.argmin(cn2[j] - 2.0 * (S @ B[j].T), axis=1)
            offsets = np.arange(0, (n + 1) * m, m, dtype=np.int32)
            codes_arr = pa.BinaryArray.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offsets.tobytes()),
                 pa.py_buffer(codes.tobytes())],
            )
            yield pa.record_batch([ids, codes_arr], names=[id_col, "codes"])

    return df.select(id_col, vec_col).mapInArrow(fn, out_schema)


def pq_topk(
    codes_df: DataFrame,
    codebook: list,
    query: list,
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: (id, score) for the k best codes, score = cosine
    estimate (1 - ||q-x̂||²/2 on normalized vectors), rounded for
    engine-stable comparison."""
    book = [[list(map(float, c)) for c in sub] for sub in codebook]
    q = list(map(float, query))
    out_schema = T.StructType(
        [
            codes_df.schema[id_col],
            T.StructField("score", T.DoubleType()),
        ]
    )

    def fn(batches):
        import pandas as pd

        B = np.array(book)  # (m, k, ds)
        m, k, ds = B.shape
        qv = _normalize(np.array(q, dtype=np.float64)[None, :])[0]
        lut = np.empty((m, k))
        for j in range(m):
            lut[j] = ((qv[j * ds : (j + 1) * ds][None, :] - B[j]) ** 2).sum(axis=1)
        for pdf in batches:
            blob = b"".join(pdf["codes"])
            codes = np.frombuffer(blob, dtype=np.uint8).reshape(len(pdf), m)
            d2 = np.zeros(len(pdf))
            for j in range(m):
                d2 += lut[j][codes[:, j]]
            yield pd.DataFrame({id_col: pdf[id_col], "score": 1.0 - d2 / 2.0})

    scored = codes_df.mapInPandas(fn, out_schema)
    # orderBy+limit → TakeOrderedAndProject: per-partition heap, no sort
    return scored.orderBy(F.desc("score"), id_col).limit(topk)
