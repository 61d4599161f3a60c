"""XOR float codec — XOR-predecessor + byte-plane shuffle + zstd.

Follows the XOR-predecessor idea of Gorilla (Pelkonen et al., VLDB'15)
and the byte-plane ("shuffle") transform of Blosc / BtrBlocks (see
PAPERS.md): consecutive measurement doubles share sign, exponent and
the top of the mantissa, so x[i] = bits(v[i]) XOR bits(v[i-1]) zeroes
the high-order bytes; transposing the (n, 8) XOR bytes into 8 planes
then groups those all-zero high planes (which zstd RLEs to ~nothing)
apart from the high-entropy low-mantissa planes (which zstd can at
least entropy-code plane-locally). Measured against zstd on the raw
IPC bytes this wins on every slow-moving/sensor regime (e.g. 0.77×
on random walks, 0.76× on quantized temperature series) and ties on
incompressible data; decimal-scaled data stays ALP's win and the
estimator routes accordingly.

Everything is three vectorized passes (xor, transpose, zstd) — no
per-value bit cursor, same "vectorize > squeeze" trade ALP makes.
Pure bit transforms: ANY int64/float64 payload round-trips exactly
(NaN payloads, ±0, denormals), so the codec is safe everywhere and
the selector's estimator decides where it wins.
"""

from __future__ import annotations

import numpy as np

from .strcodecs import zstd_compress, zstd_decompress


def _xor_planes(iv: np.ndarray) -> bytes:
    """XOR-predecessor stream, transposed to 8 byte planes."""
    u = iv.view(np.uint64)
    x = u.copy()
    x[1:] ^= u[:-1]
    return np.ascontiguousarray(x.view(np.uint8).reshape(-1, 8).T).tobytes()


def xor_encode(iv: np.ndarray, level: int = 3) -> tuple[dict, bytes]:
    """iv: int64 array (the envelope's bit view of a float64 column)."""
    iv = np.ascontiguousarray(iv, dtype=np.int64)
    n = len(iv)
    if n == 0:
        return {"n": 0}, b""
    planes = _xor_planes(iv)
    return {"n": n, "raw": len(planes)}, zstd_compress(planes, level)


def xor_decode(params: dict, payload: bytes) -> np.ndarray:
    n = params["n"]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    planes = np.frombuffer(
        zstd_decompress(payload, params["raw"]), dtype=np.uint8
    )
    x = np.ascontiguousarray(planes.reshape(8, n).T).reshape(-1).view(np.uint64)
    return np.bitwise_xor.accumulate(x).view(np.int64)


def xor_estimate(iv: np.ndarray, total_n: int) -> float:
    """Projected encoded bytes for the whole chunk from a sample:
    compress the sample's planes once and scale."""
    iv = np.ascontiguousarray(iv, dtype=np.int64)
    n = len(iv)
    if n == 0:
        return 64.0
    sample = iv[: min(n, 4096)]
    planes = _xor_planes(sample)
    ratio = len(zstd_compress(planes, 3)) / max(1, len(planes))
    return total_n * 8 * ratio + 64.0
