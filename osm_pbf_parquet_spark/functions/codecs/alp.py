"""ALP-style lossless float compression (decimal scaling + patches).

Follows the idea of "ALP: Adaptive Lossless floating-Point compression"
(Afroozeh & Boncz, SIGMOD 2024; see PAPERS.md family): most real-world
doubles are decimals — price-like columns round-trip exactly through
round(v·10^e)/10^e for a small exponent e. Encode the scaled integers
with frame-of-reference bit-packing; the rare values that do NOT
reconstruct bit-exactly (random doubles, NaN/Inf payloads) are stored
as positional patches of raw IEEE bits.

Exactness is verified bitwise during encode (uint64-view comparison),
so the codec is safe on ANY input — worst case everything lands in the
patch list and the selector's estimator steers away.
"""

from __future__ import annotations

import numpy as np

from .intcodecs import bitpack_decode, bitpack_encode
from .primitives import pack_sections, unpack_sections

MAX_EXP = 14
_POW10 = np.array([10.0**e for e in range(MAX_EXP + 1)])
_MAX_SAFE = float(1 << 52)


def _exact_mask(v: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """(ints, mask of positions where ints/10^e reproduces v bitwise)."""
    with np.errstate(all="ignore"):
        scaled = v * _POW10[e]
        ints = np.round(scaled)
        recon = ints / _POW10[e]
    ok = (
        (recon.view(np.uint64) == v.view(np.uint64))
        & (np.abs(ints) < _MAX_SAFE)
        & np.isfinite(v)
        # -0.0 reconstructs bit-exactly in float but the int64 code
        # stream cannot carry the sign of zero → patch it
        & ~(np.signbit(recon) & (ints == 0))
    )
    return ints, ok


def choose_exponent(sample: np.ndarray) -> tuple[int, float]:
    """Smallest exponent maximizing the bit-exact fraction."""
    best_e, best_frac = 0, -1.0
    for e in range(MAX_EXP + 1):
        _, ok = _exact_mask(sample, e)
        frac = float(ok.mean()) if len(ok) else 0.0
        if frac > best_frac + 1e-12:
            best_e, best_frac = e, frac
        if best_frac >= 1.0:
            break
    return best_e, best_frac


def alp_encode(v: np.ndarray) -> tuple[dict, bytes]:
    """v: float64 array (nulls already zero-filled by the envelope)."""
    v = v.astype(np.float64, copy=False)
    n = len(v)
    if n == 0:
        return {"n": 0, "e": 0, "i": {"n": 0, "min": 0, "w": 0},
                "x": {"n": 0, "min": 0, "w": 0}, "nx": 0}, pack_sections([b"", b"", b""])
    e, _ = choose_exponent(v[: min(n, 1 << 14)])
    ints, ok = _exact_mask(v, e)
    ints64 = np.where(ok, ints, 0.0).astype(np.int64)
    ip, ib = bitpack_encode(ints64)
    exc_pos = np.flatnonzero(~ok).astype(np.int64)
    xp, xb = bitpack_encode(exc_pos)
    exc_bits = v.view(np.uint64)[exc_pos].tobytes()
    params = {"n": n, "e": e, "i": ip, "x": xp, "nx": int(len(exc_pos))}
    return params, pack_sections([ib, xb, exc_bits])


def alp_decode(params: dict, payload: bytes) -> np.ndarray:
    n = params["n"]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    ib, xb, exc_bits = unpack_sections(payload)
    ints = bitpack_decode(params["i"], ib).astype(np.float64)
    with np.errstate(all="ignore"):
        out = ints / _POW10[params["e"]]
    if params["nx"]:
        pos = bitpack_decode(params["x"], xb)
        raw = np.frombuffer(exc_bits, dtype=np.uint64)
        ov = out.view(np.uint64)
        ov[pos] = raw
    # envelope expects the int64 bit view for float columns
    return out.view(np.int64)


def alp_estimate(sample: np.ndarray, n_total: int) -> float:
    """Estimated encoded bytes for the full column."""
    if len(sample) == 0:
        return 128.0
    e, frac = choose_exponent(sample)
    ints, ok = _exact_mask(sample, e)
    good = ints[ok]
    if len(good) == 0:
        return float(n_total * 16)  # all patches — never pick
    rng = float(good.max() - good.min())
    width = max(1, int(rng).bit_length() if rng >= 1 else 1)
    patch_cost = (1.0 - frac) * (8 + 4)
    return n_total * (width / 8.0 + patch_cost) + 128
