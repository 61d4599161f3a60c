"""Vectorized bit-level primitives shared by every codec kernel.

These are the numpy twins of what the reference gets from the osmpbf
crate's dense-node delta decode (reference src/pbf.rs:181-183) and the
Arrow builder layer (reference src/osm_arrow.rs:98-265): pure functions
over contiguous buffers, no Spark, no Python-per-row loops.

All integer packing is exact for the full int64/uint64 domain: ranges
are computed with wrap-around (mod 2**64) arithmetic, which is lossless
because any int64 difference fits in uint64.
"""

from __future__ import annotations

import json
import struct

import numpy as np

_U64 = np.uint64
_I64 = np.int64


def bits_needed(max_delta: int) -> int:
    """Bits to represent values in [0, max_delta] (0 for all-equal)."""
    if max_delta <= 0:
        return 0
    return int(max_delta).bit_length()


def pack_uints(v: np.ndarray, width: int) -> bytes:
    """Bit-pack non-negative uint64 values < 2**width (LSB-first).

    Vectorized: expands to an (n, width) bit matrix then np.packbits.
    width == 0 ⇒ empty payload (all values are zero).
    """
    n = len(v)
    if n == 0 or width == 0:
        return b""
    v = v.astype(_U64, copy=False)
    shifts = np.arange(width, dtype=_U64)
    bits = ((v[:, None] >> shifts) & _U64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_uints(payload: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of pack_uints → uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=_U64)
    if width == 0:
        return np.zeros(n, dtype=_U64)
    bits = np.unpackbits(
        np.frombuffer(payload, dtype=np.uint8), count=n * width, bitorder="little"
    )
    shifts = np.arange(width, dtype=_U64)
    return (bits.reshape(n, width).astype(_U64) << shifts).sum(
        axis=1, dtype=_U64
    )


def sub_wrap(v: np.ndarray, base: int) -> np.ndarray:
    """(v - base) mod 2**64 as uint64 — exact frame-of-reference shift."""
    with np.errstate(over="ignore"):
        return (v.astype(_I64, copy=False).astype(_U64) - _U64(base & 0xFFFFFFFFFFFFFFFF))


def add_wrap(u: np.ndarray, base: int) -> np.ndarray:
    """Inverse of sub_wrap → int64 array."""
    with np.errstate(over="ignore"):
        return (u.astype(_U64, copy=False) + _U64(base & 0xFFFFFFFFFFFFFFFF)).astype(_I64)


def zigzag_encode(d: np.ndarray) -> np.ndarray:
    """Map signed int64 → uint64 with small magnitudes staying small."""
    d = d.astype(_I64, copy=False)
    with np.errstate(over="ignore"):
        return ((d << _I64(1)) ^ (d >> _I64(63))).astype(_U64)


def zigzag_decode(z: np.ndarray) -> np.ndarray:
    z = z.astype(_U64, copy=False)
    with np.errstate(over="ignore"):
        return ((z >> _U64(1)).astype(_I64)) ^ -((z & _U64(1)).astype(_I64))


# ---------------------------------------------------------------------------
# Multi-section payload container: nsec | (len, bytes)* — little-endian u32/u64
# ---------------------------------------------------------------------------

def pack_sections(sections: list[bytes]) -> bytes:
    head = struct.pack("<I", len(sections))
    parts = [head]
    for s in sections:
        parts.append(struct.pack("<Q", len(s)))
        parts.append(s)
    return b"".join(parts)


def unpack_sections(blob: bytes) -> list[bytes]:
    (nsec,) = struct.unpack_from("<I", blob, 0)
    off = 4
    out = []
    for _ in range(nsec):
        (ln,) = struct.unpack_from("<Q", blob, off)
        off += 8
        out.append(blob[off : off + ln])
        off += ln
    return out


def params_to_bytes(params: dict) -> bytes:
    return json.dumps(params, separators=(",", ":")).encode("utf-8")


def params_from_bytes(b: bytes) -> dict:
    return json.loads(b.decode("utf-8"))
