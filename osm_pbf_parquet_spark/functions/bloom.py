"""Per-chunk Bloom filters for point-lookup pruning.

Zone maps (stat_min/stat_max) prune RANGE predicates but are useless
for point lookups on high-cardinality keys — every chunk of a
url-hash-partitioned store spans the full url range, yet "fetch THIS
url out of 10^12 pages" is the most common single-row query a web
table serves. A per-chunk Bloom filter of the key column answers
"might this chunk contain v?" from metadata alone: the lookup prunes
to ~1 chunk group without touching any payload (the same trick
Parquet bloom_filter_enabled / Iceberg puffin blobs play, rebuilt
here for the chunk store).

All hashing is vectorized numpy (no per-value Python):

* strings/binary — two polynomial rolling hashes over the flat byte
  buffer (per-string segment sums via np.add.reduceat; mod-2^64 wraps
  free on uint64);
* ints/floats/timestamps — two splitmix64-style avalanche mixes of
  the 64-bit value view;
* k probe positions per value via Kirsch-Mitzenmacher double hashing
  (h1 + i*h2), bits set with np.bitwise_or.at.

Sizing defaults (10 bits/value, k=7) give ~0.8% false positives —
a false positive only costs one wasted chunk decode, never a miss.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_P1 = np.uint64(1099511628211)       # FNV-ish odd base
_P2 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd base
_HEADER = struct.Struct("<QB")       # m bits, k probes


def _mix64(x: np.ndarray, seed: np.uint64) -> np.ndarray:
    """splitmix64 finalizer — avalanche a uint64 lane."""
    with np.errstate(over="ignore"):
        z = x + seed
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _poly_hash(lens: np.ndarray, flat: np.ndarray, base: np.uint64) -> np.ndarray:
    """Per-string polynomial hash: sum(byte[i] * base^pos) mod 2^64,
    segment-summed with reduceat — zero Python loops."""
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    total = int(lens.sum())
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    if total == 0:
        # all-empty batch: same sentinel+mix as empty entries below
        return _mix64(np.full(n, np.uint64(0x517CC1B727220A95)), base)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    max_len = int(lens.max())
    with np.errstate(over="ignore"):
        # vectorized power table: uint64 cumprod wraps mod 2^64 exactly
        # like the sequential multiply (r3 advice: the Python loop here
        # made long-text bloom columns a per-chunk megaiteration)
        powers = np.concatenate((
            [np.uint64(1)],
            np.cumprod(np.full(max_len - 1, base, dtype=np.uint64))
        )) if max_len > 1 else np.ones(1, dtype=np.uint64)
        terms = flat.astype(np.uint64) * powers[pos]
    # reduceat needs non-empty segments: empty strings hash via the
    # sentinel fill then get patched from the segment-sum positions
    out = np.full(n, np.uint64(0x517CC1B727220A95))
    nonempty = lens > 0
    if nonempty.any():
        seg = np.add.reduceat(terms, starts[nonempty])
        out[nonempty] = seg
    return _mix64(out, base)


def _value_hashes(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 per non-null value."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    t = col.type
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        from .codecs.envelope import _str_views

        lens, data = _str_views(col)
        flat = np.frombuffer(data, dtype=np.uint8)
        return _poly_hash(lens, flat, _P1), _poly_hash(lens, flat, _P2)
    # fixed-width: 64-bit view (cast smaller ints up; floats via bits)
    if pa.types.is_floating(t):
        v = col.cast(pa.float64()).to_numpy(zero_copy_only=False).view(np.uint64)
    elif pa.types.is_timestamp(t) or pa.types.is_date(t):
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
    else:
        v = (
            col.cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
        )
    return _mix64(v, _P1), _mix64(v, _P2)


def bloom_build(col: pa.Array, bits_per_value: int = 10, k: int = 7) -> bytes:
    """Bloom filter bytes (header m,k + bit array) over non-null values."""
    h1, h2 = _value_hashes(col)
    n = len(h1)
    m = max(64, n * bits_per_value)
    m = (m + 7) // 8 * 8  # byte-align
    bits = np.zeros(m // 8, dtype=np.uint8)
    with np.errstate(over="ignore"):
        for i in range(k):  # k passes over vectorized arrays
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)))
    return _HEADER.pack(m, k) + bits.tobytes()


def bloom_probe_positions(value, dtype: pa.DataType) -> tuple[int, int]:
    """(h1, h2) for one literal, via the same vectorized path."""
    arr = pa.array([value], type=dtype)
    h1, h2 = _value_hashes(arr)
    return int(h1[0]), int(h2[0])


def bloom_might_contain_many(blobs, h1: int, h2: int) -> np.ndarray:
    """Vectorized probe of MANY serialized filters with one (h1, h2)
    literal — the metadata-scan path of ``prune_by_point``, where a
    100 TB store has millions of chunk rows and a per-row Python probe
    (the r5 shape) would dominate the lookup. All header parsing, the
    Kirsch-Mitzenmacher positions, and the bit tests run as numpy
    passes over the stacked blob buffer; per-blob filter geometry
    (m, k differ per chunk) is handled lane-wise. None/empty blob →
    True (no filter is no evidence of absence)."""
    bs = [bytes(b) if b is not None else b"" for b in blobs]
    n = len(bs)
    out = np.ones(n, dtype=bool)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    has = lens > 0
    if not has.any():
        return out
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    if (lens[has] < _HEADER.size).any():
        raise ValueError("corrupt bloom filter blob: truncated header")
    o = offs[has]
    m = np.zeros(len(o), dtype=np.uint64)
    for j in range(8):  # little-endian uint64 header lane
        m |= flat[o + j].astype(np.uint64) << np.uint64(8 * j)
    k = flat[o + 8].astype(np.uint64)
    # bounds: without this, a truncated blob's bit probes would read
    # the NEXT blob's bytes in the stacked buffer (silently pruning a
    # chunk that contains the value) — the scalar twin fails honestly
    if (m >> np.uint64(63)).any():  # int64-cast would wrap negative
        raise ValueError("corrupt bloom filter blob: absurd bit count")
    need = _HEADER.size + ((m.astype(np.int64) + 7) >> 3)
    if (m == 0).any() or (lens[has] < need).any():
        raise ValueError(
            "corrupt bloom filter blob: zero-size or truncated bit array"
        )
    ok = np.ones(len(o), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(int(k.max())):
            idx = (np.uint64(h1) + np.uint64(i) * np.uint64(h2)) % m
            byte = flat[o + 9 + (idx >> np.uint64(3)).astype(np.int64)]
            bit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1
            ok &= bit.astype(bool) | (np.uint64(i) >= k)
    out[has] = ok
    return out


def bloom_might_contain(blob: bytes, h1: int, h2: int) -> bool:
    """Probe a serialized filter. None/empty blob → True (no filter
    means no evidence of absence)."""
    if not blob:
        return True
    m, k = _HEADER.unpack_from(blob, 0)
    bits = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size)
    for i in range(k):
        # wrap at 2^64 exactly like the uint64 build-side arithmetic
        idx = ((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % m
        if not (bits[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True
