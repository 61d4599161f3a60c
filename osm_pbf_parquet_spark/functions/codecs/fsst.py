"""FSST-style symbol-table string compression, fully vectorized.

Implements the scheme from "FSST: Fast Random Access String Compression"
(Boncz, Neumann, Leis — VLDB 2020; see PAPERS.md): a table of ≤255
symbols of 1–8 bytes each; output is a byte stream where each byte is
either a symbol code (0–254) or the escape byte 255 followed by one
literal byte.

Everything is numpy-vectorized:

* encode — 256 KiB blocks build a uint64 rolling 8-byte window and do
  longest-match lookup via single-probe open-addressed hash tables (one
  per symbol length, cache-resident); the greedy left-to-right
  tokenization (inherently sequential) is solved with pointer-doubling
  over the "next token start" array in O(n log n) vector ops instead of
  a per-token Python loop.
* decode — escape positions are recovered with a run-parity argument
  (every maximal run of 0xFF bytes starts with an escape and alternates
  escape/literal), then symbol bytes are scattered with ragged-arange
  gathers from a fixed 8-byte-stride symbol buffer.

The symbol table is built greedily from a bounded sample (the only
Python loop, capped at SAMPLE_CAP bytes) scoring count×(len-1).

This is the string-side analogue of the reference's zstd block
compression (reference src/sink.rs:130-135), but per-column and
random-access-friendly.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYM_LEN = 8
SAMPLE_CAP = 1 << 15  # 32 KiB symbol-learning sample


def build_symbol_table(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Greedy frequency × (len-1) symbol selection over a bounded sample."""
    sample = sample[:SAMPLE_CAP]
    n = len(sample)
    if n == 0:
        return []
    counts: Counter = Counter()
    mv = memoryview(sample)
    for k in range(2, MAX_SYM_LEN + 1):
        if n < k:
            break
        step = 1 if n <= 8192 else 2  # stride sampling keeps the loop bounded
        for i in range(0, n - k + 1, step):
            counts[bytes(mv[i : i + k])] += 1
    # gain of a multi-byte symbol ≈ (len-1) bytes saved per occurrence
    scored = [(cnt * (len(s) - 1), s) for s, cnt in counts.items() if cnt > 1]
    scored.sort(key=lambda t: (-t[0], t[1]))
    # cap distinct multi-byte lengths to the 3 most productive: encode
    # matching costs one vector pass per distinct length, and the tail
    # lengths contribute little coverage
    by_len_gain: dict[int, int] = {}
    for gain, s in scored[:512]:
        by_len_gain[len(s)] = by_len_gain.get(len(s), 0) + gain
    kept_lengths = set(sorted(by_len_gain, key=by_len_gain.get, reverse=True)[:3])
    scored = [(g, s) for g, s in scored if len(s) in kept_lengths]
    table = [s for _, s in scored[: max_symbols - 64]]
    # single-byte symbols for the most frequent bytes: turns would-be
    # 2-byte escapes into 1-byte codes
    byte_counts = Counter(sample)
    for b, _ in byte_counts.most_common(min(64, max_symbols - len(table))):
        table.append(bytes([b]))
    return table[:max_symbols]


def _sym_key(sym: bytes) -> int:
    return int.from_bytes(sym, "little")


_BLOCK = 1 << 16


def _greedy_starts(step: np.ndarray) -> np.ndarray:
    """Token start positions of the greedy left-to-right scan.

    step[i] = token length if a token starts at i. Sequential recurrence
    p ← p + step[p] solved per 64 KiB block with pointer doubling.
    """
    n = len(step)
    out: list[np.ndarray] = []
    p = 0
    while p < n:
        end = min(p + _BLOCK, n)
        m = end - p
        loc = np.arange(m, dtype=np.int64) + step[p:end]
        jump = np.minimum(np.append(loc, m), m)
        visited = np.zeros(m + 1, dtype=bool)
        visited[0] = True
        for _ in range(max(1, int(np.ceil(np.log2(m + 1))))):
            reach = np.flatnonzero(visited)
            visited[jump[reach]] = True
            jump = jump[jump]
        local_starts = np.flatnonzero(visited[:m])
        out.append(local_starts + p)
        last = int(local_starts[-1])
        p = p + last + int(step[p + last])
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


def fsst_compress(data: bytes, table: list[bytes]) -> bytes:
    """Encode data against the symbol table. Exact inverse: fsst_decompress."""
    n = len(data)
    if n == 0:
        return b""
    arr = np.frombuffer(data, dtype=np.uint8)
    if not table:
        # no symbols: every byte escaped
        out = np.empty(2 * n, dtype=np.uint8)
        out[0::2] = ESCAPE
        out[1::2] = arr
        return out.tobytes()

    match_len = np.zeros(n, dtype=np.int8)
    match_code = np.zeros(n, dtype=np.uint8)

    by_len: dict[int, list[tuple[int, int]]] = {}
    for code, sym in enumerate(table):
        by_len.setdefault(len(sym), []).append((_sym_key(sym), code))

    # Symbol lookup: single-probe open-addressed hash table per length
    # (one gather + compare per position; an insertion collision drops
    # the rarer symbol — lossy for compression, never for correctness).
    _HBITS = 12
    _HSIZE = 1 << _HBITS
    _MIX = np.uint64(0x9E3779B97F4A7C15)
    _SHIFT = np.uint64(64 - _HBITS)
    tables = []
    for k in sorted(by_len):
        mask = np.uint64((1 << (8 * k)) - 1) if k < 8 else np.uint64(0xFFFFFFFFFFFFFFFF)
        tbl_key = np.zeros(_HSIZE, dtype=np.uint64)
        tbl_code = np.zeros(_HSIZE, dtype=np.uint8)
        tbl_full = np.zeros(_HSIZE, dtype=bool)
        for key, code in sorted(by_len[k]):
            h = ((key * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF) >> (64 - _HBITS)
            if not tbl_full[h]:
                tbl_key[h], tbl_code[h], tbl_full[h] = key, code, True
        tables.append((k, mask, tbl_key, tbl_code, tbl_full))

    # Blocked matching: windows + per-length lookups run on 256 KiB
    # slices so every temporary stays cache-resident — ~4× less memory
    # traffic than whole-buffer passes (this loop is bandwidth-bound).
    # Ascending length order: longer matches overwrite shorter ones.
    B = 1 << 18
    padded = np.zeros(n + MAX_SYM_LEN, dtype=np.uint8)
    padded[:n] = arr
    with np.errstate(over="ignore"):
        for b in range(0, n, B):
            e = min(b + B, n)
            m = e - b
            wb = np.zeros(m, dtype=np.uint64)
            for j in range(MAX_SYM_LEN):
                wb |= padded[b + j : b + j + m].astype(np.uint64) << np.uint64(8 * j)
            ml = match_len[b:e]
            mc = match_code[b:e]
            for k, mask, tbl_key, tbl_code, tbl_full in tables:
                wk = wb & mask
                slots = ((wk * _MIX) >> _SHIFT).astype(np.int64)
                hit = tbl_full[slots] & (tbl_key[slots] == wk)
                ml[hit] = k
                mc[hit] = tbl_code[slots[hit]]
    # tail guard: a match may not overrun the buffer (the zero padding
    # could otherwise fake a hit); overrunning tails become literals
    tail = np.arange(max(0, n - MAX_SYM_LEN), n)
    bad = tail + match_len[tail] > n
    match_len[tail[bad]] = 0

    # greedy tokenization via blockwise pointer doubling on next-start
    # pointers: the chain is strictly increasing with step ≤ 8, so each
    # 64 KiB block needs only its entry point from the previous block —
    # doubling then runs on small local arrays (cache-friendly) instead
    # of random gathers across the whole buffer.
    step = np.where(match_len > 0, match_len, 1)
    starts = _greedy_starts(step)
    is_sym = match_len[starts] > 0
    sizes = np.where(is_sym, 1, 2)
    offs = np.concatenate(([0], np.cumsum(sizes)))
    out = np.empty(offs[-1], dtype=np.uint8)
    sym_off = offs[:-1][is_sym]
    out[sym_off] = match_code[starts[is_sym]]
    esc_off = offs[:-1][~is_sym]
    out[esc_off] = ESCAPE
    out[esc_off + 1] = arr[starts[~is_sym]]
    return out.tobytes()


def fsst_decompress(encoded: bytes, table: list[bytes]) -> bytes:
    n = len(encoded)
    if n == 0:
        return b""
    e = np.frombuffer(encoded, dtype=np.uint8)
    is_ff = e == ESCAPE
    ff_pos = np.flatnonzero(is_ff)
    is_literal = np.zeros(n, dtype=bool)
    if len(ff_pos):
        # each maximal run of 0xFF starts with an escape and alternates
        new_run = np.concatenate(([True], np.diff(ff_pos) > 1))
        run_head_idx = np.maximum.accumulate(
            np.where(new_run, np.arange(len(ff_pos)), 0)
        )
        offset_in_run = ff_pos - ff_pos[run_head_idx]
        escapes = ff_pos[offset_in_run % 2 == 0]
        is_literal[np.minimum(escapes + 1, n - 1)] = True

    starts = np.flatnonzero(~is_literal)
    tok = e[starts]
    esc_mask = tok == ESCAPE

    sym_len = np.ones(256, dtype=np.int64)
    sym_flat = np.zeros(256 * MAX_SYM_LEN, dtype=np.uint8)
    for code, sym in enumerate(table):
        sym_len[code] = len(sym)
        sym_flat[code * MAX_SYM_LEN : code * MAX_SYM_LEN + len(sym)] = np.frombuffer(
            sym, dtype=np.uint8
        )

    out_lens = np.where(esc_mask, 1, sym_len[tok])
    offs = np.concatenate(([0], np.cumsum(out_lens)))
    out = np.empty(offs[-1], dtype=np.uint8)

    if esc_mask.any():
        out[offs[:-1][esc_mask]] = e[starts[esc_mask] + 1]

    sidx = np.flatnonzero(~esc_mask)
    if len(sidx):
        codes = tok[sidx].astype(np.int64)
        lens = sym_len[codes]
        total = int(lens.sum())
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        dst = np.repeat(offs[:-1][sidx], lens) + within
        src = np.repeat(codes * MAX_SYM_LEN, lens) + within
        out[dst] = sym_flat[src]
    return out.tobytes()
