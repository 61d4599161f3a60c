"""Deterministic Common-Crawl-style `pages` fixture (FIXTURES.md F1).

Hermetic stand-in for the reference's e2e input (reference
test/test.sh:11-15 downloads a real PBF + golden XML; we synthesize
instead — no external data). Schema matches BASELINE.json input_hint:

    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)

Properties engineered to exercise every codec + the skew path:
  url      Zipf(s≈1.2) hosts, one pathological host ≈20% of rows
  warc_ts  near-sorted µs timestamps with jitter → delta/FoR
  html     pseudo-HTML bytes incl. non-UTF8 sequences → binary safety
  text     vocabulary word-soup → FSST/zstd; byte-identical per url is
           the round-trip invariant
  lang     ~30 values, Zipf, nulls mixed in → dictionary
Adversarial slices: empty strings/binary, nulls in text/lang.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
N_LANGS = 30
HEAVY_HOST = "pathological-host.example.com"


def _word_soup(rng: np.random.Generator, n_rows: int, vocab: list[bytes],
               min_words: int, max_words: int) -> tuple[np.ndarray, bytes]:
    """Vectorized ragged word-soup: (lens, flat utf-8 bytes)."""
    wlens = np.array([len(w) + 1 for w in vocab], dtype=np.int64)  # +1 space
    flat_vocab = np.frombuffer(b"".join(w + b" " for w in vocab), dtype=np.uint8)
    woffs = np.concatenate(([0], np.cumsum(wlens)))
    n_words = rng.integers(min_words, max_words + 1, n_rows)
    total_words = int(n_words.sum())
    ids = rng.integers(0, len(vocab), total_words)
    piece_lens = wlens[ids]
    total = int(piece_lens.sum())
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(piece_lens) - piece_lens, piece_lens
    )
    src = np.repeat(woffs[ids], piece_lens) + within
    data = flat_vocab[src]
    row_ends = np.cumsum(n_words)
    row_lens = np.add.reduceat(piece_lens, np.concatenate(([0], row_ends[:-1])))
    return row_lens, data.tobytes()


def _string_array(lens: np.ndarray, data: bytes, nulls: np.ndarray | None = None,
                  typ: pa.DataType = None) -> pa.Array:
    typ = typ or pa.string()
    odt = np.int64 if typ in (pa.large_string(), pa.large_binary()) else np.int32
    offs = np.concatenate(([0], np.cumsum(lens, dtype=np.int64))).astype(odt)
    bufs = [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)]
    arr = pa.Array.from_buffers(typ, len(lens), bufs)
    if nulls is not None and nulls.any():
        mask = pa.array(~nulls)
        import pyarrow.compute as pc

        arr = pc.if_else(mask, arr, pa.scalar(None, type=typ))
    return arr


def generate_pages(n_rows: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)

    # hosts: ~1% distinct, Zipf-weighted, plus one heavy host at ~20%
    n_hosts = max(3, n_rows // 100)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    weights = ranks ** -1.2
    weights /= weights.sum()
    host_ids = rng.choice(n_hosts, n_rows, p=weights)
    heavy = rng.random(n_rows) < 0.20
    hosts = np.array([f"host{h:05d}.example.org" for h in range(n_hosts)])
    host_col = np.where(heavy, HEAVY_HOST, hosts[host_ids])

    # unique urls: host + seeded slug + row ordinal
    slugs = rng.integers(0, 1 << 32, n_rows)
    urls = [
        f"https://{h}/p/{s:08x}/{i}" for i, (h, s) in enumerate(zip(host_col, slugs))
    ]

    # near-sorted crawl timestamps (µs), occasional out-of-order jitter
    base = np.int64(1_700_000_000_000_000)
    deltas = rng.integers(0, 2_000_000, n_rows)
    ts = base + np.cumsum(deltas)
    jitter_idx = rng.random(n_rows) < 0.01
    ts[jitter_idx] -= rng.integers(0, 10_000_000, int(jitter_idx.sum()))
    warc_ts = pa.array(ts.astype("datetime64[us]"))

    # text: word soup; a few empty strings and nulls
    vocab = [w.encode() for w in (
        "the of and to in data web page crawl content spark table column "
        "encode partition value stream index query archive html body title "
        "link image script style nav footer header section"
    ).split()]
    tlens, tdata = _word_soup(rng, n_rows, vocab, 8, 120)
    empty_t = rng.random(n_rows) < 0.01
    null_t = rng.random(n_rows) < 0.01
    tlens2 = np.where(empty_t | null_t, 0, tlens)
    # rebuild data excluding dropped rows' bytes
    keep = ~(empty_t | null_t)
    offs = np.concatenate(([0], np.cumsum(tlens)))
    dat = np.frombuffer(tdata, dtype=np.uint8)
    pieces = [dat[offs[i]:offs[i + 1]] for i in np.flatnonzero(keep)]
    tdata2 = b"".join(p.tobytes() for p in pieces)
    text = _string_array(tlens2, tdata2, nulls=null_t)

    # html: tag-soup bytes embedding text + non-UTF8 noise; some empty.
    # assembled fully vectorized (ragged scatter/gather, no per-row loop)
    hlens_extra = rng.integers(16, 256, n_rows).astype(np.int64)
    noise = rng.integers(0, 256, int(hlens_extra.sum()), dtype=np.uint8)
    empty_h = rng.random(n_rows) < 0.01
    pre, mid, suf = b"<html><body>", b"\xff\xfe", b"</body></html>"
    tl = tlens2.astype(np.int64)
    nl = hlens_extra
    hlens = np.where(empty_h, 0, len(pre) + tl + len(mid) + nl + len(suf))
    tl = np.where(empty_h, 0, tl)
    nl = np.where(empty_h, 0, nl)
    row_off = np.concatenate(([0], np.cumsum(hlens)))[:-1]
    out = np.empty(int(hlens.sum()), dtype=np.uint8)
    keep = ~empty_h

    def _scatter_const(dst_off: np.ndarray, blob: bytes) -> None:
        for k, ch in enumerate(blob):
            out[dst_off + k] = ch

    def _scatter_ragged(dst_off, seg_lens, src, src_off):
        total = int(seg_lens.sum())
        if total == 0:
            return
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(seg_lens) - seg_lens, seg_lens
        )
        out[np.repeat(dst_off, seg_lens) + within] = src[
            np.repeat(src_off, seg_lens) + within
        ]

    o = row_off[keep]
    _scatter_const(o, pre)
    tdat_np = np.frombuffer(tdata2, dtype=np.uint8)
    toffs = np.concatenate(([0], np.cumsum(tlens2, dtype=np.int64)))
    _scatter_ragged(o + len(pre), tl[keep], tdat_np, toffs[:-1][keep])
    _scatter_const(o + len(pre) + tl[keep], mid)
    noffs = np.concatenate(([0], np.cumsum(hlens_extra)))
    _scatter_ragged(o + len(pre) + tl[keep] + len(mid), nl[keep], noise, noffs[:-1][keep])
    _scatter_const(o + len(pre) + tl[keep] + len(mid) + nl[keep], suf)
    html = _string_array(hlens, out.tobytes(), typ=pa.large_binary()).cast(pa.binary())

    # lang: Zipf over 30 codes, some nulls
    lang_weights = np.arange(1, N_LANGS + 1, dtype=np.float64) ** -1.5
    lang_weights /= lang_weights.sum()
    lang_codes = np.array(
        "en de fr es zh ja ru pt it nl pl tr ar ko sv fi no da cs hu ro el he th vi id uk bg hr sk".split()
    )
    lang_ids = rng.choice(N_LANGS, n_rows, p=lang_weights)
    null_l = rng.random(n_rows) < 0.02
    lang = pa.array(
        [None if nl else lang_codes[li] for li, nl in zip(lang_ids, null_l)],
        type=pa.string(),
    )

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": warc_ts,
            "html": html,
            "text": text,
            "lang": lang,
        }
    )


def pages_parquet(path: str, n_rows: int, seed: int = SEED) -> str:
    """Write the fixture to parquet once; idempotent cache."""
    import os

    import pyarrow.parquet as pq

    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(generate_pages(n_rows, seed), tmp)
        os.rename(tmp, path)
    return path
