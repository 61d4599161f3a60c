"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a
struct of typed metadata, processed through Arrow-batched
`mapInPandas` — the same batch shape a real decoder (PIL/ffmpeg)
would use. Header parsing for PNG / GIF / JPEG is REAL (pure-stdlib
struct over the first KB — `parse_image_header`), and since r5 PNG
PIXEL decode is real too: a from-scratch critical-path codec
(`encode_png`/`decode_png` — stdlib zlib + CRC-verified chunk walk +
numpy unfiltering of all five filter types, color types 0/2/4/6) with
`decode_image_pixels` as the Arrow-batched operator over it. JPEG/GIF
pixel decode stays stubbed (`decode_image` raises: their entropy
coders are a codec library in themselves), with `fake_decode_meta` as
the deterministic fallback for unrecognized magics so the plumbing
stays total.

The binary payloads round-trip through the codec engine bit-exactly
(envelope str-kind handles binary), which is the part that matters at
100 TB: media bytes dominate the table's mass.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (greyscale, rgb, palette, grey+a, rgba)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG start-of-frame markers (baseline/extended/progressive/lossless …)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """(format, width, height, channels) from raw image bytes, or None
    if the magic is unrecognized / the header is truncated.

    Pure stdlib: PNG IHDR (big-endian u32 dims at offset 16, color
    type at 25), GIF87a/89a logical screen (little-endian u16 at 6),
    JPEG marker scan to the first SOF segment (big-endian u16 dims).
    """
    if payload is None:
        return None
    if payload.startswith(_PNG_MAGIC) and len(payload) >= 26:
        w, h = struct.unpack_from(">II", payload, 16)
        color_type = payload[25]
        return ("png", w, h, _PNG_CHANNELS.get(color_type, 0))
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack_from("<HH", payload, 6)
        return ("gif", w, h, 3)
    if payload[:2] == b"\xff\xd8":
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None  # desynced marker stream
            marker = payload[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
            if marker in _JPEG_SOF:
                if pos + 9 >= n:
                    return None
                h, w = struct.unpack_from(">HH", payload, pos + 5)
                ncomp = payload[pos + 9]
                return ("jpeg", w, h, ncomp)
            pos += 2 + seg_len
        return None
    return None


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic binary payload column (fixture duty —
    real tables arrive with media bytes already present)."""
    return df.select(
        F.col(id_col),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes):
    """Pixel decode dispatch — all three web-image containers decode
    FOR REAL, from scratch: PNG (stdlib zlib + numpy unfiltering),
    baseline JPEG (canonical Huffman + batched IDCT, operators/
    jpeg.py), GIF87a/89a (variable-width LZW + de-interlace,
    operators/gif.py) — r6 closed the r5 "What's missing" #1 entirely.
    Progressive/subsampled JPEG and animated-GIF tails still raise
    honestly inside their codecs."""
    if payload and payload.startswith(_PNG_MAGIC):
        return decode_png(payload)
    if payload and payload.startswith(b"\xff\xd8"):
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload and payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "unrecognized image payload: PNG, baseline JPEG and GIF87a/89a "
        "are decoded from scratch; no other container is implemented"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for metadata of UNRECOGNIZED payloads:
    derives (width, height, channels) from the payload digest."""
    if not payload:
        return (0, 0, 0)
    d = hashlib.sha256(payload).digest()
    return (64 + d[0] % 1920, 64 + d[1] % 1080, 1 + d[2] % 4)


def synth_image_payload(doc_id: int, fmt: str, width: int, height: int) -> bytes:
    """Deterministic minimal-but-REAL image headers (fixture duty):
    the bytes carry genuine PNG/GIF/JPEG structure so
    `parse_image_header` exercises its real parsing path, and the dims
    are a pure function of doc_id so a SQL oracle can state them."""
    body = hashlib.sha256(str(doc_id).encode()).digest()  # opaque "pixels"
    if fmt == "png":
        ihdr = struct.pack(">II", width, height) + bytes([8, 6, 0, 0, 0])
        return (
            _PNG_MAGIC
            + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", 0)  # fixture: crc field zeroed
            + body
        )
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + body
    if fmt == "jpeg":
        sof = (
            b"\xff\xd8"  # SOI
            + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"  # APP0 stub
            + b"\xff\xc0" + struct.pack(">H", 17)  # SOF0, 3 components
            + bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
            + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        )
        return sof + body
    raise ValueError(f"unknown fixture format {fmt}")


def extract_media_meta(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """mapInPandas media metadata extraction (Arrow-batched): REAL
    header parsing for PNG/GIF/JPEG magics, deterministic fake for
    anything else (fmt='unknown')."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            fmts, widths, heights, chans = [], [], [], []
            for p in payloads:
                p = p if p is not None else b""
                parsed = parse_image_header(p)
                if parsed is None:
                    w, h, c = fake_decode_meta(p)
                    fmts.append("unknown")
                else:
                    _f, w, h, c = parsed
                    fmts.append(_f)
                widths.append(w); heights.append(h); chans.append(c)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "fmt": fmts,
                    "width": widths,
                    "height": heights,
                    "channels": chans,
                }
            )

    return df.mapInPandas(fn, MEDIA_META_SCHEMA)


FIXTURE_FMTS = ("png", "gif", "jpeg")


def fixture_dims(doc_id: int) -> tuple[str, int, int]:
    """The SQL-expressible dim formula shared by fixture and oracle."""
    return (
        FIXTURE_FMTS[doc_id % 3],
        100 + doc_id % 900,
        100 + (doc_id * 7) % 900,
    )


def attach_image_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) with REAL image headers whose format and dims
    are pure functions of doc_id — lets a plain-SQL oracle state the
    expected parse results."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                fmt, w, h = fixture_dims(int(i))
                payloads.append(synth_image_payload(int(i), fmt, w, h))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("payload", T.BinaryType())]
    )
    return df.select(id_col).mapInPandas(fn, schema)


def media_meta_sql_view(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """JVM-only metadata subset (n_bytes, sha256) — the SQL-expressible
    projection used for the DuckDB-oracle contract query."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


# --- real PNG codec (pure stdlib zlib/crc32 + numpy) -----------------
# Full critical-chunk decode for non-interlaced 8-bit PNGs, color
# types 0/2/4/6 (grey, rgb, grey+alpha, rgba) with ALL five filter
# types — closing the r4 "pixel decode is a stub" residue without any
# external image lib. Palette (3) and interlace need nothing new
# conceptually and are refused loudly. JPEG/GIF stay stubbed: their
# entropy coders are a codec library in themselves, out of scope for
# column plumbing. Filters: None/Up are pure vector ops; Sub is a
# wrapping uint8 cumsum over the pixel axis (mod-256 accumulate IS
# the spec's byte arithmetic); Average/Paeth carry a left-pixel
# dependency, so those rows walk pixels in Python with the channel
# axis vectorized — decode cost is O(pixels) either way and media
# thumbnails are small next to the payload bytes the codec engine
# moves.

import binascii
import zlib as _zlib

import numpy as np


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    crc = binascii.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


_COLOR_TYPE_OF_CHANNELS = {1: 0, 3: 2, 2: 4, 4: 6}


def encode_png(arr: "np.ndarray", filter_mode: str = "cycle") -> bytes:
    """Spec-valid PNG from a (h, w) or (h, w, channels) uint8 array.
    ``filter_mode`` 'none' emits filter 0 rows; 'cycle' rotates
    through filter types 0-4 by row index so a decode round-trip
    exercises every unfilter path."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 samples")
    if ch not in _COLOR_TYPE_OF_CHANNELS:
        raise ValueError(f"unsupported channel count {ch}")
    bpp = ch
    raw = arr.reshape(h, w * ch).astype(np.uint8)
    out = []
    prior = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        row = raw[y]
        ft = 0 if filter_mode == "none" else y % 5
        left = np.zeros_like(row)
        left[bpp:] = row[:-bpp]
        upleft = np.zeros_like(prior)
        upleft[bpp:] = prior[:-bpp]
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prior
        elif ft == 3:
            filt = row - ((left.astype(np.uint16) + prior) // 2).astype(np.uint8)
        else:
            a = left.astype(np.int16)
            b = prior.astype(np.int16)
            c = upleft.astype(np.int16)
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, b, c)).astype(np.uint8)
            filt = row - pred
        out.append(bytes([ft]) + filt.tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8,
                       _COLOR_TYPE_OF_CHANNELS[ch], 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(b"".join(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> "np.ndarray":
    """(h, w, channels) uint8 array from a PNG — full from-scratch
    critical path: chunk walk with CRC verification, concatenated
    IDAT inflate, per-row unfilter of all five filter types. Raises
    ValueError on corruption (CRC/length/filter) and
    NotImplementedError for palette / interlace / non-8-bit depth."""
    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    n = len(payload)
    idat = []
    ihdr = None
    ended = False
    while pos + 8 <= n:
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > n:
            raise ValueError("truncated chunk")
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if binascii.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + ln
    if ihdr is None or not idat or not ended:
        # a stream cut before IEND may still hold all the IDAT bytes,
        # but the engine fails fast on corrupt input (X6) rather than
        # guessing completeness
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, ctype, comp, filt_m, interlace = ihdr
    if depth != 8 or ctype == 3 or interlace or comp or filt_m:
        raise NotImplementedError(
            f"unsupported PNG shape: depth={depth} color={ctype} "
            f"interlace={interlace}"
        )
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    raw = _zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    fts = rows[:, 0]
    data = rows[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    bpp = ch
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(fts[y])
        row = data[y]
        if ft == 0:
            rec = row.copy()
        elif ft == 1:
            # recon[i] = raw[i] + recon[i-bpp]: wrapping uint8 cumsum
            # down the pixel axis per channel lane
            rec = np.cumsum(
                row.reshape(w, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ft == 2:
            rec = row + prior
        elif ft == 3:
            rec = np.empty(stride, dtype=np.uint8)
            px = row.reshape(w, bpp)
            pr = prior.reshape(w, bpp).astype(np.uint16)
            left = np.zeros(bpp, dtype=np.uint16)
            rv = rec.reshape(w, bpp)
            for x in range(w):
                left = (px[x] + ((left + pr[x]) >> 1)).astype(np.uint8)
                rv[x] = left
                left = left.astype(np.uint16)
        elif ft == 4:
            rec = np.empty(stride, dtype=np.uint8)
            px = row.reshape(w, bpp)
            prw = prior.reshape(w, bpp).astype(np.int16)
            rv = rec.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            for x in range(w):
                b_ = prw[x]
                p = left + b_ - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - b_)
                pc = np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, b_, upleft))
                cur = (px[x] + pred.astype(np.uint8)).astype(np.uint8)
                rv[x] = cur
                left = cur.astype(np.int16)
                upleft = b_
        else:
            raise ValueError(f"bad filter type {ft} in row {y}")
        out[y] = rec
        prior = rec
    return out.reshape(h, w, ch)


def png_fixture_shape(doc_id: int) -> tuple[int, int, int]:
    """(width, height, channels) of the PNG pixel fixture — pure
    function of doc_id so a SQL oracle can restate it."""
    return (4 + doc_id % 13, 4 + (doc_id * 5) % 11, 1 + doc_id % 4)


def synth_png_pixels(doc_id: int) -> "np.ndarray":
    """Deterministic pixel array with a SQL-stateable sample formula:
    sample[y, x, k] = (doc_id*31 + y*7 + x*3 + k*11) % 256."""
    w, h, ch = png_fixture_shape(doc_id)
    y = np.arange(h).reshape(h, 1, 1)
    x = np.arange(w).reshape(1, w, 1)
    k = np.arange(ch).reshape(1, 1, ch)
    return ((doc_id * 31 + y * 7 + x * 3 + k * 11) % 256).astype(np.uint8)


def attach_png_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of spec-valid PNGs (CRCs, cycled filter types
    0-4 across rows) whose pixels follow the formula above."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                encode_png(synth_png_pixels(int(i)), filter_mode="cycle")
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("payload", T.BinaryType())]
    )
    return df.select(id_col).mapInPandas(fn, schema)


def jpeg_fixture_blocks(doc_id: int) -> "np.ndarray":
    """Quantized DC-only coefficient blocks with a SQL-stateable
    reconstruction: with the flat q=8 table a lone DC decodes to
    EXACTLY dc + 128 per pixel, and dc(b) = (doc_id*7 + b*13) % 251
    - 125 over raster block index b. Block grid: (1 + doc_id % 4) ×
    (1 + doc_id*5 % 3) blocks of 8×8 (×5, not ×3: (doc_id*3)%3 is
    identically zero, which would leave every fixture one block-row
    tall and never exercise multi-row raster order / DC carry)."""
    bw = 1 + doc_id % 4
    bh = 1 + (doc_id * 5) % 3
    b = np.arange(bh * bw).reshape(bh, bw)
    blocks = np.zeros((bh, bw, 8, 8), dtype=np.int64)
    blocks[:, :, 0, 0] = (doc_id * 7 + b * 13) % 251 - 125
    return blocks


def attach_jpeg_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of spec-valid baseline grayscale JPEGs
    (Annex K Huffman tables, DC diffs, EOB/ZRL run coding) whose
    decoded pixels follow the closed form above."""
    from .jpeg import encode_jpeg_gray

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                encode_jpeg_gray(jpeg_fixture_blocks(int(i))) for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("payload", T.BinaryType())]
    )
    return df.select(id_col).mapInPandas(fn, schema)


def gif_fixture(doc_id: int) -> tuple["np.ndarray", "np.ndarray", bool]:
    """(indices, palette, interlace) with SQL-stateable pixels:
    palette[i] = ((i*37)%256, (i*59)%256, (i*83)%256) over
    n = 2^(2 + doc_id%3) colors; idx(y, x) = (doc_id + 3y + 5x) % n;
    w = 6 + doc_id%9, h = 5 + (doc_id*7)%8; every odd doc_id writes
    INTERLACED (decodes to the same pixels — the 4-pass reorder is
    exercised on half the corpus)."""
    n = 2 << (1 + doc_id % 3)
    w = 6 + doc_id % 9
    h = 5 + (doc_id * 7) % 8
    i = np.arange(n)
    pal = np.stack([(i * 37) % 256, (i * 59) % 256, (i * 83) % 256],
                   axis=1).astype(np.uint8)
    y = np.arange(h).reshape(h, 1)
    x = np.arange(w).reshape(1, w)
    idx = ((doc_id + 3 * y + 5 * x) % n).astype(np.uint8)
    return idx, pal, bool(doc_id % 2)


def attach_gif_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of spec-valid GIF89a images (LZW-compressed,
    global color table, half interlaced) whose decoded RGB pixels
    follow the closed form in ``gif_fixture``."""
    from .gif import encode_gif

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                idx, pal, il = gif_fixture(int(i))
                payloads.append(encode_gif(idx, pal, interlace=il))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("payload", T.BinaryType())]
    )
    return df.select(id_col).mapInPandas(fn, schema)


PIXEL_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("pixel_sha256", T.StringType()),
    ]
)


def decode_image_pixels(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """REAL pixel decode over a PNG/JPEG binary column (mapInPandas,
    Arrow-batched): per image, the decoded dimensions plus pixel_sum
    (sum of every sample) and sha256 of the raw sample bytes — the
    projections a feature-extraction stage hangs off, in a shape a
    SQL oracle can verify when the pixels follow a stated formula."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, sums, shas = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_image(bytes(p))
                if arr.ndim == 2:  # grayscale JPEG → 1 channel
                    arr = arr[:, :, None]
                h, w, ch = arr.shape
                ids.append(int(i)); ws.append(w); hs.append(h)
                cs.append(ch)
                sums.append(int(arr.astype(np.int64).sum()))
                shas.append(hashlib.sha256(arr.tobytes()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs,
                 "channels": cs, "pixel_sum": sums,
                 "pixel_sha256": shas}
            )

    from ..config import widen_for_kernel

    # per-image pure-python codecs are the heaviest kernel in the
    # repo: widen narrow inputs so 500 fixture images (or a re-read
    # media table in 1-2 parquet files) decode on every core instead
    # of 1-2 (r7; no-op for already-wide inputs)
    return widen_for_kernel(
        df.select(id_col, payload_col)
    ).mapInPandas(fn, PIXEL_META_SCHEMA)


# ---------------------------------------------------------------------------
# audio: RIFF/WAVE PCM (operators/wav.py) — the multimodal family's
# audio leg, same oracle playbook as the PNG/GIF/JPEG fixtures above
# ---------------------------------------------------------------------------

def wav_fixture(doc_id: int) -> tuple["np.ndarray", int]:
    """(samples, sample_rate) with SQL-stateable values: ch = 1 +
    doc_id%2, n_frames = 41 + (doc_id*3)%50, rate = 8000·(1+doc_id%3);
    every 5th doc is 8-bit PCM with sample = (doc_id·13 + t·7 + c·5)
    % 256, the rest 16-bit with sample = that expression % 4096 −
    2048 — both widths, mono and stereo, odd data sizes (pad byte;
    the 41 keeps 8-bit mono docs odd-sized) all land in the corpus."""
    ch = 1 + doc_id % 2
    n = 41 + (doc_id * 3) % 50
    rate = 8000 * (1 + doc_id % 3)
    t = np.arange(n).reshape(n, 1)
    c = np.arange(ch).reshape(1, ch)
    base = doc_id * 13 + t * 7 + c * 5
    if doc_id % 5 == 0:
        return (base % 256).astype(np.uint8), rate
    return (base % 4096 - 2048).astype(np.int16), rate


def attach_wav_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of spec-valid RIFF/WAVE files whose PCM
    samples follow the closed form in ``wav_fixture``; every 4th file
    carries a junk LIST chunk so the decoder's unknown-chunk skip is
    exercised on real payloads."""
    from .wav import encode_wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                samples, rate = wav_fixture(int(i))
                junk = b"INFOsynthetic" if int(i) % 4 == 0 else None
                payloads.append(encode_wav(samples, rate, junk_chunk=junk))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("payload", T.BinaryType())]
    )
    return df.select(id_col).mapInPandas(fn, schema)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("sample_sha256", T.StringType()),
    ]
)


def mp4_fixture_params(doc_id: int) -> tuple[int, int, int, int]:
    """(duration_ms, width, height, n_audio) — SQL-stateable:
    duration_ms = 1000 + (doc_id·97)%9000, width = 16·(4+doc_id%9),
    height = 16·(3+(doc_id·5)%7), n_audio = doc_id%2 (n_tracks =
    1 + n_audio: always one video track)."""
    return (
        1000 + (doc_id * 97) % 9000,
        16 * (4 + doc_id % 9),
        16 * (3 + (doc_id * 5) % 7),
        doc_id % 2,
    )


def attach_mp4_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of spec-valid minimal MP4s whose container
    metadata follows ``mp4_fixture_params``; the corpus cycles the
    box-walk corners — 64-bit largesize mdat (doc_id%3==0), mvhd
    version 1 / 64-bit times (doc_id%5==0), free+uuid junk boxes
    (doc_id%4==0)."""
    from .mp4 import encode_minimal_mp4

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                dur, w, h, na = mp4_fixture_params(i)
                payloads.append(encode_minimal_mp4(
                    dur, video_dims=(w, h), n_audio_tracks=na,
                    use_largesize=i % 3 == 0,
                    mvhd_version=1 if i % 5 == 0 else 0,
                    junk=i % 4 == 0,
                ))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("payload", T.BinaryType())]
    )
    return df.select(id_col).mapInPandas(fn, schema)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def extract_video_meta(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """REAL ISO-BMFF metadata over an MP4 binary column (mapInPandas,
    Arrow-batched): duration, track count, video dimensions from the
    moov tree — the projections a video curation stage filters on
    (frame DECODE stays an honest stub in operators/mp4.py)."""
    from .mp4 import parse_mp4_meta

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, durs, nts, ws, hs = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                m = parse_mp4_meta(bytes(p))
                ids.append(int(i)); durs.append(m["duration_ms"])
                nts.append(m["n_tracks"]); ws.append(m["width"])
                hs.append(m["height"])
            yield pd.DataFrame(
                {"doc_id": ids, "duration_ms": durs, "n_tracks": nts,
                 "width": ws, "height": hs}
            )

    return df.mapInPandas(fn, VIDEO_META_SCHEMA)


def decode_audio_samples(df: DataFrame, id_col: str = "doc_id",
                         payload_col: str = "payload") -> DataFrame:
    """REAL PCM decode over a WAV binary column (mapInPandas,
    Arrow-batched): per file, frame/channel/rate metadata plus
    sample_sum and sha256 of the raw sample bytes — the projections an
    audio feature-extraction stage hangs off, verifiable by a SQL
    oracle when the samples follow a stated formula."""
    from .wav import decode_wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, cs, rs, sums, shas = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                arr, rate = decode_wav(bytes(p))
                n, ch = arr.shape
                ids.append(int(i)); ns.append(n); cs.append(ch)
                rs.append(int(rate))
                sums.append(int(arr.astype(np.int64).sum()))
                shas.append(hashlib.sha256(arr.tobytes()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "n_frames": ns, "channels": cs,
                 "sample_rate": rs, "sample_sum": sums,
                 "sample_sha256": shas}
            )

    return df.mapInPandas(fn, AUDIO_META_SCHEMA)
