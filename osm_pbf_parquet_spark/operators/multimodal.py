"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a
struct of typed metadata, processed through Arrow-batched
`mapInPandas` — the same batch shape a real decoder (PIL/ffmpeg)
would use. Header parsing for PNG / GIF / JPEG is REAL (pure-stdlib
struct over the first KB — `parse_image_header`); full pixel decoding
is stubbed (`decode_image` raises NotImplementedError: the container
has no image libs), with `fake_decode_meta` as the deterministic
fallback for unrecognized magics so the plumbing stays total.

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


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real image decode — requires PIL/libvips, absent in this env."""
    raise NotImplementedError(
        "media decoding requires an image library not present in this "
        "container; inject a decoder or use fake_decode_meta for tests"
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
