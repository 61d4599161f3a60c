"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a
struct of typed metadata, processed through Arrow-batched
`mapInPandas` — the same batch shape a real decoder (PIL/ffmpeg)
would use. The actual media decoding is STUBBED (the container has no
image/audio libs): `decode_image` raises NotImplementedError unless a
decoder is injected, and `fake_decode_meta` provides a deterministic
stand-in so the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and tested end-to-end.

The binary payloads round-trip through the codec engine bit-exactly
(envelope str-kind handles binary), which is the part that matters at
100 TB: media bytes dominate the table's mass.
"""

from __future__ import annotations

import hashlib
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
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


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
    """Deterministic stand-in for image header parsing: derives
    (width, height, channels) from the payload digest."""
    if not payload:
        return (0, 0, 0)
    d = hashlib.sha256(payload).digest()
    return (64 + d[0] % 1920, 64 + d[1] % 1080, 1 + d[2] % 4)


def extract_media_meta(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """mapInPandas media metadata extraction (Arrow-batched, the real
    decoder drops into `fake_decode_meta`'s slot)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = [fake_decode_meta(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "channels": [m[2] for m in metas],
                }
            )

    return df.mapInPandas(fn, MEDIA_META_SCHEMA)


def media_meta_sql_view(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """JVM-only metadata subset (n_bytes, sha256) — the SQL-expressible
    projection used for the DuckDB-oracle contract query."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )
