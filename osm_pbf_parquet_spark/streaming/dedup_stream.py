"""Streaming deduplication: exact-dup suppression on an ingest feed.

A continuous crawl re-fetches the same url (and byte-identical
content reappears across hosts); suppressing duplicates AT INGEST
keeps them out of every downstream table instead of paying a full
batch dedup later. Two built-in shapes, both pure Structured
Streaming state — no custom stateful operator needed:

* key dedup (`dedup_stream`): first occurrence per key wins, state
  bounded by the event-time watermark — Spark's
  `dropDuplicatesWithinWatermark` evicts keys once the watermark
  passes, so state is O(keys per delay window), not O(corpus).
  (`dropDuplicates` without watermark would grow state forever —
  never acceptable at crawl scale.)
* content dedup (`content_dedup_stream`): same operator keyed on a
  content fingerprint (sha2 of the payload columns) — the streaming
  twin of operators/dedup.dedup_exact.

The output stream feeds streaming/encode_stream unchanged — dedup →
encode → manifest-committed chunk store is the full ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate keys within the watermark window; first event
    per key passes through with ALL its columns."""
    return stream_df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def content_dedup_stream(
    stream_df: DataFrame,
    content_cols: list[str],
    ts_col: str,
    delay: str = "10 minutes",
    fingerprint_col: str = "__fp__",
) -> DataFrame:
    """Drop byte-identical content within the watermark window: the
    dedup key is sha2-256 over the serialized content columns (the
    same bounded-width shuffle key batch dedup_exact uses — never the
    payload itself through state).

    Serialization is unambiguous: each value is length-prefixed (so
    ("ab","c") never collides with ("a","bc")) and NULL gets a marker
    no length-prefixed value can start with.
    """
    parts = []
    for c in content_cols:
        v = F.col(c).cast("string")
        parts.append(
            F.coalesce(
                F.concat(F.length(v).cast("string"), F.lit(":"), v),
                F.lit("null:"),
            )
        )
    fp = F.sha2(F.concat_ws("|", *parts), 256)
    with_fp = stream_df.withColumn(fingerprint_col, fp)
    return (
        with_fp.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark([fingerprint_col])
        .drop(fingerprint_col)
    )
