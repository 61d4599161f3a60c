"""HTML → text extraction (functions/html.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pbf_parquet_spark.functions.html import (
    ensure_lossy_decode,
    extract_html_text,
)


def _df(spark, blobs: list[bytes]):
    return spark.createDataFrame(
        [(bytearray(b),) for b in blobs], "html binary"
    )


def test_tag_strip_roundtrips_wrapped_text(spark):
    ensure_lossy_decode(spark)
    df = _df(spark, [b"<html><body>hello world</body></html>"])
    out = df.select(extract_html_text("html").alias("t")).collect()
    assert out[0]["t"] == "hello world"


def test_invalid_bytes_are_dropped_not_fatal(spark):
    ensure_lossy_decode(spark)
    df = _df(spark, [b"<html>\xff\xfeab c</html>"])
    out = df.select(extract_html_text("html").alias("t")).collect()
    assert out[0]["t"] == "ab c"


def test_script_style_and_comments_removed(spark):
    ensure_lossy_decode(spark)
    df = _df(
        spark,
        [
            b"<p>keep</p><script type='x'>var a=1;</script>"
            b"<style>.x{}</style><!-- note -->me",
        ],
    )
    out = df.select(
        extract_html_text("html", normalize_ws=True).alias("t")
    ).collect()
    assert out[0]["t"] == "keep me"


def test_text_bytes_between_tags_preserved_exactly(spark):
    """The north-star invariant: wrapping known text in tags then
    extracting returns it byte-identically (incl. repeated spaces)."""
    ensure_lossy_decode(spark)
    text = "a  b\tc  (x > y is fine outside tags)"
    # note: bare '>' in text survives; bare '<' would open a tag — a
    # producer must entity-encode it, as real HTML does
    df = _df(spark, [b"<html><body>" + text.encode() + b"</body></html>"])
    out = df.select(extract_html_text("html").alias("t")).collect()
    assert out[0]["t"] == text


def test_pages_fixture_text_recovered(spark, pages_path):
    """Fixture html embeds text verbatim between the body tag and the
    non-UTF8 marker — extraction minus the trailing noise run must
    START with the stored text for every non-empty page."""
    pages = spark.read.parquet(pages_path).filter(
        F.col("text").isNotNull() & (F.length("html") > 0)
    ).limit(500)
    ensure_lossy_decode(spark)
    rows = pages.select(
        "text", extract_html_text("html").alias("t")
    ).collect()
    assert rows
    for r in rows:
        assert r["t"].startswith(r["text"])
