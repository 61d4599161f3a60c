"""HTML → text extraction for the webtext payload.

The north-star invariant for a Common-Crawl-style table is
"byte-identical extracted text per url": the pipeline's first real
transform is html:binary → text:string, and every downstream operator
(dedup, quality, tokenization) consumes its output. Re-expressed
Spark-first: lossy UTF-8 decode + tag stripping entirely in JVM
built-ins (`decode`, `regexp_replace`) — whole-stage codegen, no
Python in the hot path, unlike the lxml/BeautifulSoup loops a naive
port would reach for.

Reference parity note: osm-pbf-parquet's analogous step is the
blob→primitive-group decode (src/pbf.rs:45-91) — opaque input bytes
to typed columns; here the opaque bytes are web HTML and the typed
column is the extracted text.

Spark 4 `decode(col, 'UTF-8')` raises MALFORMED_CHARACTER_CODING on
invalid bytes by default; real crawl bytes are routinely invalid, so
`ensure_lossy_decode` flips the session to charset-replacement
semantics (U+FFFD), and `extract_html_text` strips the replacement
chars after tag removal. A Bloom-style guarantee holds: stripping is
conservative — valid text bytes are never altered, so when the html
was produced by wrapping known text in tags (the fixture derivation,
and the round-trip contract query), extraction returns that text
byte-identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scripts/styles hold code, not prose — drop the whole element.
_BLOCK_RE = r"(?is)<(script|style)[^>]*>.*?</\1\s*>"
#: any remaining tag (incl. comments' brackets handled first).
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"<[^>]*>"


def ensure_lossy_decode(spark) -> None:
    """Make `decode(binary, 'UTF-8')` replace malformed bytes with
    U+FFFD instead of raising (java.nio CodingErrorAction.REPLACE) —
    required before running extract_html_text on real crawl bytes."""
    spark.conf.set("spark.sql.legacy.codingErrorAction", "true")


def extract_html_text(
    col: Column | str,
    normalize_ws: bool = False,
    strip_replacement: bool = True,
) -> Column:
    """Extracted text of an html BINARY column, pure built-ins.

    Pipeline: lossy UTF-8 decode → drop <script>/<style> elements →
    drop comments → drop tags → (optionally) drop U+FFFD replacement
    chars from invalid input bytes → (optionally) collapse whitespace.

    normalize_ws=False preserves the text bytes between tags exactly
    (the round-trip-identity form); True gives the analytics form
    (single-spaced, trimmed) for tokenizers.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.decode(c, "UTF-8")
    s = F.regexp_replace(s, _BLOCK_RE, " ")
    s = F.regexp_replace(s, _COMMENT_RE, " ")
    s = F.regexp_replace(s, _TAG_RE, "")
    if strip_replacement:
        s = F.regexp_replace(s, "�", "")
    if normalize_ws:
        s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return s
