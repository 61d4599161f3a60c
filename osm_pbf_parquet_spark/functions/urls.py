"""URL operators for webtext pipelines: host extraction, URL
normalization, and blocklist filtering — the C4/RefinedWeb-style URL
hygiene pass (drop blocked domains, canonicalize before URL-level
dedup). Reference parity note: the reference engine (/root/reference,
Rust) has no URL surface; this extends the training-pipeline family.

Everything is JVM regexp/string built-ins (codegen, no Python), with
`sql_*` twins generated from the SAME pattern constants so the DuckDB
oracle compiles the same automaton (Java-regex ∩ RE2 dialect, like
functions/text.py's PII patterns).

Scale shape: host extraction is row-local; blocklist filtering is a
BROADCAST anti-join (blocklists are thousands of rows against 10^12
docs); host_stats is one groupBy with map-side partial agg — the same
pre-pass operators/partitioning.py feeds its skew salting from.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: authority host (no userinfo, no port): scheme '://' [user@] HOST
URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]+)"
#: scheme://host[:port] prefix (for splitting authority from path)
URL_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"
#: fragment
URL_FRAGMENT_RE = r"#.*$"


def url_host(col: Column) -> Column:
    """Lowercased registered host of a URL ('' for non-URLs)."""
    return F.lower(F.regexp_extract(col, URL_HOST_RE, 1))


def url_normalize(col: Column) -> Column:
    """Canonical form for URL-level dedup: lowercase scheme+host,
    default ports stripped (:80 http / :443 https), fragment removed,
    path+query byte-preserved. Not full RFC 3986 (no dot-segment or
    percent-normalization) — the cheap deterministic subset every
    pipeline agrees on."""
    defragged = F.regexp_replace(col, URL_FRAGMENT_RE, "")
    prefix = F.lower(F.regexp_extract(defragged, URL_PREFIX_RE, 1))
    rest = F.regexp_replace(defragged, URL_PREFIX_RE, "")
    prefix = F.regexp_replace(
        prefix, r"^(http://(?:[^/@?#]*@)?[^/:?#]+):80$", "$1")
    prefix = F.regexp_replace(
        prefix, r"^(https://(?:[^/@?#]*@)?[^/:?#]+):443$", "$1")
    return F.concat(prefix, rest)


def sql_url_host(col: str) -> str:
    return f"lower(regexp_extract({col}, '{URL_HOST_RE}', 1))"


def sql_url_normalize(col: str) -> str:
    d = f"regexp_replace({col}, '{URL_FRAGMENT_RE}', '')"
    prefix = f"lower(regexp_extract({d}, '{URL_PREFIX_RE}', 1))"
    prefix = (f"regexp_replace({prefix}, "
              "'^(http://(?:[^/@?#]*@)?[^/:?#]+):80$', '\\1')")
    prefix = (f"regexp_replace({prefix}, "
              "'^(https://(?:[^/@?#]*@)?[^/:?#]+):443$', '\\1')")
    rest = f"regexp_replace({d}, '{URL_PREFIX_RE}', '')"
    return f"{prefix} || {rest}"


def filter_blocked_hosts(
    df: DataFrame,
    blocked: list[str] | DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Corpus minus rows whose host is on the blocklist — BROADCAST
    anti-join on the extracted host (the blocklist ships, never the
    corpus)."""
    spark = df.sparkSession
    if isinstance(blocked, list):
        blocked = spark.createDataFrame(
            [(h.lower(),) for h in blocked], "host string"
        )
    withh = df.withColumn("_host", url_host(F.col(url_col)))
    out = withh.join(
        F.broadcast(blocked.select(F.lower(F.col("host")).alias("_host"))),
        "_host",
        "left_anti",
    )
    return out.drop("_host")


def host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, n_docs) — the per-host frequency pre-pass; feed it to
    operators/partitioning.salted_pids for skew handling or threshold
    it for dominant-host caps."""
    return (
        df.select(url_host(F.col(url_col)).alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"))
    )
