"""Text-analysis column functions for training-data pipelines.

All hot-path logic is built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen) — no Python UDFs. Every function here has an
exact ANSI-SQL twin (used as the DuckDB oracle in __spark_entry__),
and integer outputs are preferred over floats so value-hash
comparisons are bitwise-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared with the SQL oracles — keep both sides in lockstep. The
# whitespace class is EXPLICIT (not \s/\S): Java regex counts \x0B as
# whitespace, RE2 (DuckDB) does not, so the shorthands silently
# tokenize differently on vertical-tab-bearing text.
_WS = r" \t\n\x0B\f\r"
TOKEN_RE = rf"[^{_WS}]+"
# BPE-ish pre-tokenization (GPT-2-style, simplified to the portable
# subset both Java regex and RE2 support): letter runs, digit runs,
# and single punctuation marks each become one token
BPE_RE = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{_WS}]"
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/null-safe (empty → 0)."""
    return F.size(F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(TOKEN_RE), F.lit(0)))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count (letters/digits/punct pre-tokenization) —
    the sub-word-budget proxy a training pipeline actually bills by."""
    return F.size(
        F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(BPE_RE), F.lit(0))
    )


def _word_hits(col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.coalesce(col, F.lit(""))), F.lit(pat), F.lit(0)))


def lang_scores(col: Column) -> dict[str, Column]:
    """Stopword-hit counts per candidate language (n-gram-free heuristic)."""
    return {lang: _word_hits(col, ws) for lang, ws in STOPWORDS.items()}


def lang_predict(col: Column) -> Column:
    s = lang_scores(col)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when(s["de"] >= s["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def char_class_counts(col: Column) -> dict[str, Column]:
    """Integer quality signals: chars, punct, digits, uppercase."""
    c = F.coalesce(col, F.lit(""))
    return {
        "n_chars": F.length(c),
        "n_punct": F.size(F.regexp_extract_all(c, F.lit(r"[.,;:!?]"), F.lit(0))),
        "n_digit": F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), F.lit(0))),
        "n_upper": F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), F.lit(0))),
        "n_stopword": _word_hits(c, STOPWORDS["en"]),
    }


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint (md5 hex of the raw bytes)."""
    return F.md5(F.encode(F.coalesce(col, F.lit("")), "UTF-8"))


def hash_bucket(key: Column) -> Column:
    """Deterministic 1/256-granularity sampling bucket: the first two
    hex chars of md5(key-as-string). Engine-portable (identical in any
    md5-bearing SQL dialect), stable across runs/cluster sizes — the
    property a training-data holdout split actually needs, which
    rand()-based sampling does not have."""
    return F.substring(F.md5(F.encode(key.cast("string"), "UTF-8")), 1, 2)


def sample_by_hash(df, key_col: str, max_bucket: str):
    """Keep rows whose hash_bucket <= max_bucket ('1f' → 12.5%)."""
    return df.filter(hash_bucket(F.col(key_col)) <= max_bucket)


def stratified_sample(df, key_col: str, strata_col: str,
                      thresholds: dict[str, str], default: str):
    """Per-stratum deterministic sampling — the classic training-mix
    rebalance (downsample the dominant language, keep the tail).
    thresholds map stratum value → max hex bucket ('33' ≈ 20%)."""
    thr = F.lit(default)
    for value, bucket in sorted(thresholds.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(bucket)).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col)) <= thr)


# quality gate thresholds — shared by the Column form and its SQL twin
QUALITY_MIN_CHARS = 200
QUALITY_MAX_DIGIT_PCT = 20
QUALITY_MAX_UPPER_PCT = 30
QUALITY_MIN_STOPWORDS = 2


def quality_pass(text: Column) -> Column:
    """Composite quality gate (integer arithmetic only — exact twin in
    SQL): long enough, not digit-soup, not shouting, and carrying
    target-language stopwords. The standard pre-training heuristic
    family (C4's stopword rule + Gopher's ratio caps, on the signals
    char_class_counts carries)."""
    cc = char_class_counts(text)
    return (
        (cc["n_chars"] >= QUALITY_MIN_CHARS)
        & (100 * cc["n_digit"] <= QUALITY_MAX_DIGIT_PCT * cc["n_chars"])
        & (100 * cc["n_upper"] <= QUALITY_MAX_UPPER_PCT * cc["n_chars"])
        & (cc["n_stopword"] >= QUALITY_MIN_STOPWORDS)
    )


# ---- SQL twins (DuckDB oracle fragments) ----------------------------------

def sql_token_count(col: str) -> str:
    return f"len(regexp_extract_all(coalesce({col}, ''), '{TOKEN_RE}'))"


def sql_bpe_token_count(col: str) -> str:
    return f"len(regexp_extract_all(coalesce({col}, ''), '{BPE_RE}'))"


def sql_word_hits(col: str, words: list[str]) -> str:
    pat = r"\b(" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(lower(coalesce({col}, '')), '{pat}'))"


def sql_lang_predict(col: str) -> str:
    en, de, fr = (sql_word_hits(col, STOPWORDS[g]) for g in ("en", "de", "fr"))
    return (
        f"CASE WHEN {en} >= {de} AND {en} >= {fr} THEN 'en' "
        f"WHEN {de} >= {fr} THEN 'de' ELSE 'fr' END"
    )


def sql_char_class_counts(col: str) -> dict[str, str]:
    c = f"coalesce({col}, '')"
    return {
        "n_chars": f"length({c})",
        "n_punct": f"len(regexp_extract_all({c}, '[.,;:!?]'))",
        "n_digit": f"len(regexp_extract_all({c}, '[0-9]'))",
        "n_upper": f"len(regexp_extract_all({c}, '[A-Z]'))",
        "n_stopword": sql_word_hits(col, STOPWORDS["en"]),
    }


def sql_fingerprint(col: str) -> str:
    return f"md5(coalesce({col}, ''))"


def sql_hash_bucket(key: str) -> str:
    return f"substr(md5(CAST({key} AS VARCHAR)), 1, 2)"


def sql_quality_pass(col: str) -> str:
    cc = sql_char_class_counts(col)
    return (
        f"({cc['n_chars']} >= {QUALITY_MIN_CHARS}"
        f" AND 100 * {cc['n_digit']} <= {QUALITY_MAX_DIGIT_PCT} * {cc['n_chars']}"
        f" AND 100 * {cc['n_upper']} <= {QUALITY_MAX_UPPER_PCT} * {cc['n_chars']}"
        f" AND {cc['n_stopword']} >= {QUALITY_MIN_STOPWORDS})"
    )


def token_postings(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    max_postings: int | None = 65536,
):
    """Inverted token index: (token, df_count, postings sorted array —
    truncated to the ``max_postings`` SMALLEST doc ids for Zipf-head
    tokens; df_count is always exact).

    r6 hardening (same hazard class as the LSH bucket fix): the
    postings of a head token ("the") are O(corpus) — an ungated
    collect_list materialized them into ONE aggregation row. The
    capped-prefix scheme bounds it: row_number over (token, id-order)
    gates a groupBy collect_list to the first ``max_postings`` ids,
    and the EXACT df_count is max(row_number) in the same aggregate.
    The groupBy runs directly above the WindowExec on the same key, so
    Catalyst inserts NO second exchange — the cap costs one sort, not
    an extra pass. (NOT collect_list().over(window): an unbounded-
    frame window APPENDS the cap-sized array to every row of the
    partition before any filter, O(df × cap) bytes through one task
    for a Zipf-head token — the blowup this cap exists to prevent.)
    Readers segment/skip head tokens via df_count (the truncation the
    docstring always promised, now enforced); term search uses
    search_all_tokens (containment semi-join), never the materialized
    head postings. ``max_postings=None`` keeps the exact groupBy path
    for small corpora.
    """
    tok = F.explode(
        F.array_distinct(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")), F.lit(TOKEN_RE), F.lit(0)
            )
        )
    ).alias("token")
    base = df.select(F.col(id_col), tok)
    if lowercase:
        base = base.withColumn("token", F.lower(F.col("token")))
        base = base.distinct()  # lowercasing can merge variants per doc
    if max_postings is None:
        return base.groupBy("token").agg(
            F.count("*").alias("df_count"),
            F.sort_array(F.collect_list(id_col)).alias("postings"),
        )
    from pyspark.sql import Window

    w_ord = Window.partitionBy("token").orderBy(id_col)
    l1 = base.select(
        "token",
        F.col(id_col).alias("_id"),
        F.row_number().over(w_ord).alias("_rn"),
    )
    gated = F.when(F.col("_rn") <= int(max_postings), F.col("_id"))
    return l1.groupBy("token").agg(
        F.max("_rn").cast("long").alias("df_count"),
        F.sort_array(F.collect_list(gated)).alias("postings"),
    )


def search_all_tokens(
    df,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Documents containing ALL terms (AND semantics, case-folded):
    one aggregated containment check per doc — no index required, or
    use token_postings + array_intersect when the index is built."""
    cols = [
        F.array_contains(
            F.transform(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.coalesce(F.col(text_col), F.lit("")),
                        F.lit(TOKEN_RE), F.lit(0),
                    )
                ),
                lambda t: F.lower(t),
            ),
            term.lower(),
        )
        for term in terms
    ]
    cond = cols[0]
    for c in cols[1:]:
        cond = cond & c
    return df.filter(cond).select(id_col)


def repetition_signals(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Gopher-style repetition quality signals, one row per doc with
    >= 1 token (token-free docs — null/empty/whitespace — carry no
    repetition evidence and are omitted, matching the SQL twin):

      n_words          total token instances
      top_word_count   occurrences of the most frequent token
      n_2grams         total word-2-gram instances (n_words - 1)
      dup_2gram_count  instances belonging to 2-grams seen > once

    Callers derive the paper's fractions (top_word_count/n_words,
    dup_2gram_count/n_2grams) themselves — outputs stay integers so
    the DuckDB oracle value-hashes bitwise-equal.

    Plan shape: two explode→groupBy chains (words, 2-grams), both
    keyed (doc, term) then (doc) — map-side partial aggregation
    collapses each doc's repeats before the exchange, so the shuffle
    carries per-doc distinct terms, not token instances. The 2-gram
    array is built row-local with zip_with over two slices (adjacency
    needs either a HOF or a window shuffle; the O(n_words) interpreted
    concat is far cheaper than a per-doc sort window at corpus scale).
    """
    toks = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(TOKEN_RE), F.lit(0)
    )
    words = df.select(id_col, F.explode(toks).alias("w"))
    wstats = (
        words.groupBy(id_col, "w")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_words"),
            F.max("c").alias("top_word_count"),
        )
    )
    grams = df.select(id_col, toks.alias("_ws")).select(
        id_col,
        F.explode(
            F.expr(
                "CASE WHEN size(_ws) >= 2 THEN "
                "zip_with(slice(_ws, 1, size(_ws) - 1), "
                "slice(_ws, 2, size(_ws) - 1), "
                "(a, b) -> concat(a, ' ', b)) ELSE array() END"
            )
        ).alias("g"),
    )
    gstats = (
        grams.groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_2grams"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias(
                "dup_2gram_count"
            ),
        )
    )
    return wstats.join(gstats, id_col, "left").select(
        id_col,
        "n_words",
        "top_word_count",
        F.coalesce("n_2grams", F.lit(0)).alias("n_2grams"),
        F.coalesce("dup_2gram_count", F.lit(0)).alias("dup_2gram_count"),
    )


# --- PII redaction (C4/RefinedWeb-style scrubbing) -------------------
# Patterns restricted to the Java-regex ∩ RE2 dialect intersection
# (\d, \b, (?:...), {m,n} mean the same thing in both) so the Spark
# expression and the DuckDB oracle compile the SAME automaton.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+\d{7,15}"
_PII_ORDER = (  # email first: its local/domain parts contain digits
    (PII_EMAIL, "<EMAIL>"),
    (PII_IPV4, "<IP>"),
    (PII_PHONE, "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Text with emails, dotted-quad IPs and +international phone
    numbers replaced by typed placeholders — the scrub step of a
    webtext training pipeline. Pure JVM regexp_replace chain (three
    codegen'd passes, no Python)."""
    out = col
    for pat, tag in _PII_ORDER:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category match counts on the ORIGINAL text (audit metric
    alongside redact_pii; each pattern counted independently)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL), F.lit(0))),
        "n_ipv4": F.size(F.regexp_extract_all(col, F.lit(PII_IPV4), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(col, F.lit(PII_PHONE), F.lit(0))),
    }


def sql_redact_pii(col: str) -> str:
    out = col
    for pat, tag in _PII_ORDER:
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return out


def sql_pii_counts(col: str) -> dict[str, str]:
    return {
        "n_emails": f"length(regexp_extract_all({col}, '{PII_EMAIL}'))",
        "n_ipv4": f"length(regexp_extract_all({col}, '{PII_IPV4}'))",
        "n_phones": f"length(regexp_extract_all({col}, '{PII_PHONE}'))",
    }


def ngram_lm_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
):
    """CCNet-style n-gram LM quality score: train an add-k-smoothed
    BIGRAM language model on the corpus itself (two groupBy count
    tables), then score every doc by its mean token log-probability —
    the "does this read like the corpus" signal a pre-training
    pipeline thresholds on (CCNet buckets by LM perplexity; this is
    the in-corpus equivalent with no external model). Docs with < 2
    tokens carry no bigram evidence and are omitted, matching the SQL
    twin.

        P(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V)

    with V the corpus-wide distinct-unigram count. Output:
    (id, n_bigrams, avg_logprob ROUND(...,4)) — rounded so the DuckDB
    oracle value-hashes equal despite summation-order float drift.

    Scale shape: bigram/unigram count tables are O(vocab²-observed)
    and O(vocab) — a groupBy each with map-side partial agg; scoring
    is two shuffle hash joins of the doc-bigram stream against them
    (counts co-partition by their join keys; no broadcast assumption,
    vocab tables can exceed driver memory at web scale), then one
    per-doc avg. Everything codegen; the HOF zip_with runs per row
    over the token array to form adjacent pairs."""
    toks = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(TOKEN_RE), F.lit(0)
    )
    bg = df.select(F.col(id_col), toks.alias("_ws")).select(
        id_col,
        F.explode(
            F.expr(
                "CASE WHEN size(_ws) >= 2 THEN "
                "zip_with(slice(_ws, 1, size(_ws) - 1), "
                "slice(_ws, 2, size(_ws) - 1), "
                "(a, b) -> struct(a AS w1, b AS w2)) "
                "ELSE array() END"
            )
        ).alias("bg"),
    ).select(id_col, "bg.w1", "bg.w2")
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    uni = df.select(F.explode(toks).alias("w"))
    unigram_counts = uni.groupBy("w").agg(F.count("*").alias("cu"))
    v_df = unigram_counts.agg(
        F.count("*").cast("double").alias("_V")
    )
    scored = (
        bg.join(bigram_counts, ["w1", "w2"])   # every bigram exists in
        .join(unigram_counts.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(v_df))          # its own training corpus
        .select(
            id_col,
            F.log(
                (F.col("cb") + F.lit(float(k)))
                / (F.col("cu") + F.lit(float(k)) * F.col("_V"))
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )


def sql_ngram_lm_scores(k: float = 1.0) -> str:
    """DuckDB twin of ngram_lm_scores over the `documents` view."""
    tc = f"regexp_extract_all(coalesce(text, ''), '{TOKEN_RE}')"
    return f"""
        WITH t AS (
          SELECT doc_id, {tc} AS ws FROM documents
        ),
        bg AS (
          SELECT doc_id, ws[CAST(p AS INT)] AS w1,
                 ws[CAST(p AS INT) + 1] AS w2
          FROM t, UNNEST(range(1, CAST(greatest(len(ws) - 1, 0) AS BIGINT) + 1)) AS u(p)
        ),
        cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
        cu AS (SELECT ws_u.w AS w1, count(*) AS cu FROM
               (SELECT unnest(ws) AS w FROM t) ws_u GROUP BY 1),
        v AS (SELECT CAST(count(*) AS DOUBLE) AS V FROM cu)
        SELECT bg.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln((cb.cb + {float(k)})
                            / (cu.cu + {float(k)} * v.V))), 4)
                   AS avg_logprob
        FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1), v
        GROUP BY bg.doc_id
    """
