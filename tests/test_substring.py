"""Substring-level dedup + decontamination (operators/substring.py):
oracle equality of the rolling-hash gram kernel, the winnowing
guarantee, and the edge cases a flat-buffer kernel can get wrong."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def _py_grams(text: str, k: int) -> set:
    return {text[i:i + k] for i in range(len(text) - k + 1)}


def _truth_pairs(rows, k):
    grams = {i: _py_grams(t or "", k) for i, t in rows}
    out = set()
    ids = sorted(grams)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if grams[ids[a]] & grams[ids[b]]:
                out.add((ids[a], ids[b]))
    return out


@pytest.fixture(scope="module")
def span_docs(spark):
    shared = "the shared span that is long enough to count as contamination here"
    rows = [
        (0, "prefix one " + shared + " suffix alpha"),
        (1, "totally different beginning " + shared + " and ending"),
        (2, "no overlap with anything else in this corpus at all, promise"),
        (3, "short"),
        (4, ""),
        (5, None),
        (6, "prefix one " + shared + " suffix alpha"),  # exact dup of 0
        (7, "x" * 19),  # exactly k-1 for k=20
        (8, "y" * 20),  # exactly k
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_pairs_match_pure_python_truth(spark, span_docs):
    from osm_pbf_parquet_spark.operators.substring import substring_dup_pairs

    rows, df = span_docs
    got = {tuple(r) for r in substring_dup_pairs(df, k=20).collect()}
    assert got == _truth_pairs(rows, 20)


def test_short_empty_null_docs_emit_nothing(spark, span_docs):
    from osm_pbf_parquet_spark.operators.substring import gram_hashes

    _, df = span_docs
    emitted = {
        r.doc_id for r in gram_hashes(df, k=20).select("doc_id").distinct().collect()
    }
    assert 3 not in emitted and 4 not in emitted and 5 not in emitted
    assert 7 not in emitted      # k-1 chars: zero windows
    assert 8 in emitted          # exactly k: one window


def test_gram_counts_match_python(spark, span_docs):
    from osm_pbf_parquet_spark.operators.substring import gram_hashes

    rows, df = span_docs
    got = dict(
        (r.doc_id, r.n)
        for r in gram_hashes(df, k=20)
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    )
    want = {
        i: len(_py_grams(t, 20)) for i, t in rows if t and len(t) >= 20
    }
    assert got == want


def test_winnow_guarantee_and_density(spark):
    """Planted overlaps of length >= w + k - 1 MUST be found with
    winnowing on; emission must be much sparser than the full set."""
    from osm_pbf_parquet_spark.operators.substring import (
        gram_hashes, substring_dup_pairs,
    )

    rng = np.random.default_rng(42)
    alphabet = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", dtype=np.uint8)

    def rand_text(n):
        return bytes(alphabet[rng.integers(0, len(alphabet), n)]).decode()

    k, w = 20, 16
    span = rand_text(w + k - 1)          # exactly the guarantee floor
    rows = []
    for i in range(40):
        rows.append((2 * i, rand_text(150) + span + rand_text(150)))
        rows.append((2 * i + 1, rand_text(150) + span + rand_text(150)))
    for j in range(100):
        rows.append((1000 + j, rand_text(300)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {tuple(r) for r in substring_dup_pairs(df, k=k, winnow_w=w).collect()}
    # every pair of span-carrying docs shares the span; at minimum the
    # winnowing guarantee demands ALL of them (they may also pair with
    # each other across plants — same span, so that's still truth)
    carriers = sorted(r[0] for r in rows[: 80])
    for a in range(len(carriers)):
        for b in range(a + 1, len(carriers)):
            assert (carriers[a], carriers[b]) in got
    full = gram_hashes(df, k=k).count()
    winnowed = gram_hashes(df, k=k, winnow_w=w).count()
    assert winnowed < full * 0.3         # ~2/(w+1) ~ 0.12 expected


def test_winnow_short_docs_still_fingerprinted(spark):
    """Docs with fewer than w gram positions contribute their overall
    min — two identical short docs must still pair up under winnowing."""
    from osm_pbf_parquet_spark.operators.substring import substring_dup_pairs

    t = "an identical short document body"   # 32 chars, 13 positions @ k=20
    df = spark.createDataFrame(
        [(0, t), (1, t), (2, "something else entirely, unrelated text")],
        "doc_id long, text string",
    )
    got = {tuple(r) for r in substring_dup_pairs(df, k=20, winnow_w=50).collect()}
    assert got == {(0, 1)}


def test_max_gram_docs_cuts_boilerplate(spark):
    from osm_pbf_parquet_spark.operators.substring import substring_dup_pairs

    boiler = "this exact boilerplate navigation header appears everywhere"
    rows = [
        (i, boiler + " " + " ".join(f"w{i}x{j}y" for j in range(8)))
        for i in range(30)
    ]
    rows += [(100, "pair doc with its own long shared unique span right here ok"),
             (101, "pair doc with its own long shared unique span right here ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # df-cut removes the boilerplate grams; only the planted pair remains
    got = {tuple(r) for r in
           substring_dup_pairs(df, k=20, max_gram_docs=10).collect()}
    assert got == {(100, 101)}


def test_chain_pairs_over_cap_stay_connected(spark):
    from osm_pbf_parquet_spark.operators.substring import substring_dup_pairs

    t = "every single one of these documents is exactly the same text"
    df = spark.createDataFrame(
        [(i, t) for i in range(50)], "doc_id long, text string"
    )
    got = {tuple(r) for r in
           substring_dup_pairs(df, k=20, max_bucket=8).collect()}
    # chain fan-out: linear in bucket size, every doc connected to the
    # next — no over-cap bucket list is ever materialized (r6)
    assert got == {(i - 1, i) for i in range(1, 50)}


def test_decontaminate_matches_python_truth(spark):
    from osm_pbf_parquet_spark.operators.substring import decontaminate

    bench_span = "benchmark evaluation question that must not leak into training"
    corpus_rows = [
        (0, "clean document about nothing in particular, fully original"),
        (1, "contains the " + bench_span + " verbatim inside"),
        (2, "another clean one with its own words and nothing borrowed"),
        (3, None),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "q1: " + bench_span), (101, "q2: unrelated benchmark row")],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in decontaminate(corpus, bench, k=20).select("doc_id").collect()
    )
    assert kept == [0, 2, 3]   # null text can't be contaminated


def test_ranges_helper():
    from osm_pbf_parquet_spark.operators.substring import _ranges

    out = _ranges(np.array([3, 1, 2]))
    assert out.tolist() == [0, 1, 2, 0, 0, 1]
    assert _ranges(np.array([5])).tolist() == [0, 1, 2, 3, 4]


def test_repetition_signals(spark):
    from osm_pbf_parquet_spark.functions.text import repetition_signals

    df = spark.createDataFrame(
        [
            (0, "a b a b a"),          # top word a=3; 2grams: ab,ba,ab,ba all dup
            (1, "one two three"),       # no repetition
            (2, "solo"),                # single word: no 2-grams
            (3, ""),                    # token-free: omitted
            (4, None),                  # token-free: omitted
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert set(rows) == {0, 1, 2}
    assert (rows[0].n_words, rows[0].top_word_count,
            rows[0].n_2grams, rows[0].dup_2gram_count) == (5, 3, 4, 4)
    assert (rows[1].n_words, rows[1].top_word_count,
            rows[1].n_2grams, rows[1].dup_2gram_count) == (3, 1, 2, 0)
    assert (rows[2].n_words, rows[2].top_word_count,
            rows[2].n_2grams, rows[2].dup_2gram_count) == (1, 1, 0, 0)


def _truth_spans(rows, k, min_count=2):
    """Pure-Python dup-span truth: byte positions covered by k-grams
    occurring >= min_count times corpus-wide (multiplicity counted),
    merged into maximal per-doc intervals."""
    from collections import Counter

    counts = Counter()
    for _, t in rows:
        t = t or ""
        for i in range(len(t) - k + 1):
            counts[t[i:i + k]] += 1
    spans = {}
    for i, t in rows:
        t = t or ""
        covered = set()
        for p in range(len(t) - k + 1):
            if counts[t[p:p + k]] >= min_count:
                covered.update(range(p, p + k))
        merged, start = [], None
        for b in range(len(t) + 1):
            if b in covered and start is None:
                start = b
            elif b not in covered and start is not None:
                merged.append((start, b))
                start = None
        if merged:
            spans[i] = merged
    return spans


@pytest.fixture(scope="module")
def span_strip_docs(spark):
    rep = "abcdefghijklmnopqrstuvwxyz0123"  # 30 bytes, k=20 coverable
    rows = [
        (0, "HEAD " + rep + " MID " + rep + " TAIL"),  # self-repeat
        (1, "left context " + rep + " right context"),  # shares with 0
        (2, "completely original text with no shared twenty-gram at all"),
        (3, "tiny"),
        (4, None),
        (5, rep),  # the whole doc IS a duplicated span
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_spans_match_python_truth(spark, span_strip_docs):
    from osm_pbf_parquet_spark.operators.substring import dup_spans

    rows, df = span_strip_docs
    got = {}
    for r in dup_spans(df, k=20).collect():
        got.setdefault(r.doc_id, []).append((r.start_pos, r.end_pos))
    got = {i: sorted(v) for i, v in got.items()}
    assert got == _truth_spans(rows, 20)


def test_strip_dup_spans_rebuilds_text(spark, span_strip_docs):
    from osm_pbf_parquet_spark.operators.substring import strip_dup_spans

    rows, df = span_strip_docs
    truth_spans = _truth_spans(rows, 20)
    out = {r.doc_id: r for r in strip_dup_spans(df, k=20).collect()}
    assert set(out) == {i for i, _ in rows}
    for i, t in rows:
        spans = truth_spans.get(i, [])
        keep, prev = [], 0
        for s, e in spans:
            keep.append((t or "")[prev:s])
            prev = e
        keep.append((t or "")[prev:])
        expect = "".join(keep) if t is not None else None
        assert out[i].text == expect, i
        assert out[i].dup_bytes == sum(e - s for s, e in spans)
    # docs 0/1/5 lose their duplicated block; doc 2 is untouched
    assert out[2].text == rows[2][1] and out[2].dup_bytes == 0
    assert out[5].text == "" and out[5].dup_bytes == 30


def test_strip_dup_spans_multibyte_byte_space(spark):
    """r5 ADVICE (medium): span positions are UTF-8 BYTE offsets, so
    the rebuild must slice bytes, not characters — a char-indexed
    substr() misaligns every cut on a non-ASCII doc. Truth is computed
    in pure-Python byte space (the Lee et al. semantics)."""
    from osm_pbf_parquet_spark.operators.substring import strip_dup_spans

    k = 12
    dup = "düplicätés—" * 3            # multibyte, 16 bytes/11 chars per rep
    rows = [
        (0, f"прелюдия один {dup} хвост один"),     # cyrillic around dup
        (1, f"préfix deux {dup} suffix deux"),
        (2, "どこにも重複のない完全に独自の文書です"),  # unique, untouched
    ]
    cnt: dict[bytes, int] = {}
    enc = {i: t.encode("utf-8") for i, t in rows}
    for b in enc.values():
        for p in range(len(b) - k + 1):
            g = b[p:p + k]
            cnt[g] = cnt.get(g, 0) + 1
    expect = {}
    for i, b in enc.items():
        spans: list[list[int]] = []
        for p in range(len(b) - k + 1):
            if cnt[b[p:p + k]] >= 2:
                if spans and p <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], p + k)
                else:
                    spans.append([p, p + k])
        keep, prev = bytearray(), 0
        for s, e in spans:
            keep += b[prev:s]
            prev = e
        keep += b[prev:]
        expect[i] = (bytes(keep).decode("utf-8"),
                     sum(e - s for s, e in spans))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in strip_dup_spans(df, k=k).collect()}
    for i in expect:
        assert (out[i].text, out[i].dup_bytes) == expect[i], i
    assert out[2].dup_bytes == 0 and out[2].text == rows[2][1]
    assert out[0].dup_bytes > 0, "fixture must actually strip something"


def test_strip_dup_spans_min_count_3_spares_two_copies(spark,
                                                      span_strip_docs):
    from osm_pbf_parquet_spark.operators.substring import strip_dup_spans

    rows, df = span_strip_docs
    # the repeated block occurs 3x corpus-wide (docs 0 twice... plus 1
    # and 5) — raising min_count above the occurrence count of the
    # interior grams spares them
    out = {r.doc_id: r for r in
           strip_dup_spans(df, k=20, min_count=5).collect()}
    assert all(r.dup_bytes == 0 for r in out.values())
    assert out[1].text == rows[1][1]


def test_strip_dup_spans_cut_splitting_codepoint_survives(spark):
    """r6 review (was the r5 medium ADVICE follow-through): when a
    span cut ends BETWEEN the two bytes of a codepoint, the kept
    bytes start with a continuation byte — Spark 4's decode() raises
    MALFORMED_CHARACTER_CODING and aborted the whole job. The rebuild
    must instead yield U+FFFD at the junction (Lee et al. byte
    semantics), matching Python's errors='replace' truth."""
    from osm_pbf_parquet_spark.operators.substring import strip_dup_spans

    # k=4 grams: b'ABC\xc3' appears in BOTH docs, but the byte after
    # \xc3 differs (é vs è) so the dup span ends mid-codepoint at
    # byte 4 of each doc.
    rows = [(0, "ABCé1"), (1, "ABCè2")]
    k = 4
    cnt: dict[bytes, int] = {}
    enc = {i: t.encode("utf-8") for i, t in rows}
    for b in enc.values():
        for p in range(len(b) - k + 1):
            cnt[b[p:p + k]] = cnt.get(b[p:p + k], 0) + 1
    expect = {}
    for i, b in enc.items():
        spans: list[list[int]] = []
        for p in range(len(b) - k + 1):
            if cnt[b[p:p + k]] >= 2:
                if spans and p <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], p + k)
                else:
                    spans.append([p, p + k])
        keep, prev = bytearray(), 0
        for s, e in spans:
            keep += b[prev:s]
            prev = e
        keep += b[prev:]
        expect[i] = (bytes(keep).decode("utf-8", errors="replace"),
                     sum(e - s for s, e in spans))
    assert expect[0][1] == 4, "fixture must cut mid-codepoint"
    assert "�" in expect[0][0]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in strip_dup_spans(df, k=k).collect()}
    for i in expect:
        assert (out[i].text, out[i].dup_bytes) == expect[i], i
