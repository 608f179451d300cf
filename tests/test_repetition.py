"""Gopher-style repetition signals: hand-computed goldens + degenerate inputs."""

import pytest
from pyspark.sql import functions as F

from xoverrr_spark.operators.repetition import repetition_stats, repetitive_docs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_stats_hand_computed(spark):
    # "a b a b a b": bigrams [a b, b a, a b, b a, a b] -> total 5,
    # distinct 2, top "a b" x3 => dup 3/5, top 3/5
    out = repetition_stats(_docs(spark, [(1, "a b a b a b")])).collect()[0]
    assert out.n_bigrams == 5
    assert out.dup_bigrams == 3
    assert out.top_count == 3
    assert out.dup_bigram_frac == pytest.approx(0.6)
    assert out.top_bigram_frac == pytest.approx(0.6)


def test_repetition_all_distinct_is_zero_dup(spark):
    out = repetition_stats(_docs(spark, [(1, "one two three four")])).collect()[0]
    assert out.n_bigrams == 3 and out.dup_bigrams == 0 and out.top_count == 1


def test_repetition_degenerate_docs_excluded(spark):
    rows = [(1, "single"), (2, ""), (3, "   "), (4, None), (5, "x y")]
    got = repetition_stats(_docs(spark, rows))
    assert [r.doc_id for r in got.collect()] == [5]


def test_repetition_case_and_whitespace_fold(spark):
    a = repetition_stats(_docs(spark, [(1, "A  b\ta B")])).collect()[0]
    b = repetition_stats(_docs(spark, [(1, "a b a b")])).collect()[0]
    assert (a.n_bigrams, a.dup_bigrams, a.top_count) == (
        b.n_bigrams, b.dup_bigrams, b.top_count)


def test_repetitive_docs_flags_only_over_threshold(spark):
    rows = [(1, "spam spam spam spam spam spam"),   # top_frac 1.0
            (2, "the quick brown fox jumps high")]  # all distinct
    flagged = repetitive_docs(_docs(spark, rows))
    assert [r.doc_id for r in flagged.collect()] == [1]


def test_repetition_matches_pandas_twin_on_fixture(spark):
    """Independent per-doc recomputation in plain Python over real testdata."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    rows = docs.select("doc_id", "text").collect()
    checked = 0
    for r in rows[:200]:
        words = r.text.strip().lower().split() if r.text and r.text.strip() else []
        grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        if not grams:
            assert r.doc_id not in got
            continue
        from collections import Counter
        c = Counter(grams)
        g = got[r.doc_id]
        assert g.n_bigrams == len(grams)
        assert g.dup_bigrams == len(grams) - len(c)
        assert g.top_count == max(c.values())
        checked += 1
    assert checked > 50
