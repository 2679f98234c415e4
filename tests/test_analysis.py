"""Golden analysis fixtures (FIXTURES.md §3), modeled on the
reference's TestStandardAnalyzer cases."""

from __future__ import annotations

import pandas as pd

from lucene_solr_spark.analysis.standard import (
    ENGLISH_STOP_WORDS,
    analyze,
    analyze_series,
)


def test_stop_set_is_the_33_lucene_words():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS


def test_alphanum():
    # TestStandardAnalyzer.java:106-115
    assert [t for t, _ in analyze("Testing 1234")] == ["testing", "1234"]


def test_stopwords_leave_position_holes():
    # "the quick brown fox": 'the' at pos 0 dropped, holes preserved
    assert analyze("the quick brown fox") == [("quick", 1), ("brown", 2), ("fox", 3)]


def test_apostrophes_uax29_midletter():
    assert [t for t, _ in analyze("O'Reilly's book")] == ["o'reilly's", "book"]


def test_numerics():
    # testTextWithNumbersSA (line 253): R2D2 C-3PO -> r2d2, c, 3po
    assert [t for t, _ in analyze("R2D2 C-3PO")] == ["r2d2", "c", "3po"]


def test_number_with_decimal_and_thousands():
    assert [t for t, _ in analyze("pi is 3.14 and 1,000 more")] == [
        "pi", "3.14", "1,000", "more"]


def test_cjk_one_token_per_ideograph():
    # testChinese (line 199)
    assert [t for t, _ in analyze("我是中国人")] == list("我是中国人")


def test_max_token_length_discard_advances_position():
    long_tok = "x" * 256
    out = analyze(f"alpha {long_tok} beta")
    assert out == [("alpha", 0), ("beta", 2)]
    ok_tok = "y" * 255
    assert (ok_tok, 1) in analyze(f"alpha {ok_tok} beta")


def test_java_simple_lowercase_semantics():
    # U+0130: Java Character.toLowerCase -> 'i' (simple mapping),
    # python str.lower -> 'i' + combining dot (full mapping).
    out = [t for t, _ in analyze("İstanbul")]
    assert out == ["istanbul"]
    # final sigma: per-codepoint mapping has no context -> σ not ς
    out = [t for t, _ in analyze("ΣΟΦΟΣ")]
    assert out == ["σοφοσ"]


def test_empty_and_punct_only():
    assert analyze("") == []
    assert analyze("!!! --- ...") == []


def test_vectorized_matches_scalar():
    texts = pd.Series([
        "Testing 1234", "the quick brown fox", "O'Reilly's", "R2D2 C-3PO",
        "我是中国人 mixed ascii", "", None, "İstanbul ΣΟΦΟΣ",
    ])
    vec = analyze_series(texts)
    for i, t in texts.items():
        expected = [{"term": a, "pos": p} for a, p in analyze(t or "")]
        assert vec[i] == expected, f"row {i}: {t!r}"


def test_alternate_analyzers():
    """analysis/extra: whitespace (no fold, no stop), simple (letter
    runs, lowered), keyword (whole input one token)."""
    from lucene_solr_spark.analysis.extra import (
        keyword_analyze, simple_analyze, whitespace_analyze)

    s = "The QUICK-Brown fox2 jumps"
    assert whitespace_analyze(s) == [
        ("The", 0), ("QUICK-Brown", 1), ("fox2", 2), ("jumps", 3)]
    assert simple_analyze(s) == [
        ("the", 0), ("quick", 1), ("brown", 2), ("fox", 3), ("jumps", 4)]
    assert keyword_analyze(s) == [(s, 0)]
    assert keyword_analyze("") == []


def test_keyword_analyzer_end_to_end(spark):
    """Keyword-analyzed index: the whole text is one exact-match term."""
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.executor import Searcher

    df = spark.createDataFrame(
        [("u1", "alpha beta"), ("u2", "alpha"), ("u3", "alpha beta")],
        "url string, text string")
    idx = build_index(df, analyzer="keyword")
    s = Searcher(idx, mode="lucene")
    from lucene_solr_spark.search.ast import TermQ

    hits = {r["docid"] for r in s.matches(TermQ("alpha beta")).collect()}
    assert len(hits) == 2
    assert s.matches(TermQ("alpha")).count() == 1
