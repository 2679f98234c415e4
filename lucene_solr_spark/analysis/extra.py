"""Alternate analyzers beyond StandardAnalyzer (the most-used trio of
the reference's 100+ analyzer farm):

  WhitespaceAnalyzer  core/analysis/WhitespaceTokenizer (via
                      analysis/common .../core/WhitespaceAnalyzer.java)
                      — split on whitespace, no case folding, no stop
                      filter, 255-char token cap
  SimpleAnalyzer      .../core/SimpleAnalyzer.java — maximal letter
                      runs (LetterTokenizer), lowercased
  KeywordAnalyzer     .../core/KeywordAnalyzer.java — the whole input
                      is ONE token (exact-match fields)

Each is a plain ``analyze(text) -> [(term, position)]``; they plug
into build_index(analyzer=...) / build_segment_index(analyzer=...).
The batch inverter is the standard chain's fused one-pass
analyze+invert (analysis/standard.py invert_batch) with the tokenize
step swapped — alternate-analyzer builds share the hot path's loop
shape instead of a slower generic walk.
"""

from __future__ import annotations

import re

import pandas as pd

MAX_TOKEN_LENGTH = 255

_LETTER_RE = re.compile(r"[^\W\d_]+")


def whitespace_analyze(text: str) -> list[tuple[str, int]]:
    return [(t, p) for p, t in enumerate(text.split())
            if len(t) <= MAX_TOKEN_LENGTH]


def simple_analyze(text: str) -> list[tuple[str, int]]:
    return [(t.lower(), p)
            for p, t in enumerate(_LETTER_RE.findall(text))
            if len(t) <= MAX_TOKEN_LENGTH]


def keyword_analyze(text: str) -> list[tuple[str, int]]:
    return [(text, 0)] if text else []


ANALYZERS = {
    "whitespace": whitespace_analyze,
    "simple": simple_analyze,
    "keyword": keyword_analyze,
}


def invert_batch_generic(texts: pd.Series, analyze, with_positions: bool):
    """Analyze+invert for one Arrow batch with a swapped tokenize step:
    delegates to the standard chain's fused invert_batch, so alternate
    analyzers invert at the same per-doc cost as the standard build
    (same contract: (doclen, terms, tfs[, poslists]), terms sorted,
    positions ascending)."""
    from lucene_solr_spark.analysis.standard import invert_batch

    return invert_batch(texts, with_positions, analyze_fn=analyze)
