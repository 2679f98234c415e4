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

Each is a plain ``analyze(text) -> [(term, position)]`` plus a
generic batch inverter; they plug into build_index(analyzer=...) /
build_segment_index(analyzer=...). The standard chain keeps its fused
numpy fast path (analysis/standard.py) — these generic inverters are
correctness-first (alternate analyzers are not the benchmarked hot
path).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

MAX_TOKEN_LENGTH = 255

_LETTER_RE = re.compile(r"[^\W\d_]+")


def whitespace_analyze(text: str) -> list[tuple[str, int]]:
    out = []
    for pos, tok in enumerate(text.split()):
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        out.append((tok, pos))
    return out


def simple_analyze(text: str) -> list[tuple[str, int]]:
    out = []
    for pos, tok in enumerate(_LETTER_RE.findall(text)):
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        out.append((tok.lower(), pos))
    return out


def keyword_analyze(text: str) -> list[tuple[str, int]]:
    return [(text, 0)] if text else []


ANALYZERS = {
    "whitespace": whitespace_analyze,
    "simple": simple_analyze,
    "keyword": keyword_analyze,
}


def invert_batch_generic(texts: pd.Series, analyze, with_positions: bool):
    """Generic analyze+invert for one Arrow batch: per text returns
    (doclen, terms, tfs[, poslists]) with terms sorted and positions
    in ascending order — the same contract as the standard chain's
    invert_batch."""
    texts = texts.fillna("")
    n = len(texts)
    doclens = np.empty(n, dtype=np.int32)
    all_terms, all_tfs, all_pos = [], [], []
    for i, text in enumerate(texts):
        toks = analyze(text)
        doclens[i] = len(toks)
        by_term: dict[str, list[int]] = {}
        for term, pos in toks:
            by_term.setdefault(term, []).append(pos)
        terms = sorted(by_term)
        all_terms.append(np.array(terms, dtype=object))
        all_tfs.append(np.array([len(by_term[t]) for t in terms],
                                dtype=np.int32))
        if with_positions:
            all_pos.append([np.array(by_term[t], dtype=np.int32)
                            for t in terms])
    if with_positions:
        return doclens, all_terms, all_tfs, all_pos
    return doclens, all_terms, all_tfs
