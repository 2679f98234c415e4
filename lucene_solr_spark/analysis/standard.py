"""StandardAnalyzer-semantics analysis chain, vectorized for Spark.

Reproduces the reference pipeline
(lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:101-114):

    StandardTokenizer -> StandardFilter(no-op) -> LowerCaseFilter -> StopFilter

Semantics ported (reference citations):

- UAX#29-style word segmentation (StandardTokenizerImpl.jflex:43-60):
  runs of letters/digits; MidLetter apostrophe kept between letters
  ("O'Reilly's" -> one token); MidNum '.'/',' kept between digits
  ("3.14", "1,000" -> one token); everything else splits. CJK
  ideographs are emitted one-token-per-ideograph (TestStandardAnalyzer
  testChinese, line 199).
- maxTokenLength = 255 (StandardTokenizer.java:100-123): longer tokens
  are DISCARDED and the position counter still advances
  (skippedPositions semantics).
- LowerCaseFilter (analysis/LowerCaseFilter.java): per-codepoint
  Character.toLowerCase — i.e. Unicode *simple* case mapping, applied
  without string context. This differs from Python str.lower() for
  e.g. U+0130 'İ' (simple mapping -> 'i', full mapping -> 'i̇') and
  for final sigma (no contextual ς here). We apply the simple mapping
  per codepoint.
- StopFilter with the 33-word English stop set
  (StandardAnalyzer.java:44-50); removed tokens leave position holes
  (position increments preserved) and do NOT count toward field
  length (DefaultIndexingChain.java:742-804 counts only emitted
  tokens).

The hot path is vectorized: an ASCII fast path lowercases with pandas
string ops and tokenizes with a compiled regex; the general path falls
back to per-string Python only for rows containing non-ASCII.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# The exact 33-term English stop set, StandardAnalyzer.java:44-50.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255  # StandardTokenizer.java:100-123

# CJK ideograph ranges emitted one-per-codepoint (UAX#29 treats Han as
# its own category; Lucene's grammar tags them IDEOGRAPHIC and emits
# singles).
_CJK = "一-鿿㐀-䶿豈-﫿"

# Word pattern: an alnum start, continued by alnum, or an apostrophe
# that is followed by a letter (MidLetter), or ./, followed by a digit
# (MidNum). CJK ideographs match singly and never join runs.
_WORD_RE = re.compile(
    rf"[{_CJK}]"
    rf"|[^\W_{_CJK}](?:[^\W_{_CJK}]|['’](?=[^\W\d_])|[.,](?=\d))*",
    re.UNICODE,
)
# ASCII-only fast-path variant (no CJK branch needed).
_ASCII_WORD_RE = re.compile(r"[a-z0-9](?:[a-z0-9]|'(?=[a-z])|[.,](?=[0-9]))*")


@lru_cache(maxsize=4096)
def _lower_cp(ch: str) -> str:
    """Unicode *simple* lowercase of one codepoint (Java
    Character.toLowerCase semantics): when the full mapping expands to
    multiple codepoints (e.g. U+0130), keep the first, which equals the
    simple mapping for every such character in practice."""
    low = ch.lower()
    return low if len(low) == 1 else low[0]


def _java_lower(token: str) -> str:
    if token.isascii():
        return token.lower()
    return "".join(_lower_cp(c) for c in token)


def analyze(text: str) -> list[tuple[str, int]]:
    """Full chain on one string -> [(term, position)].

    Positions are the Lucene token positions: stopped and over-length
    tokens leave holes (the next surviving token keeps its original
    position), mirroring StopFilter's preserved position increments
    and StandardTokenizer's skippedPositions.
    """
    out: list[tuple[str, int]] = []
    # findall avoids per-match object allocation; the token ordinal
    # (Lucene position) is the enumeration index, holes included
    for pos, tok in enumerate(_WORD_RE.findall(text)):
        if len(tok) > MAX_TOKEN_LENGTH:
            continue  # discarded, position already advanced
        tok = _java_lower(tok)
        if tok in ENGLISH_STOP_WORDS:
            continue  # position hole
        out.append((tok, pos))
    return out


def _analyze_ascii_lower(text: str) -> list[tuple[str, int]]:
    """Fast path: input already ASCII-lowercased."""
    out: list[tuple[str, int]] = []
    for pos, tok in enumerate(_ASCII_WORD_RE.findall(text)):
        if len(tok) > MAX_TOKEN_LENGTH or tok in ENGLISH_STOP_WORDS:
            continue
        out.append((tok, pos))
    return out


def analyze_offsets(text: str) -> list[tuple[str, int, int, int]]:
    """Full chain with CHARACTER OFFSETS: [(term, position, start,
    end)] — start/end index into the ORIGINAL text (offsets are set by
    the tokenizer before any filter, OffsetAttribute semantics), with
    the same stop/overlength position-hole behavior as analyze()."""
    out: list[tuple[str, int, int, int]] = []
    if text.isascii():
        lowered = text.lower()   # 1:1 on ASCII — offsets unchanged
        for pos, m in enumerate(_ASCII_WORD_RE.finditer(lowered)):
            tok = m.group()
            if len(tok) > MAX_TOKEN_LENGTH or tok in ENGLISH_STOP_WORDS:
                continue
            out.append((tok, pos, m.start(), m.end()))
        return out
    for pos, m in enumerate(_WORD_RE.finditer(text)):
        tok = m.group()
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        tok = _java_lower(tok)
        if tok in ENGLISH_STOP_WORDS:
            continue
        out.append((tok, pos, m.start(), m.end()))
    return out


def analyze_series(texts: pd.Series) -> pd.Series:
    """Vectorized batch analysis: Series[str] -> Series[list[dict]].

    Shape matches Spark type array<struct<term:string,pos:int>>.
    """
    texts = texts.fillna("")
    # ASCII fast path: lowercase whole strings with pandas (identical
    # to per-codepoint simple mapping on ASCII), tokenize lowercased.
    is_ascii = np.fromiter((t.isascii() for t in texts), dtype=bool, count=len(texts))
    result = np.empty(len(texts), dtype=object)
    if is_ascii.any():
        lowered = texts[is_ascii].str.lower()
        result[np.flatnonzero(is_ascii)] = [
            [{"term": t, "pos": p} for t, p in _analyze_ascii_lower(s)] for s in lowered
        ]
    if (~is_ascii).any():
        result[np.flatnonzero(~is_ascii)] = [
            [{"term": t, "pos": p} for t, p in analyze(s)] for s in texts[~is_ascii]
        ]
    return pd.Series(result, index=texts.index)


# Explicit DataType objects (DDL strings would require an active
# SparkContext at import time).
TOKENS_TYPE = ArrayType(StructType([
    StructField("term", StringType()),
    StructField("pos", IntegerType()),
]))


@pandas_udf(TOKENS_TYPE)
def tokens_udf(texts: pd.Series) -> pd.Series:
    """Spark-facing vectorized analyzer (Arrow-batched)."""
    return analyze_series(texts)


@pandas_udf(ArrayType(StringType()))
def terms_only_udf(texts: pd.Series) -> pd.Series:
    """Terms without positions (cheaper when positions aren't needed)."""
    toks = analyze_series(texts)
    return toks.map(lambda lst: [d["term"] for d in lst])


def invert_batch_offsets(texts: pd.Series):
    """analyze + invert with char offsets: per text returns
    (doclen, terms, tfs, poslists, startlists, endlists) — the
    occurrence order within a term is position order, so the offset
    arrays align 1:1 with the position arrays (the .pay/.pos pairing
    of Lucene50PostingsFormat.java:266-315)."""
    texts = texts.fillna("")
    n = len(texts)
    doclens = np.empty(n, dtype=np.int32)
    terms_out = np.empty(n, dtype=object)
    tfs_out = np.empty(n, dtype=object)
    pos_out = np.empty(n, dtype=object)
    st_out = np.empty(n, dtype=object)
    en_out = np.empty(n, dtype=object)
    for i, s in enumerate(texts):
        toks = analyze_offsets(s)
        doclens[i] = len(toks)
        d: dict[str, list[tuple[int, int, int]]] = {}
        for t, p, st, en in toks:
            d.setdefault(t, []).append((p, st, en))
        terms = sorted(d)
        terms_out[i] = terms
        tfs_out[i] = [len(d[t]) for t in terms]
        pos_out[i] = [[x[0] for x in d[t]] for t in terms]
        st_out[i] = [[x[1] for x in d[t]] for t in terms]
        en_out[i] = [[x[2] for x in d[t]] for t in terms]
    return doclens, terms_out, tfs_out, pos_out, st_out, en_out


def invert_batch(texts: pd.Series, with_positions: bool = True,
                 analyze_fn=None):
    """Analyze + per-document inversion in ONE pass (the
    DefaultIndexingChain.processField + TermsHashPerField.add step
    fused): for each text, returns (doclen, terms, tfs[, poslists])
    where terms are the doc's distinct terms sorted, tfs the
    per-term frequencies, poslists the per-term sorted positions.

    Doing the inversion inside the Arrow batch removes the
    per-token-occurrence explode+shuffle from the build: the shuffle
    then carries one row per (doc, distinct term), already combined —
    the same reduction TermsHashPerField's in-RAM hash performs before
    flush.

    ``analyze_fn``: optional swapped tokenize step (text ->
    [(term, pos)]) so alternate analyzers (whitespace/simple/keyword)
    share this fused inverter instead of a slower generic path; None
    selects the standard chain.
    """
    from collections import Counter

    texts = texts.fillna("")
    doclens = np.empty(len(texts), dtype=np.int32)
    terms_out = np.empty(len(texts), dtype=object)
    tfs_out = np.empty(len(texts), dtype=object)
    pos_out = np.empty(len(texts), dtype=object) if with_positions else None
    for i, s in enumerate(texts):
        if analyze_fn is not None:
            toks = analyze_fn(s)
        else:
            toks = _analyze_ascii_lower(s.lower()) if s.isascii() else analyze(s)
        # field length = number of EMITTED tokens (stop/overlength
        # excluded), BM25Similarity discountOverlaps semantics.
        doclens[i] = len(toks)
        if not toks:
            terms_out[i] = []
            tfs_out[i] = []
            if with_positions:
                pos_out[i] = []
            continue
        if with_positions:
            # dict-accumulated per-term position lists (C-speed dict
            # ops beat np.unique+argsort+split on ~200-token docs 4x)
            d: dict[str, list[int]] = {}
            for t, p in toks:
                lst = d.get(t)
                if lst is None:
                    d[t] = [p]
                else:
                    lst.append(p)
            terms = sorted(d)
            terms_out[i] = terms
            tfs_out[i] = [len(d[t]) for t in terms]
            pos_out[i] = [d[t] for t in terms]
        else:
            c = Counter(t for t, _ in toks)
            terms = sorted(c)
            terms_out[i] = terms
            tfs_out[i] = [c[t] for t in terms]
    if with_positions:
        return doclens, terms_out, tfs_out, pos_out
    return doclens, terms_out, tfs_out
