"""Text analysis operators for training-data pipelines.

Language-ID, quality scoring, token counting, and document
fingerprinting over a documents table. All pure Catalyst column
algebra (no UDFs) so each is one scan with whole-stage codegen, and
each has an exact DuckDB-SQL twin for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.standard import ENGLISH_STOP_WORDS

_STOP_LIST = sorted(ENGLISH_STOP_WORDS)


def token_count(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + distinct-term count per doc."""
    words = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features (C4/Gopher-style rules, simplified):
    token count, mean token length, stopword ratio, distinct ratio —
    plus a composite 0..1000 integer score (quantized so it is
    engine-stable).

    score = 1000 * (0.4*stop_ok + 0.3*len_ok + 0.3*diversity) where
      stop_ok   = min(1, stopword_ratio / 0.05)   (natural text has stopwords)
      len_ok    = 1 if 3 <= mean_len <= 12 else 0
      diversity = n_distinct / n_tokens
    """
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(_STOP_LIST)))
    n_dist = F.size(F.array_distinct(words))
    mean_len = (F.length(F.col(text_col)) - (n - 1)) / n  # chars sans spaces / tokens
    stop_ratio = n_stop.cast("double") / n
    stop_ok = F.least(F.lit(1.0), stop_ratio / F.lit(0.05))
    len_ok = F.when((mean_len >= 3) & (mean_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    diversity = n_dist.cast("double") / n
    score = F.lit(1000.0) * (F.lit(0.4) * stop_ok + F.lit(0.3) * len_ok
                             + F.lit(0.3) * diversity)
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_dist.alias("n_distinct"),
        F.floor(score).cast("long").alias("quality_q"),
    )


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID. Real systems use char-n-gram profiles;
    the deterministic rule here: 'en' iff the English-stopword token
    ratio >= 2%, else 'unknown'. (On synthetic corpora this exercises
    the plumbing; swap the rule for an n-gram profile table joined by
    top-gram when real multilingual text exists.)"""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(_STOP_LIST)))
    pred = F.when(n_stop.cast("double") / n >= 0.02, F.lit("en")).otherwise(
        F.lit("unknown"))
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the sorted distinct token stream
    (the classic 'fingerprint' dedup key — word-order and repetition
    insensitive)."""
    words = F.split(F.col(text_col), " ")
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(words)))
    return df.select(F.col(id_col), F.md5(canon).alias("fingerprint"))


# BPE-ish subword pattern: letter runs cap at 4 chars (the average
# merged-piece length of common BPE vocabularies), digits tokenize
# singly, any other non-space char is its own piece — a deterministic
# estimator of LLM token counts that needs no vocabulary file.
BPE_PATTERN = r"[a-z]{1,4}|[A-Z]{1,4}|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_estimate(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Tokenizer-free LLM token-count estimate: the number of matches
    of BPE_PATTERN (letter runs chunked at 4, digits single,
    punctuation single) — the training-pipeline budget estimator used
    when the real tokenizer is too expensive to run corpus-wide.
    Pure Catalyst (regexp_count), one scan. Returns
    (doc_id, n_tokens_ws, n_tokens_bpe)."""
    words = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.size(F.filter(words, lambda w: w != "")).cast("long")
        .alias("n_tokens_ws"),
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).cast("long")
        .alias("n_tokens_bpe"),
    )
