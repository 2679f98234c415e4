"""Search-adjacent feature modules (SURVEY §2.13): suggest /
autocomplete, spellcheck, MoreLikeThis, highlighting.

Each is the reference feature re-expressed as a short DataFrame
program over the index tables — no side-car FST/automaton structures:
the term-stats table plays the suggester FST's role (prefix-pruned
scan + top-k by weight), Spark's levenshtein() plays the Levenshtein
automaton's, and stored text plays the term-vector highlighter's.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_solr_spark.index.builder import IndexTables


def suggest_prefix(index: IndexTables, prefix: str, k: int = 10) -> DataFrame:
    """Autocomplete: top-k dictionary terms with ``prefix``, weighted
    by document frequency (lucene/suggest FST suggesters use a stored
    weight; df is the natural corpus weight). Returns
    (term, weight, rank)."""
    cand = index.term_stats.where(F.col("term").startswith(prefix))
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    return (cand.select("term", F.col("df").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term")).limit(k)
            .withColumn("rank", F.row_number().over(
                Window.orderBy(F.desc("weight"), F.asc("term")))))


def spellcheck(index: IndexTables, word: str, max_edits: int = 2,
               k: int = 5) -> DataFrame:
    """DirectSpellChecker shape (solr/core/.../spelling/): dictionary
    terms within ``max_edits`` Levenshtein distance, ranked by
    (distance asc, df desc, term asc). Spark's levenshtein() replaces
    the Levenshtein automaton term intersection. See
    ``direct_spellcheck`` for the faithful variant (OSA transposition
    distance, the 1 - d/min(len) score scale and the reference
    comparator)."""
    cand = index.term_stats.select(
        "term", F.col("df").cast("long").alias("df"),
        F.levenshtein(F.col("term"), F.lit(word)).alias("dist"),
    ).where((F.col("dist") <= max_edits) & (F.col("term") != word))
    order = [F.asc("dist"), F.desc("df"), F.asc("term")]
    return (cand.orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(Window.orderBy(*order))))


def more_like_this_terms(index: IndexTables, doc_id: int,
                         max_terms: int = 10, min_df: int = 2,
                         min_term_freq: int = 1,
                         min_word_len: int = 0, max_word_len: int = 0,
                         stop_words: set[str] | None = None) -> DataFrame:
    """MoreLikeThis term selection (lucene/queries/.../mlt/
    MoreLikeThis.java): the doc's terms ranked by tf * idf with
    idf = ln(1 + n/(df+1)) (ClassicSimilarity-flavored, kept exact
    and engine-portable), df-floored. The full reference gate set
    (MoreLikeThis.java:217-276): ``min_term_freq`` (isNoiseWord's tf
    floor), ``min_word_len``/``max_word_len`` (0 = unbounded),
    ``stop_words``. Returns (term, score_q, rank)."""
    n = float(index.coll_stats["doc_count"])
    mine = index.postings.where(F.col("docid") == doc_id).select("term", "tf")
    if min_term_freq > 1:
        mine = mine.where(F.col("tf") >= min_term_freq)
    if min_word_len > 0:
        mine = mine.where(F.length("term") >= min_word_len)
    if max_word_len > 0:
        mine = mine.where(F.length("term") <= max_word_len)
    if stop_words:
        mine = mine.where(~F.col("term").isin(sorted(stop_words)))
    j = mine.join(index.term_stats.select("term", "df"), "term")
    score = (F.col("tf").cast("double")
             * F.log(F.lit(1.0) + F.lit(n) / (F.col("df").cast("double") + 1.0)))
    cand = j.where(F.col("df") >= min_df).select(
        "term", F.floor(score * 1_000_000).cast("long").alias("score_q"))
    order = [F.desc("score_q"), F.asc("term")]
    return (cand.orderBy(*order).limit(max_terms)
            .withColumn("rank", F.row_number().over(Window.orderBy(*order))))


def highlight(docs_text: DataFrame, term: str, radius: int = 20,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Unified-highlighter shape (lucene/highlighter/.../uhighlight/):
    snippet of +-radius chars around the first occurrence of ``term``.
    Offsets come from the stored text (the postings-offsets strategy
    degenerates to locate() because our fixture text is its own
    offset source). Returns (doc_id, off, snippet)."""
    pos = F.locate(term, F.col(text_col))  # 1-based; 0 = no match
    start = F.greatest(F.lit(1), pos - F.lit(radius))
    out = docs_text.select(
        F.col(id_col),
        pos.alias("off"),
        F.when(pos > 0, F.substring(F.col(text_col), start,
                                    F.lit(2 * radius) + F.length(F.lit(term))))
        .alias("snippet"),
    ).where(F.col("off") > 0)
    # 1-based substring with dynamic start needs expr-compatible args;
    # F.substring accepts Columns in Spark 4.
    return out


def highlight_offsets(index: IndexTables, docs_text: DataFrame, term: str,
                      radius: int = 20, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Offset-based highlighting (the unified highlighter's
    OffsetSource.POSTINGS strategy, lucene/highlighter/.../uhighlight/
    FieldOffsetStrategy.java): char offsets of the first TOKEN
    occurrence come from the index's offsets stream (the .pay
    analogue, Lucene50PostingsFormat.java:266-315) — the stored text
    is only sliced, never re-scanned or re-analyzed. Requires an index
    built with offsets (build_index(with_offsets=True) or
    store_offsets=True). Token-accurate, unlike the locate() fallback:
    a doc containing only 'merged' does not highlight for 'merge'.
    Returns (doc_id, off [1-based start], snippet)."""
    occ = (index.postings.where(F.col("term") == term)
           .select("docid",
                   F.col("starts")[0].alias("st"),
                   F.col("ends")[0].alias("en")))
    j = occ.join(docs_text.select(F.col(id_col).alias("docid"),
                                  F.col(text_col).alias("_text")), "docid")
    snip_start = F.greatest(F.lit(1), F.col("st") + 1 - F.lit(radius))
    snip_len = (F.col("en") + F.lit(radius)) - snip_start + F.lit(1)
    return j.select(
        F.col("docid").alias(id_col),
        (F.col("st") + 1).cast("long").alias("off"),
        F.substring(F.col("_text"), snip_start, snip_len).alias("snippet"))


# --- analyzed completion (lucene/suggest analyzing/AnalyzingSuggester) ------

SUGGEST_SEP = "\x1f"  # preserveSep token boundary (SEP_LABEL analogue)


def build_analyzing_suggester(entries: DataFrame, surface_col: str = "surface",
                              weight_col: str = "weight") -> DataFrame:
    """AnalyzingSuggester build side (lucene/suggest/.../analyzing/
    AnalyzingSuggester.java:397-480): each entry's surface form is run
    through the SAME analysis chain as queries will be, and the
    analyzed token sequence joined with a separator byte becomes the
    completion key (preserveSep=true: 'foobar' does not complete
    'foo bar'). Surface forms sharing a key are deduplicated keeping
    the max weight (the suggester's per-analyzed-form dedup). The
    result table is the FST stand-in: (key, surface, weight), to be
    persisted sorted by key so lookups are range scans."""
    from lucene_solr_spark.analysis.standard import terms_only_udf

    keyed = entries.select(
        F.array_join(terms_only_udf(F.col(surface_col)),
                     SUGGEST_SEP).alias("key"),
        F.col(surface_col).alias("surface"),
        F.col(weight_col).cast("long").alias("weight"),
    ).where(F.col("key") != "")
    return keyed.groupBy("key", "surface").agg(F.max("weight").alias("weight"))


SUGGEST_PREFIX_LEN = 2  # key-prefix partition width of the persisted layout


def write_suggester(suggester: DataFrame, path: str,
                    prefix_len: int = SUGGEST_PREFIX_LEN) -> None:
    """Persist the completion table in the FST file's role
    (AnalyzingSuggester.java store(): the weight-sorted FST written
    once, memory-mapped by lookups): keys are directory-partitioned by
    their first ``prefix_len`` chars and sorted within each partition,
    so a lookup touches ONE key-prefix partition (partition pruning)
    and, inside it, only the row groups whose [min,max] key range
    intersects the prefix (parquet StartsWith pushdown) — the
    range-scan shape of an FST prefix walk, O(matching keys) IO."""
    (suggester
     .withColumn("pfx", F.substring("key", 1, prefix_len))
     .repartition("pfx")
     .sortWithinPartitions("key")
     .write.partitionBy("pfx").mode("overwrite").parquet(path))


def load_suggester(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def analyzing_suggest(suggester: DataFrame, query: str, k: int = 10,
                      exact_first: bool = True,
                      prefix_len: int = SUGGEST_PREFIX_LEN) -> DataFrame:
    """AnalyzingSuggester.lookup (AnalyzingSuggester.java:614-694):
    analyze the query with the same chain, treat the LAST token as a
    partial prefix, match completion keys by prefix, rank by
    (exact-match first when ``exact_first``, weight desc, surface asc)
    — the weight-ordered automaton/FST intersection re-expressed as a
    prefix range scan + top-k. On a write_suggester layout (a 'pfx'
    column is present) the scan adds the partition-pruning predicate,
    so only the query's key-prefix directory is read.
    Returns (surface, weight, rank)."""
    from lucene_solr_spark.analysis.standard import analyze

    toks = [t for t, _ in analyze(query)]
    if not toks:
        spark = suggester.sparkSession
        return spark.createDataFrame([], "surface string, weight long, rank long")
    qkey = SUGGEST_SEP.join(toks)
    cand = suggester
    if "pfx" in suggester.columns:
        # equality when len(qkey) >= prefix_len (pfx is exactly the
        # key's first prefix_len chars there); startswith covers the
        # shorter-query case — both prune on the partition column.
        cand = cand.where(F.col("pfx").startswith(qkey[:prefix_len]))
    cand = cand.where(F.col("key").startswith(qkey))
    exact = F.when(F.col("key") == qkey, F.lit(1)).otherwise(F.lit(0))
    if not exact_first:
        exact = F.lit(0)
    scored = cand.select("surface", "weight", exact.alias("is_exact"))
    order = [F.desc("is_exact"), F.desc("weight"), F.asc("surface")]
    return (scored.orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(Window.orderBy(*order))
                        .cast("long"))
            .select("surface", "weight", "rank"))


def highlight_passages(index: IndexTables, docs_text: DataFrame,
                       terms: list[str], window: int = 16,
                       n_passages: int = 2, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """BM25-weighted PASSAGE ranking (lucene/highlighter/.../uhighlight/
    UnifiedHighlighter.java + PassageScorer.java): the text is broken
    into passages and the query's matches score each passage; the
    top-N passages per doc are returned, not just the first term
    window.

    Passage = a fixed window of ``window`` token positions (the
    BreakIterator stand-in for this corpus's sentence-free text);
    passage score = sum over query-term occurrences of the term's idf
    weight (PassageScorer's unique-term-weighted count). For
    cross-engine determinism the weight is the QUANTIZED BM25 idf,
    floor(idf * 1e6) as an integer — integer sums are order-free, so
    Spark and the DuckDB oracle agree exactly (documented deviation
    from PassageScorer's float passage norm). Ties: (score desc,
    passage start asc), rank 1..n_passages per doc.

    One Catalyst plan: explode the offsets-enabled postings
    (positions/starts/ends ride the same occurrence order), hash-agg
    per (doc, passage), per-doc ranking window, snippet sliced from
    the stored text between the passage's first matched token start
    and last matched token end. Requires build_index(with_offsets).
    Returns (doc_id, passage, score_q, n_match, snippet).
    """
    terms = sorted(set(terms))
    n_doc = float(index.coll_stats["doc_count"])
    p = index.postings.where(F.col("term").isin(terms))
    dfs = {r["term"]: float(r["n"]) for r in
           p.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    import math
    # ln(1 + x), NOT log1p: the DuckDB oracle computes ln(1 + x) and
    # the two can differ by 1 ulp right at a floor() boundary
    iq = {t: int(math.floor(
        math.log(1.0 + (n_doc - dfs[t] + 0.5) / (dfs[t] + 0.5)) * 1e6))
        for t in terms if t in dfs}
    if not iq:
        return docs_text.select(
            F.col(id_col), F.lit(0).cast("long").alias("passage"),
            F.lit(0).cast("long").alias("score_q"),
            F.lit(0).cast("long").alias("n_match"),
            F.lit("").alias("snippet")).where(F.lit(False))
    wmap = F.create_map(*[x for t, w in sorted(iq.items())
                          for x in (F.lit(t), F.lit(w))])
    occ = (p.select("docid", "term",
                    F.explode(F.arrays_zip("positions", "starts",
                                           "ends")).alias("o"))
           .select("docid", "term",
                   F.col("o.positions").alias("pos"),
                   F.col("o.starts").alias("st"),
                   F.col("o.ends").alias("en")))
    agg = (occ.withColumn("passage",
                          (F.col("pos") / F.lit(window)).cast("long"))
           .groupBy("docid", "passage")
           .agg(F.sum(wmap[F.col("term")]).cast("long").alias("score_q"),
                F.count(F.lit(1)).cast("long").alias("n_match"),
                F.min("st").alias("_st"), F.max("en").alias("_en")))
    w = Window.partitionBy("docid").orderBy(
        F.desc("score_q"), F.asc("passage"))
    top = (agg.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= n_passages))
    j = top.join(docs_text.select(F.col(id_col).alias("docid"),
                                  F.col(text_col).alias("_text")), "docid")
    return j.select(
        F.col("docid").alias(id_col), "passage", "score_q", "n_match",
        F.substring(F.col("_text"), F.col("_st") + 1,
                    F.col("_en") - F.col("_st")).alias("snippet"))


def word_break_suggest(index: IndexTables, words: list[str], k: int = 10,
                       min_suggestion_freq: int = 1,
                       min_break_len: int = 1,
                       sort_method: str = "max_freq") -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks (lucene/suggest/src/java/
    org/apache/lucene/search/spell/WordBreakSpellChecker.java:91-151),
    maxChanges=1: one-split break suggestions where BOTH halves are
    dictionary terms with df >= min_suggestion_freq and length >=
    min_break_len. Ranking is the default
    NUM_CHANGES_THEN_MAX_FREQUENCY (all candidates here are one
    change, so max(df_left, df_right) desc — pass
    sort_method="sum_freq" for NUM_CHANGES_THEN_SUMMED_FREQUENCY,
    left_df + right_df); exact-frequency ties are
    broken (word asc, split_pos asc) — the reference priority queue's
    order on ties is insertion-dependent, pinned here so the result is
    engine-portable. Returns (word, split_pos, left_term, right_term,
    left_df, right_df, max_freq, rank).

    Scale: the candidate frame is tiny (sum of word lengths) and is
    broadcast into two prefix/suffix equi-joins against term_stats;
    the isin() pre-filter pushes into the term-stats scan."""
    cand = []
    for w_ in words:
        for i in range(1, len(w_)):
            left, right = w_[:i], w_[i:]
            if len(left) >= min_break_len and len(right) >= min_break_len:
                cand.append((w_, i, left, right))
    spark = index.term_stats.sparkSession
    cdf = spark.createDataFrame(
        cand, "word string, split_pos long, left_term string, right_term string")
    subs = sorted({c[2] for c in cand} | {c[3] for c in cand})
    ts = (index.term_stats.where(F.col("term").isin(subs))
          .select("term", F.col("df").cast("long").alias("df"))
          .where(F.col("df") >= min_suggestion_freq))
    out = (F.broadcast(cdf)
           .join(ts.select(F.col("term").alias("left_term"),
                           F.col("df").alias("left_df")), "left_term")
           .join(ts.select(F.col("term").alias("right_term"),
                           F.col("df").alias("right_df")), "right_term")
           .select("word", "split_pos", "left_term", "right_term",
                   "left_df", "right_df",
                   (F.greatest("left_df", "right_df")
                    if sort_method == "max_freq"
                    else F.col("left_df") + F.col("right_df"))
                   .alias("max_freq")))
    order = [F.desc("max_freq"), F.asc("word"), F.asc("split_pos")]
    w = Window.orderBy(*order)
    return (out.orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long")))


def word_combine_suggest(index: IndexTables, terms: list[str], k: int = 10,
                         min_suggestion_freq: int = 1,
                         suggest_mode: str = "always") -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations
    (WordBreakSpellChecker.java:160-243), maxChanges=1 → adjacent
    pairs only (the reference inner loop runs j - i <= maxChanges):
    for each adjacent query-term pair, suggest the concatenation if it
    is a dictionary term with df >= min_suggestion_freq. Ranked by
    combined df desc, then pair index asc (same tie-pinning rationale
    as word_break_suggest). Returns (pair_idx, left_term, right_term,
    combined, combined_df, rank).

    ``suggest_mode`` follows the reference gates
    (WordBreakSpellChecker.java:215-223): "more_popular" keeps a
    combination only when its df >= the MAX of the pair's own dfs;
    "when_not_in_index" only when the pair's MIN df is 0; "always"
    applies no original-frequency gate."""
    if suggest_mode not in ("always", "when_not_in_index",
                            "more_popular"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    pairs = [(i, terms[i], terms[i + 1], terms[i] + terms[i + 1])
             for i in range(len(terms) - 1)]
    spark = index.term_stats.sparkSession
    if suggest_mode != "always":
        orig = [p[1] for p in pairs] + [p[2] for p in pairs]
        dfs = {r["term"]: int(r["df"]) for r in
               index.term_stats.where(F.col("term").isin(orig))
               .select("term", "df").collect()}
        if suggest_mode == "when_not_in_index":
            pairs = [p for p in pairs
                     if min(dfs.get(p[1], 0), dfs.get(p[2], 0)) == 0]
    if not pairs:
        return spark.createDataFrame(
            [], "pair_idx long, left_term string, right_term string, "
                "combined string, combined_df long, rank long")
    pdf = spark.createDataFrame(
        pairs, "pair_idx long, left_term string, right_term string, combined string")
    ts = (index.term_stats
          .where(F.col("term").isin([p[3] for p in pairs]))
          .select(F.col("term").alias("combined"),
                  F.col("df").cast("long").alias("combined_df"))
          .where(F.col("combined_df") >= min_suggestion_freq))
    out = F.broadcast(pdf).join(ts, "combined").select(
        "pair_idx", "left_term", "right_term", "combined", "combined_df")
    if suggest_mode == "more_popular":
        gates = {p[0]: max(dfs.get(p[1], 0), dfs.get(p[2], 0))
                 for p in pairs}
        gmap = F.create_map(*[x for i, g in gates.items()
                              for x in (F.lit(i), F.lit(g))])
        out = out.where(F.col("combined_df") >= gmap[F.col("pair_idx")])
    order = [F.desc("combined_df"), F.asc("pair_idx")]
    w = Window.orderBy(*order)
    return (out.orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long")))


def osa_distance(a: str, b: str) -> int:
    """Optimal-string-alignment edit distance with adjacent
    transpositions — the matrix DirectSpellChecker scores with
    (lucene/suggest/src/java/org/apache/lucene/search/spell/
    LuceneLevenshteinDistance.java:48-104; the automaton enumerator
    accepts exactly this set at max_edits<=2). NOT full
    Damerau-Levenshtein: a transposed pair cannot be edited again
    (d[i-2][j-2] recurrence)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0 if n == m else max(n, m)
    prev2 = None
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                v = min(v, prev2[j - 2] + cost)
            cur[j] = v
        prev2, prev = prev, cur
    return prev[m]


def direct_spellcheck(index: IndexTables, words: list[str],
                      k_per_word: int = 5, max_edits: int = 2,
                      accuracy: float = 0.5, min_df: int = 1,
                      suggest_mode: str = "always") -> DataFrame:
    """DirectSpellChecker.suggestSimilar (lucene/suggest/.../spell/
    DirectSpellChecker.java:286,341): dictionary candidates within
    ``max_edits`` OSA distance, scored 1 - dist/min(len) (the
    LuceneLevenshteinDistance scale), gated at ``accuracy`` (default
    0.5), ranked by SuggestWordQueue.DEFAULT_COMPARATOR
    (SuggestWordScoreComparator: score desc, freq desc, term asc),
    top ``k_per_word`` per input word. Scores are quantized
    floor(x*1e6) and the accuracy gate applies to the quantized value
    so the ordering is engine-portable (the ratio is an exact IEEE
    double of two small ints on every engine).

    ``suggest_mode`` (spell/SuggestMode.java): "always" (every word
    gets suggestions), "when_not_in_index" (words present in the
    dictionary get none — the reference default), "more_popular"
    (candidates must have df STRICTLY greater than the word's own df;
    0 for absent words).

    Scale: the |len(term) - len(word)| <= max_edits window is a plain
    Column predicate evaluated BELOW the Arrow-batched OSA UDF — the
    Levenshtein-automaton term-dict intersection's cheap analogue; the
    UDF only sees the surviving dictionary slice, never the corpus."""
    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def _osa(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([osa_distance(x, y) for x, y in zip(a, b)],
                         dtype="int32")

    if suggest_mode not in ("always", "when_not_in_index",
                            "more_popular"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    spark = index.term_stats.sparkSession
    word_df = {w: 0 for w in words}
    if suggest_mode != "always":
        for r in (index.term_stats.where(F.col("term").isin(words))
                  .select("term", "df").collect()):
            word_df[r["term"]] = int(r["df"])
    use = (words if suggest_mode != "when_not_in_index"
           else [w for w in words if word_df[w] == 0])
    if not use:
        return spark.createDataFrame(
            [], "word string, term string, df long, dist long, "
                "score_q long, rank long")
    words = use
    wdf = spark.createDataFrame([(w, len(w), int(word_df[w]))
                                 for w in words],
                                "word string, wlen int, wdf long")
    ts = index.term_stats.select("term",
                                 F.col("df").cast("long").alias("df"))
    cand = (ts.crossJoin(F.broadcast(wdf))
            .where((F.abs(F.length("term") - F.col("wlen")) <= max_edits)
                   & (F.col("term") != F.col("word"))
                   & (F.col("df") >= min_df))
            .where(F.col("df") > F.col("wdf")
                   if suggest_mode == "more_popular" else F.lit(True))
            .withColumn("dist", _osa("word", "term").cast("long"))
            .where(F.col("dist") <= max_edits))
    score = (F.lit(1.0) - F.col("dist").cast("double")
             / F.least(F.length("term"), F.col("wlen")).cast("double"))
    out = (cand.withColumn("score_q",
                           F.floor(score * 1_000_000).cast("long"))
           .where(F.col("score_q") >= int(accuracy * 1_000_000)))
    w = Window.partitionBy("word").orderBy(
        F.desc("score_q"), F.desc("df"), F.asc("term"))
    return (out.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k_per_word)
            .select("word", "term", "df", "dist", "score_q", "rank"))


def _fvh_fragments(matches: list[tuple[int, int]], frag_char_size: int,
                   margin: int) -> list[tuple[int, int, int]]:
    """BaseFragListBuilder.createFieldFragList
    (lucene/highlighter/src/java/org/apache/lucene/search/
    vectorhighlight/BaseFragListBuilder.java:47-98), single-field,
    boost-1 phrases: greedy chaining of offset-sorted phrase matches
    into fragments. Returns [(frag_start, frag_end, n_matches)].
    acceptPhrase (BaseFragListBuilder.java:112): multi-term phrases
    are discarded when matchLength > fragCharSize — callers pass
    single-phrase matches, where the reference accepts unless the
    match itself outgrows the fragment."""
    out = []
    i, n = 0, len(matches)
    start_offset = 0
    while i < n:
        ms, me = matches[i]
        if ms < start_offset:
            i += 1
            continue
        cur_start, cur_end = ms, me
        wpil = 1 if (me - ms) <= frag_char_size else 0
        i += 1
        span_start = max(cur_start - margin, start_offset)
        span_end = max(cur_end, span_start + frag_char_size)
        while i < n and matches[i][1] <= span_end:
            cur_end = matches[i][1]
            if (cur_end - cur_start) <= frag_char_size:
                wpil += 1
            i += 1
        if wpil == 0:
            continue
        match_len = cur_end - cur_start
        new_margin = max(0, (frag_char_size - match_len) // 2)
        span_start = max(cur_start - new_margin, start_offset)
        span_end = span_start + max(match_len, frag_char_size)
        start_offset = span_end
        out.append((span_start, span_end, wpil))
    return out


def fast_vector_highlight(index: IndexTables, docs_text: DataFrame,
                          phrase_terms: list[str],
                          frag_char_size: int = 100, margin: int = 6,
                          max_fragments: int = 3, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """FastVectorHighlighter (lucene/highlighter/src/java/org/apache/
    lucene/search/vectorhighlight/FastVectorHighlighter.java):
    FieldTermStack + FieldPhraseList build phrase matches from the
    INDEXED term-vector stream (positions + char offsets — no
    re-analysis); SimpleFragListBuilder (margin 6) chains them
    greedily into fragments (_fvh_fragments reproduces
    BaseFragListBuilder.createFieldFragList exactly, including the
    post-absorption re-centering); fragment totalBoost = sum of
    phrase boosts = match count for a boost-1 query
    (SimpleFieldFragList.java:44-50); ScoreOrderFragmentsBuilder
    returns the top ``max_fragments`` by totalBoost (offset asc tie
    pinned — the reference sort is stable on insertion order, which
    IS offset order). Returns (doc_id, frag_start, frag_end,
    n_matches, snippet, rank-per-doc).

    Scale: matches come from one exploded-postings self-join on
    (doc, adjacent positions) — the phrase machinery's plan; the
    greedy loop runs per doc over its own matches inside an
    Arrow-batched applyInPandas (O(matches per doc), no driver
    collect). Requires build_index(with_offsets=True)."""
    from pyspark.sql.types import (LongType, StructField, StructType)

    occ = (index.postings.where(F.col("term").isin(list(set(phrase_terms))))
           .select("docid", "term",
                   F.explode(F.arrays_zip("positions", "starts",
                                          "ends")).alias("o"))
           .select("docid", "term",
                   F.col("o.positions").alias("pos"),
                   F.col("o.starts").alias("st"),
                   F.col("o.ends").alias("en")))
    cur = (occ.where(F.col("term") == phrase_terms[0])
           .select("docid", "pos", F.col("st").alias("ms")))
    for t in phrase_terms[1:]:
        nxt = (occ.where(F.col("term") == t)
               .select("docid", F.col("pos").alias("npos"),
                       F.col("en").alias("ne")))
        cur = (cur.join(nxt, (cur.docid == nxt.docid)
                        & (nxt.npos == cur.pos + 1))
               .select(cur.docid, nxt.npos.alias("pos"), "ms",
                       F.col("ne").alias("me")))
    if len(phrase_terms) == 1:
        cur = cur.join(
            occ.where(F.col("term") == phrase_terms[0])
            .select("docid", "pos", F.col("en").alias("me")),
            ["docid", "pos"])
    matches = cur.select("docid", "ms", "me")

    schema = StructType([StructField("docid", LongType()),
                         StructField("frag_start", LongType()),
                         StructField("frag_end", LongType()),
                         StructField("n_matches", LongType())])

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ms", "me"])
        frags = _fvh_fragments(
            list(zip(pdf["ms"].tolist(), pdf["me"].tolist())),
            frag_char_size, margin)
        did = int(pdf["docid"].iloc[0])
        return pd.DataFrame(
            [(did, fs, fe, nm) for fs, fe, nm in frags],
            columns=["docid", "frag_start", "frag_end", "n_matches"])

    frags = matches.groupBy("docid").applyInPandas(per_doc, schema)
    w = Window.partitionBy("docid").orderBy(
        F.desc("n_matches"), F.asc("frag_start"))
    top = (frags.withColumn("rank", F.row_number().over(w).cast("long"))
           .where(F.col("rank") <= max_fragments))
    txt = docs_text.select(F.col(id_col).alias("docid"),
                           F.col(text_col).alias("_t"))
    return (top.join(txt, "docid")
            .select(F.col("docid").alias(id_col), "frag_start", "frag_end",
                    "n_matches",
                    F.substring(F.col("_t"),
                                (F.col("frag_start") + 1).cast("int"),
                                (F.col("frag_end")
                                 - F.col("frag_start")).cast("int"))
                    .alias("snippet"), "rank"))


def spellcheck_collate(index: IndexTables, words: list[str],
                       max_collations: int = 5,
                       k_sugg: int = 2) -> DataFrame:
    """SpellCheckCollator (solr/core/src/java/org/apache/solr/spelling/
    SpellCheckCollator.java:52-185): candidate collations substitute
    per-term suggestions into the query, each collation is re-executed
    and kept only if it yields hits. Combos come from the top
    ``k_sugg`` DirectSpellChecker suggestions per misspelled word
    (an in-dictionary word keeps itself at rank 0 — the reference only
    corrects misspelled terms); the PossibilityIterator order is
    pinned to (rank-sum asc, collation asc) for engine portability
    (the reference's iterator walks rank combinations in a comparable
    best-first order, SpellCheckCollator.java:89). Returns
    (collation, hits, rank) for collations with hits > 0, top
    ``max_collations``.

    Scale: the suggestion collect is O(words * k_sugg) — the same
    driver-side possibility enumeration the reference performs; hit
    verification for ALL combos runs as ONE Spark job (explode combo
    terms, semi-join postings, per-combo conjunction count), not one
    query per collation."""
    from itertools import product

    spark = index.term_stats.sparkSession
    in_dict = {r["term"] for r in index.term_stats
               .where(F.col("term").isin(words)).select("term").collect()}
    misspelled = [w_ for w_ in words if w_ not in in_dict]
    sugg_by: dict[str, list[tuple[str, int]]] = {w_: [] for w_ in misspelled}
    if misspelled:
        # ONE dictionary job for every misspelled word (direct_spellcheck
        # partitions its ranks per input word)
        for r in direct_spellcheck(index, misspelled,
                                   k_per_word=k_sugg).collect():
            sugg_by[r["word"]].append((r["term"], int(r["rank"])))
    cand: list[list[tuple[str, int]]] = []
    for w_ in words:
        if w_ in in_dict:
            cand.append([(w_, 0)])
            continue
        cand.append(sorted(sugg_by[w_], key=lambda x: x[1]))
    combos = []
    for cid, combo in enumerate(product(*cand)):
        terms = [t for t, _ in combo]
        combos.append((cid, " ".join(terms), sum(r for _, r in combo),
                       terms))
    if not combos:
        return spark.createDataFrame(
            [], "collation string, hits long, rank long")
    cdf = spark.createDataFrame(
        [(cid, coll, rs, t) for cid, coll, rs, terms in combos
         for t in sorted(set(terms))],
        "cid long, collation string, rank_sum long, term string")
    nterms = {cid: len(set(terms)) for cid, _, _, terms in combos}
    ndf = spark.createDataFrame(list(nterms.items()), "cid long, n int")
    docs_per = (F.broadcast(cdf)
                .join(index.postings.select("term", "docid").distinct(),
                      "term")
                .groupBy("cid", "collation", "rank_sum", "docid")
                .agg(F.count(F.lit(1)).alias("nt")))
    hits = (docs_per.join(F.broadcast(ndf), "cid")
            .where(F.col("nt") == F.col("n"))
            .groupBy("cid", "collation", "rank_sum")
            .agg(F.count(F.lit(1)).cast("long").alias("hits")))
    order = [F.asc("rank_sum"), F.asc("collation")]
    w = Window.orderBy(*order)
    return (hits.where(F.col("hits") > 0)
            .orderBy(*order).limit(max_collations)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .select("collation", "hits", "rank"))


def fuzzy_suggest(suggester: DataFrame, query: str, k: int = 10,
                  max_edits: int = 1, non_fuzzy_prefix: int = 1,
                  min_fuzzy_length: int = 3, exact_first: bool = True,
                  prefix_len: int = SUGGEST_PREFIX_LEN) -> DataFrame:
    """FuzzySuggester.lookup (lucene/suggest/src/java/org/apache/
    lucene/search/suggest/analyzing/FuzzySuggester.java: the analyzed
    query is expanded into a Levenshtein automaton —
    DEFAULT_MAX_EDITS=1, DEFAULT_TRANSPOSITIONS=true,
    DEFAULT_NON_FUZZY_PREFIX=1, DEFAULT_MIN_FUZZY_LENGTH=3 — and
    intersected with the completion FST). Re-expression: a completion
    key matches when SOME prefix of it (length within max_edits of the
    query's length) is within ``max_edits`` OSA distance of the
    analyzed query, with the first ``non_fuzzy_prefix`` characters
    matching exactly; queries shorter than ``min_fuzzy_length`` fall
    back to exact-prefix completion (the reference's behavior).
    Ranking inherits AnalyzingSuggester's (exact key first, weight
    desc, surface asc — the weight-ordered FST walk).

    Scale: the non-fuzzy prefix is a Column predicate — it prunes the
    pfx partition directories (first min(non_fuzzy_prefix, prefix_len)
    chars) and the row groups BEFORE the Arrow-batched prefix-OSA UDF
    sees a key."""
    from lucene_solr_spark.analysis.standard import analyze

    toks = [t for t, _ in analyze(query)]
    if not toks:
        spark = suggester.sparkSession
        return spark.createDataFrame(
            [], "surface string, weight long, rank long")
    qkey = SUGGEST_SEP.join(toks)
    if len(qkey) < min_fuzzy_length:
        return analyzing_suggest(suggester, query, k=k,
                                 exact_first=exact_first,
                                 prefix_len=prefix_len)

    from pyspark.sql.types import IntegerType

    lo = max(non_fuzzy_prefix, len(qkey) - max_edits)
    hi = len(qkey) + max_edits

    @F.pandas_udf(IntegerType())
    def _pref_osa(key: pd.Series) -> pd.Series:
        def best(s: str) -> int:
            return min((osa_distance(qkey, s[:L])
                        for L in range(lo, min(hi, len(s)) + 1)),
                       default=max_edits + 1)
        return pd.Series([best(x) for x in key], dtype="int32")

    cand = suggester
    npfx = qkey[:min(non_fuzzy_prefix, prefix_len)]
    if "pfx" in suggester.columns and npfx:
        cand = cand.where(F.col("pfx").startswith(npfx))
    cand = (cand.where(F.col("key").startswith(qkey[:non_fuzzy_prefix]))
            .where(F.length("key") >= lo)
            .withColumn("_d", _pref_osa("key"))
            .where(F.col("_d") <= max_edits))
    exact = (F.when(F.col("key") == qkey, F.lit(1)).otherwise(F.lit(0))
             if exact_first else F.lit(0))
    scored = cand.select("surface", F.col("weight").cast("long")
                         .alias("weight"), exact.alias("is_exact"))
    order = [F.desc("is_exact"), F.desc("weight"), F.asc("surface")]
    return (scored.orderBy(*order).limit(k)
            .withColumn("rank",
                        F.row_number().over(Window.orderBy(*order))
                        .cast("long"))
            .select("surface", "weight", "rank"))


def infix_suggest(suggester: DataFrame, query: str, k: int = 10,
                  all_terms_required: bool = True,
                  contexts: list[str] | None = None,
                  context_col: str = "contexts") -> DataFrame:
    """AnalyzingInfixSuggester.lookup (lucene/suggest/src/java/org/
    apache/lucene/search/suggest/analyzing/AnalyzingInfixSuggester
    .java:458-560): unlike the FST suggesters, matches are allowed on
    prefix matches to ANY token of the indexed entry — every analyzed
    query token except the last must appear as a whole token
    (allTermsRequired -> MUST), the last is a prefix against any
    token; results rank by weight desc (the suggester's sort field),
    surface asc pinned for ties. Operates on the same persisted
    completion table as analyzing_suggest (the entry tokens are the
    SEP-joined key) — pure Catalyst array predicates, no UDF.

    ``contexts``: the reference's context filtering
    (AnalyzingInfixSuggester.java:103-119,392 — entries carry a
    contexts set; a lookup with contexts keeps entries intersecting
    it). Applies only when the suggester frame has ``context_col``
    (an array column); entries with a NULL/empty set never match a
    contexted lookup, like the reference's BooleanQuery FILTER.

    Scale: the token predicates are Column expressions over the split
    key — one scan of the suggester table, TakeOrdered top-k; the
    reference builds a sidecar Lucene index for exactly this shape."""
    from lucene_solr_spark.analysis.standard import analyze

    toks = [t for t, _ in analyze(query)]
    if not toks:
        spark = suggester.sparkSession
        return spark.createDataFrame(
            [], "surface string, weight long, rank long")
    full, last = toks[:-1], toks[-1]
    tokens = F.split(F.col("key"), SUGGEST_SEP)
    cond = F.exists(tokens, lambda x: x.startswith(last))
    for t in full:
        c = F.array_contains(tokens, t)
        cond = (cond & c) if all_terms_required else (cond | c)
    if contexts:
        if context_col not in suggester.columns:
            raise ValueError(
                f"contexts given but suggester has no {context_col!r} "
                "column")
        cset = F.array(*[F.lit(c) for c in contexts])
        cond = cond & (F.size(F.array_intersect(
            F.coalesce(F.col(context_col), F.array()), cset)) > 0)
    order = [F.desc("weight"), F.asc("surface")]
    return (suggester.where(cond)
            .select("surface", F.col("weight").cast("long").alias("weight"))
            .orderBy(*order).limit(k)
            .withColumn("rank",
                        F.row_number().over(Window.orderBy(*order))
                        .cast("long")))


def elevate_query(hits: DataFrame, elevate_ids: list[int],
                  exclude_ids: list[int] | None = None, k: int = 10,
                  doc_col: str = "doc_id",
                  score_col: str = "score_q") -> DataFrame:
    """QueryElevationComponent (solr/core/src/java/org/apache/solr/
    handler/component/QueryElevationComponent.java + its
    ElevationComparatorSource): editorially elevated docs are pinned
    to the top IN THE CONFIGURED ORDER (even above higher-scoring
    organic hits — forceElevation), excluded docs are removed, and
    the remaining hits follow in (score desc, doc asc) order.
    Elevated docs need not match the query (the reference ORs the
    elevation ids into the query); absent ids simply rank by their
    configured position. Returns (doc_col, score_q, elevated, rank).

    Scale: the elevation set is a literal broadcast map folded into
    ONE sort key — no second pass, no driver-side reordering of the
    organic results."""
    exclude_ids = exclude_ids or []
    base = hits.where(~F.col(doc_col).isin(
        [int(x) for x in exclude_ids])) if exclude_ids else hits
    if elevate_ids:
        pos = F.create_map(*[x for i, d in enumerate(elevate_ids)
                             for x in (F.lit(int(d)), F.lit(i))])
        epos = pos[F.col(doc_col)]
        out = base.withColumn("elevated", epos.isNotNull())
        order = [F.desc("elevated"),
                 F.asc(F.coalesce(epos, F.lit(len(elevate_ids)))),
                 F.desc(score_col), F.asc(doc_col)]
    else:
        # exclusions-only elevation config: organic order, no pins
        out = base.withColumn("elevated", F.lit(False))
        order = [F.desc(score_col), F.asc(doc_col)]
    w = Window.orderBy(*order)
    return (out.orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .select(doc_col, score_col, "elevated", "rank"))


def fvh_highlight_tagged(index: IndexTables, docs_text: DataFrame,
                         phrase_terms: list[str],
                         frag_char_size: int = 100, margin: int = 6,
                         max_fragments: int = 3,
                         pre_tag: str = "<b>", post_tag: str = "</b>",
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """fast_vector_highlight with the BaseFragmentsBuilder output
    (vectorhighlight/BaseFragmentsBuilder.java makeFragment +
    SimpleHTMLFormatter's preTag/postTag): each phrase match inside a
    fragment is wrapped in pre/post tags, splices applied right-to-
    left so earlier offsets stay valid. Fragment selection is
    _fvh_fragments verbatim (same greedy chain as the oracled
    fvh_highlight); matches clipped to the fragment window like the
    reference's sub-info filtering. Returns (doc_id, frag_start,
    frag_end, n_matches, tagged, rank).

    Scale: the stored text rides the match frame into ONE
    applyInPandas pass (per-doc work is O(matches + fragment
    chars)); no second join, no driver-side string surgery."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    occ = (index.postings.where(F.col("term").isin(list(set(phrase_terms))))
           .select("docid", "term",
                   F.explode(F.arrays_zip("positions", "starts",
                                          "ends")).alias("o"))
           .select("docid", "term",
                   F.col("o.positions").alias("pos"),
                   F.col("o.starts").alias("st"),
                   F.col("o.ends").alias("en")))
    cur = (occ.where(F.col("term") == phrase_terms[0])
           .select("docid", "pos", F.col("st").alias("ms")))
    if len(phrase_terms) == 1:
        cur = cur.join(
            occ.where(F.col("term") == phrase_terms[0])
            .select("docid", "pos", F.col("en").alias("me")),
            ["docid", "pos"])
    else:
        for t in phrase_terms[1:]:
            nxt = (occ.where(F.col("term") == t)
                   .select("docid", F.col("pos").alias("npos"),
                           F.col("en").alias("ne")))
            cur = (cur.join(nxt, (cur.docid == nxt.docid)
                            & (nxt.npos == cur.pos + 1))
                   .select(cur.docid, nxt.npos.alias("pos"), "ms",
                           F.col("ne").alias("me")))
    txt = docs_text.select(F.col(id_col).alias("docid"),
                           F.col(text_col).alias("_t"))
    matches = cur.select("docid", "ms", "me").join(txt, "docid")

    schema = StructType([StructField("docid", LongType()),
                         StructField("frag_start", LongType()),
                         StructField("frag_end", LongType()),
                         StructField("n_matches", LongType()),
                         StructField("tagged", StringType())])

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ms", "me"])
        ms = list(zip(pdf["ms"].tolist(), pdf["me"].tolist()))
        text = pdf["_t"].iloc[0]
        did = int(pdf["docid"].iloc[0])
        rows = []
        for fs, fe, nm in _fvh_fragments(ms, frag_char_size, margin):
            snip = text[fs:fe]
            inside = [(a - fs, b - fs) for a, b in ms
                      if a >= fs and b <= min(fe, len(text))]
            for a, b in sorted(inside, reverse=True):
                snip = snip[:a] + pre_tag + snip[a:b] + post_tag + snip[b:]
            rows.append((did, fs, fe, nm, snip))
        return pd.DataFrame(rows, columns=["docid", "frag_start",
                                           "frag_end", "n_matches",
                                           "tagged"])

    frags = matches.groupBy("docid").applyInPandas(per_doc, schema)
    w = Window.partitionBy("docid").orderBy(
        F.desc("n_matches"), F.asc("frag_start"))
    return (frags.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= max_fragments)
            .select(F.col("docid").alias(id_col), "frag_start",
                    "frag_end", "n_matches", "tagged", "rank"))


def free_text_suggest(docs_text: DataFrame, prev: str, k: int = 10,
                      alpha: float = 0.4, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """FreeTextSuggester (lucene/suggest/src/java/org/apache/lucene/
    search/suggest/analyzing/FreeTextSuggester.java:83-133, grams=2):
    next-word prediction from an n-gram language model with STUPID
    BACKOFF (ALPHA = 0.4) — candidates seen after ``prev`` score
    count(prev, w) / count(prev, *); words never seen after ``prev``
    back off to ALPHA * count(w) / total_tokens. Ranked score desc,
    term asc, top-k. Tokenization is the corpus's whitespace stream
    (documented stand-in for the reference's ShingleFilter over the
    analyzer — this fixture's text is pre-normalized). Scores are
    quantized floor(x*1e6): both engines divide the same exact
    integers, so the doubles agree bit-for-bit.

    Scale: the model is TWO hash aggregates (bigram + unigram counts)
    over one tokenized scan; the lookup filters the bigram frame on
    the context (pushed predicate) and unions the backoff frame —
    at production scale the counts are built once and persisted, the
    lookup touches one context partition."""
    toks = F.split(F.col(text_col), " ")
    t = docs_text.select(
        F.posexplode(toks).alias("pos", "term"),
        F.col(id_col).alias("_d"))
    t = t.select("_d", "pos", "term")
    big = (t.alias("a")
           .join(t.alias("b"),
                 (F.col("a._d") == F.col("b._d"))
                 & (F.col("b.pos") == F.col("a.pos") + 1))
           .groupBy(F.col("a.term").alias("w1"),
                    F.col("b.term").alias("w2"))
           .agg(F.count(F.lit(1)).alias("c")))
    ctx = big.where(F.col("w1") == prev)
    ctx_n = ctx.agg(F.sum("c")).first()[0] or 0
    uni = t.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = t.count()
    hits = ctx.select(
        F.col("w2").alias("term"),
        F.floor(F.col("c").cast("double") / F.lit(float(ctx_n))
                * 1_000_000).cast("long").alias("score_q")) \
        if ctx_n else ctx.select(
            F.col("w2").alias("term"),
            F.lit(0).cast("long").alias("score_q")).where(F.lit(False))
    backoff = (uni.join(hits.select("term"), "term", "left_anti")
               .where(F.col("term") != prev)
               .select("term",
                       F.floor(F.lit(alpha) * F.col("c").cast("double")
                               / F.lit(float(total)) * 1_000_000)
                       .cast("long").alias("score_q")))
    out = hits.unionByName(backoff)
    order = [F.desc("score_q"), F.asc("term")]
    w = Window.orderBy(*order)
    return (out.orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long")))
