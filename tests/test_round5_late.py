"""Round-5 late additions: JoinUtil score modes (score_join),
WordBreakSpellChecker (word_break_suggest / word_combine_suggest),
grouped faceting (group_facet), DocValuesNumbersQuery plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.operators.facets import group_facet
from lucene_solr_spark.operators.relational import score_join
from lucene_solr_spark.operators.searchext import (
    word_break_suggest, word_combine_suggest)


@pytest.fixture(scope="module")
def combo_index(spark):
    rows = [
        (0, "data base database merge"),
        (1, "database data warehouse"),
        (2, "merge sort database"),
        (3, "base data sortmerge"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return build_index(docs, key_col="doc_id", text_col="text",
                       precomputed_docid="doc_id", analyzer="whitespace")


def test_word_combine_suggest(combo_index):
    out = word_combine_suggest(
        combo_index, ["data", "base", "merge", "sort", "merge"]).collect()
    # adjacent pairs: database (df 3), basemerge (absent), mergesort
    # (absent), sortmerge (df 1)
    got = [(r["pair_idx"], r["combined"], r["combined_df"], r["rank"])
           for r in out]
    assert got == [(0, "database", 3, 1), (3, "sortmerge", 1, 2)]


def test_word_break_suggest_rank_and_ties(combo_index):
    out = word_break_suggest(
        combo_index, ["databasemerge", "sortmerge", "zzz"], k=10).collect()
    rows = [(r["word"], r["split_pos"], r["left_term"], r["right_term"],
             r["max_freq"], r["rank"]) for r in out]
    # dictionary dfs: data=3, base=2, database=3, merge=2, sort=1,
    # sortmerge=1, warehouse=1
    # databasemerge: split 4 -> data+basemerge (no), split 8 ->
    #   database+merge (max 3)
    # sortmerge: split 4 -> sort+merge (max(1,2) = 2)
    assert rows == [
        ("databasemerge", 8, "database", "merge", 3, 1),
        ("sortmerge", 4, "sort", "merge", 2, 2),
    ]


def test_word_break_min_len_and_freq(combo_index):
    # min_break_len=5 kills sort+merge (4-char left); min freq 4 kills all
    out = word_break_suggest(combo_index, ["sortmerge"], min_break_len=5)
    assert out.count() == 0
    out2 = word_break_suggest(combo_index, ["databasemerge"],
                              min_suggestion_freq=4)
    assert out2.count() == 0


def test_score_join_modes(spark):
    from_scored = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 31), ("b", 100)],
        "k string, score_q long")
    to_df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, "c")], "doc_id long, k string")
    def got(mode):
        return [(r["doc_id"], r["score_q"], r["rank"])
                for r in score_join(from_scored, to_df, "k",
                                    mode=mode, k=10).collect()]
    assert got("max") == [(2, 100, 1), (1, 31, 2), (3, 31, 3)]
    assert got("min") == [(2, 100, 1), (1, 10, 2), (3, 10, 3)]
    assert got("total") == [(2, 100, 1), (1, 61, 2), (3, 61, 3)]
    # avg: floor(61/3) = 20
    assert got("avg") == [(2, 100, 1), (1, 20, 2), (3, 20, 3)]
    with pytest.raises(ValueError):
        score_join(from_scored, to_df, "k", mode="none")


def test_group_facet_counts_groups_once(spark):
    df = spark.createDataFrame(
        [("g1", "en"), ("g1", "en"), ("g1", "en"),
         ("g2", "en"), ("g2", "de"), ("g3", "de")],
        "grp string, lang string")
    out = [(r["value"], r["cnt"], r["rank"])
           for r in group_facet(df, "grp", "lang").collect()]
    # en: groups {g1, g2} -> 2 (NOT 4 docs); de: {g2, g3} -> 2; tie by value
    assert out == [("de", 2, 1), ("en", 2, 2)]


def test_seg_dv_numbers_source_free(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["seg_dv_numbers"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "docvalues" in plan
    assert "documents.parquet" not in plan
    assert df.count() > 0


def test_osa_distance_reference_cases():
    from lucene_solr_spark.operators.searchext import osa_distance

    # classic edits
    assert osa_distance("", "") == 0
    assert osa_distance("abc", "") == 3
    assert osa_distance("kitten", "sitting") == 3
    # adjacent transposition costs 1 (the d[i-2][j-2] recurrence)
    assert osa_distance("merge", "mereg") == 1
    assert osa_distance("ab", "ba") == 1
    # OSA, NOT full Damerau: a transposed pair can't be edited again
    assert osa_distance("ca", "abc") == 3  # full Damerau gives 2


def test_spellcheck_direct_oracle_assumption():
    """The spellcheck_direct oracle uses DuckDB damerau_levenshtein
    (full Damerau) while the engine scores OSA. Pin the assumption:
    the two agree on EVERY (query word, dictionary term) pair the
    driver query can reach at sf0.01."""
    import duckdb

    from lucene_solr_spark.driver_surface_ext import _DSC_WORDS
    from lucene_solr_spark.operators.searchext import osa_distance

    con = duckdb.connect()
    vocab = [r[0] for r in con.execute("""
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
                     FROM '/root/testdata/sf0.01/documents.parquet')
        SELECT DISTINCT term FROM tok""").fetchall()]
    for w_ in _DSC_WORDS:
        for t in vocab:
            dd = con.execute("SELECT damerau_levenshtein(?, ?)",
                             [w_, t]).fetchone()[0]
            assert dd == osa_distance(w_, t), (w_, t)


def test_direct_spellcheck_comparator(combo_index):
    from lucene_solr_spark.operators.searchext import direct_spellcheck

    # dictionary dfs: data=3, base=2, database=3, merge=2, sort=1,
    # sortmerge=1, warehouse=1
    out = direct_spellcheck(combo_index, ["dase"], k_per_word=5).collect()
    rows = [(r["term"], r["df"], r["dist"], r["score_q"], r["rank"])
            for r in out]
    # dase: data d=2 (score 0.5), base d=1 (score 0.75); accuracy keeps
    # both; base ranks first on score, data second
    assert rows == [("base", 2, 1, 750000, 1), ("data", 3, 2, 500000, 2)]
    # transposition scores as ONE edit: "mereg" -> merge dist 1
    out2 = direct_spellcheck(combo_index, ["mereg"]).collect()
    assert [(r["term"], r["dist"]) for r in out2] == [("merge", 1)]


def test_fvh_fragment_chaining_reference_cases():
    from lucene_solr_spark.operators.searchext import _fvh_fragments

    # single match, re-centered: matchLen 9, newMargin 45, clamp at 0
    assert _fvh_fragments([(10, 19)], 100, 6) == [(0, 100, 1)]
    # second match absorbed (59 <= provisional span end 104); third
    # starts a new fragment after frag1's end
    fr = _fvh_fragments([(10, 19), (50, 59), (150, 159)], 100, 6)
    # frag1: curEnd=59, matchLen=49, newMargin=25, fs=max(10-25,0)=0,
    # fe=0+100=100; frag2: trigger 150 >= 100, absorb none,
    # matchLen=9, newMargin=45, fs=max(150-45,100)=105, fe=205
    assert fr == [(0, 100, 2), (105, 205, 1)]
    # a match straddling the previous fragment border is DISCARDED
    fr2 = _fvh_fragments([(10, 19), (95, 104), (300, 309)], 100, 6)
    # frag1 = (0,100,1) [absorption while sees me=104 > 100? prov
    # span end = max(19, 4+100)=104 so (95,104) IS absorbed:
    # curEnd=104, matchLen=94, newMargin=3, fs=max(10-3,0)=7,
    # fe=7+100=107]; then (300,309) -> fs=max(300-45,107)=255, fe=355
    assert fr2 == [(7, 107, 2), (255, 355, 1)]
    # match wider than fragCharSize: still emitted (span grows), but
    # the phrase itself is discarded by acceptPhrase -> no fragment
    assert _fvh_fragments([(0, 150)], 100, 6) == []


def test_fvh_oracle_assumptions(spark):
    """The fvh_highlight oracle's set-based absorption equals the
    reference's sequential absorption only for uniform-width matches,
    and unrolls 3 fragments: pin both over sf0.01."""
    import duckdb
    con = duckdb.connect()
    rows = con.execute("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text,' ')) AS term,
               unnest(range(len(string_split(text,' ')))) AS pos
        FROM '/root/testdata/sf0.01/documents.parquet'),
      p1 AS (SELECT doc_id, pos FROM tok WHERE term='hash'),
      p2 AS (SELECT doc_id, pos FROM tok WHERE term='join')
      SELECT max(c) FROM (
        SELECT p1.doc_id, count(*) AS c FROM p1
        JOIN p2 ON p1.doc_id=p2.doc_id AND p2.pos=p1.pos+1
        GROUP BY p1.doc_id)""").fetchone()
    assert rows[0] <= 3  # <= 3 matches -> <= 3 fragments
    # uniform match width ('hash join' spans exactly 9 chars: the
    # oracle's trigger end is ts + 9 and its set-based absorption
    # equals sequential absorption only when ends are ordered like
    # starts)
    widths = con.execute("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text,' ')) AS term,
               unnest(range(len(string_split(text,' ')))) AS pos
        FROM '/root/testdata/sf0.01/documents.parquet')
      SELECT DISTINCT len(t1.term) + 1 + len(t2.term)
      FROM tok t1 JOIN tok t2
        ON t1.doc_id=t2.doc_id AND t2.pos=t1.pos+1
      WHERE t1.term='hash' AND t2.term='join'""").fetchall()
    assert widths == [(9,)]


def test_spellcheck_collate_semantics(combo_index):
    from lucene_solr_spark.operators.searchext import spellcheck_collate

    # 'datab' misspelled -> suggestions within 2 edits: data (d=1),
    # base? (d=3 no), database (d=3 no). 'merge' is in-dictionary ->
    # kept at rank 0. Collation 'data merge' hits docs containing
    # both: doc 0 only.
    out = [(r["collation"], r["hits"], r["rank"])
           for r in spellcheck_collate(combo_index,
                                       ["datab", "merge"]).collect()]
    assert out == [("data merge", 1, 1)]
    # zero-hit collations are dropped: no doc has both sort and
    # warehouse
    out2 = spellcheck_collate(combo_index, ["sorta", "warehouse"]).collect()
    # sorta -> sort (d=1); warehouse in dict; conjunction empty
    assert out2 == []


def test_span_payload_check(spark):
    from lucene_solr_spark.search import ast as A
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.solrq import solr_qparser

    rows = [
        (0, "data base database merge"),
        (1, "merge data base"),
        (2, "base data"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, key_col="doc_id", text_col="text",
                      precomputed_docid="doc_id", with_offsets=True)
    s = Searcher(idx, mode="sql")
    # offset payloads of doc0: data=0 base=5 database=10 merge=19;
    # doc1: merge=0 data=6 base=11; doc2: base=0 data=5
    got = sorted(r["docid"] for r in s.matches(
        A.SpanPayloadCheckQ(("data", "base"), (0, 5))).collect())
    assert got == [0]
    # the same phrase with doc1's payloads matches only doc1
    got2 = sorted(r["docid"] for r in s.matches(
        A.SpanPayloadCheckQ(("data", "base"), (6, 11))).collect())
    assert got2 == [1]
    # payload mismatch on the second slot -> no docs (phrase exists)
    assert s.matches(
        A.SpanPayloadCheckQ(("data", "base"), (0, 7))).count() == 0
    # single-term doc-start check through the dialect
    got3 = sorted(r["docid"] for r in solr_qparser(
        s, "{!payload_check f=text payloads='0'}merge").collect())
    assert got3 == [1]
    # length mismatch raises
    with pytest.raises(ValueError):
        s.matches(A.SpanPayloadCheckQ(("data", "base"), (0,)))


def test_fuzzy_suggest_semantics(spark):
    from lucene_solr_spark.operators.searchext import (
        build_analyzing_suggester, fuzzy_suggest)

    entries = spark.createDataFrame(
        [("customer data", 10), ("custom sort", 7), ("column scan", 5),
         ("cast rules", 3), ("dust filter", 9)],
        "surface string, weight long")
    sug = build_analyzing_suggester(entries)
    out = [(r["surface"], r["weight"], r["rank"])
           for r in fuzzy_suggest(sug, "custp", k=10).collect()]
    # qkey 'custp' (len 5): prefixes of length 4..6, first char 'c'
    # exact. 'customer data' key 'customer\x1fdata': L=4 'cust' d=1 ok;
    # 'custom sort': 'cust' d=1 ok; 'column scan': 'colu'/'colum'/
    # 'column' all d>1 -> out; 'cast rules': 'cast' d=2 -> out;
    # 'dust filter': first char 'd' -> pruned by nonFuzzyPrefix.
    assert out == [("customer data", 10, 1), ("custom sort", 7, 2)]
    # below minFuzzyLength -> exact-prefix fallback (no typo tolerated)
    out2 = fuzzy_suggest(sug, "cu", k=10).collect()
    assert {r["surface"] for r in out2} == {"customer data", "custom sort"}


def test_fuzzy_suggest_oracle_assumption():
    """suggest_fuzzy's oracle uses damerau_levenshtein; pin OSA ==
    Damerau over every ('custp', key-prefix) pair reachable at
    sf0.01."""
    import duckdb

    from lucene_solr_spark.operators.searchext import osa_distance

    con = duckdb.connect()
    pairs = con.execute("""
      WITH ent AS (
        SELECT substr(text, 1, 30) AS surface
        FROM '/root/testdata/sf0.01/documents.parquet'),
      keyed AS (
        SELECT DISTINCT array_to_string(
          list_filter(string_split(surface, ' '), x -> x <> ''),
          chr(31)) AS key
        FROM ent),
      pref AS (
        SELECT DISTINCT substr(key, 1, L::INT) AS p
        FROM keyed, range(4, 7) t(L)
        WHERE starts_with(key, 'c') AND L <= len(key))
      SELECT p, damerau_levenshtein('custp', p) FROM pref""").fetchall()
    assert pairs
    for p, dd in pairs:
        assert dd == osa_distance("custp", p), p


def test_infix_suggest_semantics(spark):
    from lucene_solr_spark.operators.searchext import (
        build_analyzing_suggester, infix_suggest)

    entries = spark.createDataFrame(
        [("big data customer file", 10), ("customer data", 8),
         ("data warehouse", 6), ("customs data", 4), ("custom data", 2)],
        "surface string, weight long")
    sug = build_analyzing_suggester(entries)
    out = [(r["surface"], r["weight"], r["rank"])
           for r in infix_suggest(sug, "data cust", k=10).collect()]
    # 'data' must be a WHOLE token; 'cust' prefix-matches ANY token
    # (infix position): all five entries contain token 'data'; the
    # cust-prefixed token exists in 1,2,4,5 but NOT 'data warehouse'
    assert out == [("big data customer file", 10, 1),
                   ("customer data", 8, 2), ("customs data", 4, 3),
                   ("custom data", 2, 4)]
    # whole-token requirement: 'warehouse dat' -> dat prefix ok, but
    # 'warehouse' whole-token only in 'data warehouse'
    out2 = infix_suggest(sug, "warehouse dat", k=10).collect()
    assert [r["surface"] for r in out2] == ["data warehouse"]


def test_round5_plan_hygiene(spark, tmp_path):
    """Scale hygiene of the late-wave operators: the cheap Column
    predicates must evaluate BELOW the Python/Arrow nodes (the
    automaton-intersection analogues), and the fuzzy lookup must keep
    the pfx partition pruning."""
    from lucene_solr_spark.operators.searchext import (
        build_analyzing_suggester, direct_spellcheck, fuzzy_suggest,
        load_suggester, write_suggester)

    rows = [(i, f"word{i} data base merge") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, key_col="doc_id", text_col="text",
                      precomputed_docid="doc_id", analyzer="whitespace")

    # direct_spellcheck: the length-window filter is a plain Filter
    # BELOW ArrowEvalPython (tree dump prints children after parents,
    # so the filter text must appear AFTER the Arrow node)
    plan = (direct_spellcheck(idx, ["dase"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan
    a = plan.index("ArrowEvalPython")
    f = plan.index("abs((length(term")
    assert f > a, "length window must sit below the OSA UDF"

    # fuzzy_suggest on the persisted layout: pfx pruning present and
    # below the UDF
    entries = spark.createDataFrame(
        [("customer data", 10), ("dust filter", 9)],
        "surface string, weight long")
    path = str(tmp_path / "sug")
    write_suggester(build_analyzing_suggester(entries), path)
    sug = load_suggester(spark, path)
    plan2 = (fuzzy_suggest(sug, "custp")
             ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan2
    assert "pfx" in plan2  # partition-column predicate survives
    a2 = plan2.index("ArrowEvalPython")
    f2 = plan2.index("StartsWith(key")
    assert f2 > a2, "non-fuzzy prefix must sit below the OSA UDF"


def test_stratified_sample_and_packing(spark):
    from lucene_solr_spark.operators.sampling import (
        pack_sequences, stratified_sample)

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(20)],
        "id long, grp string")
    out = stratified_sample(df, "grp", 3, "id")
    rows = out.collect()
    assert len(rows) == 6
    by = {}
    for r in rows:
        by.setdefault(r["grp"], []).append(r["rank"])
    assert sorted(by["a"]) == [1, 2, 3] and sorted(by["b"]) == [1, 2, 3]
    # repartitioning the input does not change the sample
    again = {(r["id"], r["rank"]) for r in stratified_sample(
        df.repartition(13), "grp", 3, "id").collect()}
    assert again == {(r["id"], r["rank"]) for r in rows}

    toks = spark.createDataFrame(
        [(1, "x", 100), (2, "x", 100), (3, "x", 100), (4, "x", 100),
         (5, "y", 250)],
        "id long, part string, toks long")
    p = {r["id"]: (r["cum_before"], r["pack_id"], r["pack_pos"])
         for r in pack_sequences(toks, "part", "id", "toks",
                                 budget=250).collect()}
    # x: cum_before 0,100,200,300 -> packs 0,0,0,1; positions 1,2,3,1
    assert p[1] == (0, 0, 1) and p[2] == (100, 0, 2)
    assert p[3] == (200, 0, 3) and p[4] == (300, 1, 1)
    # y packs independently
    assert p[5] == (0, 0, 1)


def test_dataset_split_properties(spark):
    from lucene_solr_spark.operators.sampling import dataset_split

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    out = dataset_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    # exhaustive + disjoint (one split per row)
    assert len(rows) == 500
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # parallelism-invariant assignment
    again = {(r["id"], r["split"]) for r in dataset_split(
        df.repartition(17), "id",
        {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert again == {(r["id"], r["split"]) for r in rows}
    with pytest.raises(ValueError):
        dataset_split(df, "id", {"train": 0.5, "val": 0.1})


def test_index_splitter(spark, pages_tiny, tmp_path_factory):
    """IndexSplitter (misc/index/IndexSplitter.java): whole segments
    carved into a standalone index; docids never remap; search over
    the split == search over the whole filtered to those segments'
    docid ranges."""
    from lucene_solr_spark.index.replicator import split_index
    from lucene_solr_spark.index.segments import (SegmentIndex,
                                                  build_segment_index)
    from lucene_solr_spark.search.wand import WandSearcher

    base = tmp_path_factory.mktemp("split")
    src = build_segment_index(pages_tiny, str(base / "src"),
                              seg_size=128, salt_span=32)
    live = src.live_segments()
    assert len(live) >= 2
    take = live[::2]
    out = split_index(src, str(base / "dst"), take)
    assert out["segments"] == sorted(take)

    dst = SegmentIndex(path=str(base / "dst"), spark=spark)
    assert dst.live_segments() == sorted(take)
    # docids in the split are exactly the source's docids for those
    # segments (no remap)
    src_docs = {r["docid"] for r in src.docs.where(
        F.col("seg_id").isin(take)).select("docid").collect()}
    dst_docs = {r["docid"] for r in dst.docs.select("docid").collect()}
    assert dst_docs == src_docs

    # a term search over the split equals the whole-index MATCH SET
    # restricted to the split's docids (scores differ: per-split df/N)
    full = WandSearcher(src)
    part = WandSearcher(dst)
    want = {r["docid"] for r in full.search("t000010", k=1000).collect()
            if r["docid"] in dst_docs}
    got = {r["docid"] for r in part.search("t000010", k=1000).collect()}
    assert got == want

    # segments not live in the source are rejected
    with pytest.raises(ValueError):
        split_index(src, str(base / "dst2"), [max(live) + 99])


def test_score_join_broadcasts_value_dim(spark):
    from lucene_solr_spark.operators.relational import score_join

    from_scored = spark.createDataFrame(
        [("a", 10)] * 5 + [("b", 7)] * 3, "k string, score_q long")
    to_df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)],
        "doc_id long, k string")
    plan = (score_join(from_scored, to_df, "k", mode="max")
            ._jdf.queryExecution().executedPlan().toString())
    # the aggregated join-value dim is broadcast (the in-memory value
    # map of TermsIncludingScoreQuery), not shuffled
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    plan2 = (score_join(from_scored, to_df, "k", mode="max",
                        broadcast_values=False)
             ._jdf.queryExecution().executedPlan().toString())
    assert plan2  # shuffle fallback still plans


def test_review_fix_regressions(spark, combo_index):
    """Round-5 code-review fixes: empty-elevation config, overflowing
    dataset_split cuts, interval_facet on empty input, and the
    one-job spellcheck_collate suggestion phase."""
    from lucene_solr_spark.operators.facets import interval_facet
    from lucene_solr_spark.operators.sampling import dataset_split
    from lucene_solr_spark.operators.searchext import (
        elevate_query, spellcheck_collate)

    # exclusions-only elevation (no pins) must not crash and keeps
    # organic order
    hits = spark.createDataFrame(
        [(1, 90), (2, 80), (3, 70)], "doc_id long, score_q long")
    out = [(r["doc_id"], r["elevated"], r["rank"])
           for r in elevate_query(hits, [], exclude_ids=[2]).collect()]
    assert out == [(1, False, 1), (3, False, 2)]

    # a split whose cumulative fraction hits 1.0 before the last name:
    # the declared-0.0 split receives NOTHING
    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    got = {r["split"] for r in dataset_split(
        df, "id", {"train": 0.5, "val": 0.5, "test": 0.0}).collect()}
    assert "test" not in got and got == {"train", "val"}

    # empty input -> 0 counts, never null
    empty = spark.createDataFrame([], "n long")
    rows = interval_facet(empty, "n", ["[0,10)", "(5,*]"]).collect()
    assert [(r["ival"], r["cnt"]) for r in rows] == [
        ("[0,10)", 0), ("(5,*]", 0)]

    # collate still correct after the single-job suggestion phase
    out2 = [(r["collation"], r["hits"], r["rank"])
            for r in spellcheck_collate(combo_index,
                                        ["datab", "merge"]).collect()]
    assert out2 == [("data merge", 1, 1)]


def test_fvh_tagged_snippets(spark):
    from lucene_solr_spark.operators.searchext import fvh_highlight_tagged

    rows = [(0, "aa bb hash join cc dd hash join ee"),
            (1, "no match here at all")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, key_col="doc_id", text_col="text",
                      precomputed_docid="doc_id", with_offsets=True)
    out = fvh_highlight_tagged(idx, docs, ["hash", "join"],
                               frag_char_size=40, margin=6,
                               pre_tag="<b>", post_tag="</b>").collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 0 and r["n_matches"] == 2
    # both matches wrapped, right-to-left splices keep offsets valid
    assert r["tagged"].count("<b>hash join</b>") == 2
    # tag-free content equals the raw fragment slice
    plain = r["tagged"].replace("<b>", "").replace("</b>", "")
    assert plain == rows[0][1][r["frag_start"]:r["frag_end"]]


def test_direct_spellcheck_suggest_modes(combo_index):
    from lucene_solr_spark.operators.searchext import direct_spellcheck

    # 'merge' IS in the dictionary: when_not_in_index drops it,
    # 'mergee' still gets suggestions
    out = direct_spellcheck(combo_index, ["merge", "mergee"],
                            suggest_mode="when_not_in_index").collect()
    assert {r["word"] for r in out} == {"mergee"}
    # more_popular: candidates need df > the word's own df
    spark = combo_index.term_stats.sparkSession
    docs = spark.createDataFrame(
        [(0, "card cart"), (1, "card"), (2, "card")],
        "doc_id long, text string")
    idx2 = build_index(docs, key_col="doc_id", text_col="text",
                       precomputed_docid="doc_id", analyzer="whitespace")
    # cart (df 1): card (d=1, df 3 > 1) survives
    out2 = direct_spellcheck(idx2, ["cart"],
                             suggest_mode="more_popular").collect()
    assert [(r["term"], r["df"]) for r in out2] == [("card", 3)]
    # card (df 3): cart (df 1) is NOT more popular -> empty
    assert direct_spellcheck(idx2, ["card"],
                             suggest_mode="more_popular").count() == 0
    with pytest.raises(ValueError):
        direct_spellcheck(combo_index, ["x"], suggest_mode="bogus")


def test_word_break_summed_freq_sort(combo_index):
    from lucene_solr_spark.operators.searchext import word_break_suggest

    out = word_break_suggest(combo_index, ["databasemerge", "sortmerge"],
                             sort_method="sum_freq").collect()
    rows = [(r["word"], r["max_freq"]) for r in out]
    # summed: database+merge = 3+2 = 5; sort+merge = 1+2 = 3
    assert rows == [("databasemerge", 5), ("sortmerge", 3)]


def test_drill_sideways_semantics(spark):
    from lucene_solr_spark.operators.facets import drill_sideways

    rows = [("en", "a"), ("en", "a"), ("en", "b"),
            ("de", "a"), ("de", "b"), ("fr", "b")]
    df = spark.createDataFrame(rows, "lang string, src string")
    out = drill_sideways(df, None, {"lang": "en", "src": "a"})
    got = {(r["dim"], r["value"]): r["cnt"] for r in out.collect()}
    # lang sideways: src='a' applied, lang filter DROPPED ->
    # en:2, de:1 ; src sideways: lang='en' applied -> a:2, b:1
    assert got == {("lang", "en"): 2, ("lang", "de"): 1,
                   ("src", "a"): 2, ("src", "b"): 1}
    # with a base condition on top
    out2 = drill_sideways(df, F.col("lang") != "fr", {"src": "b"})
    got2 = {(r["dim"], r["value"]): r["cnt"] for r in out2.collect()}
    # single dim: its own filter dropped, base still applied
    assert got2 == {("src", "a"): 3, ("src", "b"): 2}


def test_word_combine_suggest_modes(combo_index):
    from lucene_solr_spark.operators.searchext import word_combine_suggest

    # dict dfs: data=3, base=2, database=3, sortmerge=1, sort=1, merge=2
    # when_not_in_index: both 'data' and 'base' ARE in the dictionary
    # (min df > 0) -> the pair is skipped entirely
    out = word_combine_suggest(combo_index, ["data", "base"],
                               suggest_mode="when_not_in_index")
    assert out.count() == 0
    # a pair with an absent member passes the gate
    out2 = word_combine_suggest(combo_index, ["data", "basezz"],
                                suggest_mode="when_not_in_index")
    assert out2.count() == 0  # 'databasezz' not a dict term either
    # more_popular: database df 3 >= max(data 3, base 2) -> kept;
    # sortmerge df 1 < max(sort 1, merge 2) = 2 -> dropped
    out3 = [(r["combined"],)
            for r in word_combine_suggest(
                combo_index, ["data", "base", "sort", "merge"],
                suggest_mode="more_popular").collect()]
    assert out3 == [("database",)]
    with pytest.raises(ValueError):
        word_combine_suggest(combo_index, ["a", "b"], suggest_mode="x")


def test_infix_suggest_contexts(spark):
    from lucene_solr_spark.operators.searchext import (
        build_analyzing_suggester, infix_suggest)

    entries = spark.createDataFrame(
        [("customer data", 10), ("customer file", 8)],
        "surface string, weight long")
    sug = build_analyzing_suggester(entries)
    ctx = spark.createDataFrame(
        [("customer data", ["en"]), ("customer file", ["de"])],
        "surface string, contexts array<string>")
    sug_ctx = sug.join(ctx, "surface")
    got = [r["surface"] for r in infix_suggest(
        sug_ctx, "cust", contexts=["en"]).collect()]
    assert got == ["customer data"]
    # no contexts -> both
    got2 = {r["surface"] for r in infix_suggest(sug_ctx, "cust").collect()}
    assert got2 == {"customer data", "customer file"}
    with pytest.raises(ValueError):
        infix_suggest(sug, "cust", contexts=["en"])  # no contexts col


def test_free_text_suggest_backoff(spark):
    from lucene_solr_spark.operators.searchext import free_text_suggest

    docs = spark.createDataFrame(
        [(0, "a b a c"), (1, "a b d")], "doc_id long, text string")
    out = {r["term"]: (r["score_q"], r["rank"])
           for r in free_text_suggest(docs, "a", k=10).collect()}
    # bigrams after 'a': b (2), c (1); ctx total 3
    # direct: b = floor(2/3 * 1e6) = 666666 ; c = floor(1/3*1e6) = 333333
    assert out["b"] == (666666, 1)
    assert out["c"] == (333333, 2)
    # backoff for d (count 1, total tokens 7): floor(0.4 * 1/7 * 1e6)
    assert out["d"] == (57142, 3)
    # the context word itself only via backoff? 'a' excluded from
    # backoff; 'a' never follows 'a' directly -> absent
    assert "a" not in out


def test_path_facet_ancestor_rollup(spark):
    from lucene_solr_spark.operators.facets import path_facet

    df = spark.createDataFrame(
        [("a/b/c",), ("a/b",), ("a/x",), ("d",)], "cat string")
    got = {(r["level"], r["path"]): (r["cnt"], r["rank"])
           for r in path_facet(df, "cat").collect()}
    # level 1: a counts 3 (all its descendants), d counts 1
    assert got[(1, "a")] == (3, 1) and got[(1, "d")] == (1, 2)
    # level 2: a/b counts 2 (itself + a/b/c), a/x counts 1
    assert got[(2, "a/b")] == (2, 1) and got[(2, "a/x")] == (1, 2)
    assert got[(3, "a/b/c")] == (1, 1)
    assert len(got) == 5


def test_mlt_full_param_gates(combo_index):
    from lucene_solr_spark.operators.searchext import more_like_this_terms

    # doc 0 terms: data, base, database, merge (tf 1 each)
    base = {r["term"] for r in more_like_this_terms(
        combo_index, 0, min_df=1).collect()}
    assert base == {"data", "base", "database", "merge"}
    # word-length gates
    got = {r["term"] for r in more_like_this_terms(
        combo_index, 0, min_df=1, min_word_len=5).collect()}
    assert got == {"database", "merge"}
    got2 = {r["term"] for r in more_like_this_terms(
        combo_index, 0, min_df=1, max_word_len=4).collect()}
    assert got2 == {"data", "base"}
    # stopword + min tf gates
    got3 = {r["term"] for r in more_like_this_terms(
        combo_index, 0, min_df=1, stop_words={"merge"}).collect()}
    assert "merge" not in got3
    assert more_like_this_terms(
        combo_index, 0, min_df=1, min_term_freq=2).count() == 0


def test_check_flat_index(combo_index):
    from lucene_solr_spark.index.checkindex import check_flat_index

    rep = check_flat_index(combo_index)
    assert rep["clean"] and rep["docs"] == 4
    assert rep["bad_term_stats"] == 0 and rep["bad_doclens"] == 0


def test_sampled_facet(spark):
    from lucene_solr_spark.operators.facets import sampled_facet

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(3000)],
        "id long, lang string")
    out = {r["value"]: (r["est"], r["sampled"])
           for r in sampled_facet(df, "lang", "id", rate=0.25).collect()}
    # deterministic sample; estimates land near the true counts
    # (en 2000, de 1000) and est = floor(sampled/rate) exactly
    assert set(out) == {"en", "de"}
    for v, (est, sampled) in out.items():
        assert est == int(sampled / 0.25)
    assert abs(out["en"][0] - 2000) < 300
    assert abs(out["de"][0] - 1000) < 300
    # parallelism-invariant
    again = {r["value"]: (r["est"], r["sampled"])
             for r in sampled_facet(df.repartition(11), "lang", "id",
                                    rate=0.25).collect()}
    assert again == out
