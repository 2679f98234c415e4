"""The driver-facing query surface: queries() + oracle_sql().

Every implemented operator from SURVEY §2 gets a named query here and
an equivalent ANSI-SQL oracle string for DuckDB. The correctness
harness compares row counts, schemas and order-insensitive value
hashes, so every query follows the determinism contract:

- integer or string outputs wherever possible;
- floats only when derived from exact integer inputs by a fixed
  expression (single division, sqrt) — bit-identical across engines;
- BM25/cosine scores quantized to floor(score * 1e6) BIGINT —
  absorbs sub-ulp libm differences (JVM Math.log vs DuckDB ln differ
  in the last ulp ~8% of the time; measured, see git history);
- ranks from row_number() with fully deterministic tie-breaks,
  computed over the quantized scores;
- money aggregated in integer cents (`round(x*100)::BIGINT`) so sums
  are exact and partition-order independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_solr_spark.analysis.standard import ENGLISH_STOP_WORDS
from lucene_solr_spark.index.builder import IndexTables, build_index
from lucene_solr_spark.operators import dedup as D
from lucene_solr_spark.operators import facets as FC
from lucene_solr_spark.operators import relational as R
from lucene_solr_spark.operators import similarity as SIM
from lucene_solr_spark.operators import textstats as TS
from lucene_solr_spark.search import ast as A
from lucene_solr_spark.search.executor import Searcher

# --------------------------------------------------------------------------
# shared SQL fragments
# --------------------------------------------------------------------------

_STOP_SQL = "(" + ",".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS)) + ")"

# Fulltext base CTEs over the documents table: tokenize (whitespace —
# the documents fixture is pure lowercase words), stop-filter with
# position holes, postings, doc lengths, collection/term stats.
FT_BASE = f"""
tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
tokf AS (SELECT doc_id, term, pos FROM tok WHERE term NOT IN {_STOP_SQL}),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tokf GROUP BY doc_id, term
),
doclen AS (
  SELECT d.doc_id, coalesce(c.cnt, 0)::BIGINT AS doclen
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS cnt FROM tokf GROUP BY doc_id) c
    ON d.doc_id = c.doc_id
),
cstats AS (SELECT count(*)::DOUBLE AS n, sum(doclen)::DOUBLE AS sttf FROM doclen),
tstats AS (SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY term)
"""

# per-(doc,term) BM25 score in double precision — mirrors
# Searcher(mode='sql') exactly: idf * (k1+1) * tf / (tf + k1*(1-b+b*dl/avgdl))
_BM25_S = ("ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf"
           " / (p.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (cs.sttf / cs.n)))")


def _ft_scored(terms: list[str]) -> str:
    tlist = ",".join(f"'{t}'" for t in terms)
    return f"""
scored AS (
  SELECT p.doc_id, p.term, {_BM25_S} AS s
  FROM postings p
  JOIN tstats ts USING (term)
  JOIN doclen dl USING (doc_id)
  CROSS JOIN cstats cs
  WHERE p.term IN ({tlist})
)"""


def _topk_sql(inner: str, k: int, offset: int = 0) -> str:
    """rank over (score_q desc, doc_id) + top-k window."""
    return f"""
SELECT doc_id, score_q, rank FROM (
  SELECT doc_id, score_q,
         row_number() OVER (ORDER BY score_q DESC, doc_id) AS rank
  FROM ({inner})
) WHERE rank > {offset} AND rank <= {offset + k}
"""


_CENTS = "CAST(round({col} * 100) AS BIGINT)"


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# --------------------------------------------------------------------------
# index cache (per sf_dir)
# --------------------------------------------------------------------------

_INDEX_CACHE: dict[str, IndexTables] = {}


def _docs_index(spark: SparkSession, sf_dir: str) -> IndexTables:
    if sf_dir not in _INDEX_CACHE:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx = build_index(docs, key_col="doc_id", text_col="text",
                          precomputed_docid="doc_id").cache()
        idx.docs.count()  # materialize
        _INDEX_CACHE[sf_dir] = idx
    return _INDEX_CACHE[sf_dir]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ranked_quantized(searcher: Searcher, q: A.Query, k: int,
                      offset: int = 0) -> DataFrame:
    out = searcher.search_quantized(q, k=offset + k)
    if offset:
        out = out.where(F.col("rank") > offset)
    return out.select("doc_id", "score_q", F.col("rank").cast("long").alias("rank"))


# --------------------------------------------------------------------------
# the query registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, fn: Callable[[SparkSession, str], DataFrame],
              sql: str | None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


# ---- fulltext: term / boolean / phrase matching (SURVEY §2.2-§2.3) -------

def _ft_term(spark, sf):
    idx = _docs_index(spark, sf)
    return idx.postings.where(F.col("term") == "merge").select(
        F.col("docid").alias("doc_id"), F.col("tf").cast("long").alias("tf"))


_register("ft_term", _ft_term, f"""
WITH {FT_BASE}
SELECT doc_id, tf FROM postings WHERE term = 'merge'
""")


def _ft_bool_and(spark, sf):
    idx = _docs_index(spark, sf)
    a = idx.postings.where(F.col("term") == "hash").select(
        "docid", F.col("tf").cast("long").alias("tf_hash"))
    b = idx.postings.where(F.col("term") == "join").select(
        "docid", F.col("tf").cast("long").alias("tf_join"))
    return R.inner_join_stream(a, b, ["docid"]).select(
        F.col("docid").alias("doc_id"), "tf_hash", "tf_join")


_register("ft_bool_and", _ft_bool_and, f"""
WITH {FT_BASE}
SELECT a.doc_id, a.tf AS tf_hash, b.tf AS tf_join
FROM (SELECT doc_id, tf FROM postings WHERE term='hash') a
JOIN (SELECT doc_id, tf FROM postings WHERE term='join') b USING (doc_id)
""")


def _ft_bool_or_msm(spark, sf):
    idx = _docs_index(spark, sf)
    u = idx.postings.where(F.col("term").isin(["scan", "slow", "merge"]))
    return (u.groupBy("docid").agg(F.count(F.lit(1)).alias("matched"))
            .where(F.col("matched") >= 2)
            .select(F.col("docid").alias("doc_id"), "matched"))


_register("ft_bool_or_msm", _ft_bool_or_msm, f"""
WITH {FT_BASE}
SELECT doc_id, count(*)::BIGINT AS matched
FROM postings WHERE term IN ('scan','slow','merge')
GROUP BY doc_id HAVING count(*) >= 2
""")


def _ft_bool_not(spark, sf):
    idx = _docs_index(spark, sf)
    pos = idx.postings.where(F.col("term") == "scan").select(
        "docid", F.col("tf").cast("long").alias("tf"))
    neg = idx.postings.where(F.col("term") == "slow").select("docid")
    return R.complement_stream(pos, neg, ["docid"]).select(
        F.col("docid").alias("doc_id"), "tf")


_register("ft_bool_not", _ft_bool_not, f"""
WITH {FT_BASE}
SELECT doc_id, tf FROM postings WHERE term='scan'
AND doc_id NOT IN (SELECT doc_id FROM postings WHERE term='slow')
""")


def _ft_phrase(spark, sf):
    idx = _docs_index(spark, sf)
    s = Searcher(idx, mode="sql")
    # reuse the phrase evaluator's first phase via matches on a
    # PhraseQ, but return the integer pfreq: recompute via positions
    p1 = idx.postings.where(F.col("term") == "hash").select(
        "docid", F.explode("positions").alias("pos"))
    p2 = idx.postings.where(F.col("term") == "join").select(
        "docid", F.explode("positions").alias("pos2"))
    del s
    return (p1.join(p2, (p1.docid == p2.docid) & (p2.pos2 == p1.pos + 1))
            .groupBy(p1.docid)
            .agg(F.count(F.lit(1)).alias("pfreq"))
            .select(F.col("docid").alias("doc_id"), "pfreq"))


_register("ft_phrase", _ft_phrase, f"""
WITH {FT_BASE}
SELECT p1.doc_id, count(*)::BIGINT AS pfreq
FROM (SELECT doc_id, pos FROM tokf WHERE term='hash') p1
JOIN (SELECT doc_id, pos FROM tokf WHERE term='join') p2
  ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
GROUP BY p1.doc_id
""")


# ---- fulltext: BM25 ranked top-k (SURVEY §2.6, §2.10) ---------------------

def _ft_bm25_single(spark, sf):
    return _ranked_quantized(Searcher(_docs_index(spark, sf), mode="sql"),
                             A.TermQ("merge"), k=10)


_register("ft_bm25_single", _ft_bm25_single, f"""
WITH {FT_BASE}, {_ft_scored(['merge'])},
agg AS (SELECT doc_id, CAST(floor(s * 1000000) AS BIGINT) AS score_q FROM scored)
{_topk_sql("SELECT * FROM agg", 10)}
""")


def _ft_bm25_and(spark, sf):
    return _ranked_quantized(Searcher(_docs_index(spark, sf), mode="sql"),
                             A.AndQ((A.TermQ("hash"), A.TermQ("join"))), k=10)


_register("ft_bm25_and", _ft_bm25_and, f"""
WITH {FT_BASE}, {_ft_scored(['hash', 'join'])},
agg AS (
  SELECT doc_id, CAST(floor(sum(s) * 1000000) AS BIGINT) AS score_q
  FROM scored GROUP BY doc_id HAVING count(*) = 2
)
{_topk_sql("SELECT * FROM agg", 10)}
""")


def _ft_bm25_or(spark, sf):
    q = A.OrQ((A.TermQ("scan"), A.TermQ("slow"), A.TermQ("merge")))
    return _ranked_quantized(Searcher(_docs_index(spark, sf), mode="sql"), q, k=10)


_register("ft_bm25_or", _ft_bm25_or, f"""
WITH {FT_BASE}, {_ft_scored(['scan', 'slow', 'merge'])},
agg AS (
  SELECT doc_id, CAST(floor(sum(s) * 1000000) AS BIGINT) AS score_q
  FROM scored GROUP BY doc_id
)
{_topk_sql("SELECT * FROM agg", 10)}
""")


def _ft_bm25_phrase(spark, sf):
    idx = _docs_index(spark, sf)
    s = Searcher(idx, mode="sql")
    m = s.matches(A.PhraseQ(("hash", "join")))
    m = m.withColumn("score_q", F.floor(F.col("score") * 1_000_000).cast("long"))
    top = m.orderBy(F.desc("score_q"), F.asc("docid")).limit(10)
    w = Window.orderBy(F.desc("score_q"), F.asc("docid"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("docid").alias("doc_id"), "score_q", "rank")


_register("ft_bm25_phrase", _ft_bm25_phrase, f"""
WITH {FT_BASE},
ph AS (
  SELECT p1.doc_id, count(*)::BIGINT AS pfreq
  FROM (SELECT doc_id, pos FROM tokf WHERE term='hash') p1
  JOIN (SELECT doc_id, pos FROM tokf WHERE term='join') p2
    ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
  GROUP BY p1.doc_id
),
idfs AS (
  SELECT (SELECT ln(1+(cs.n - ts.df + 0.5)/(ts.df + 0.5)) FROM tstats ts, cstats cs WHERE ts.term='hash')
       + (SELECT ln(1+(cs.n - ts.df + 0.5)/(ts.df + 0.5)) FROM tstats ts, cstats cs WHERE ts.term='join')
       AS idf_sum
),
agg AS (
  SELECT ph.doc_id,
         CAST(floor((i.idf_sum * 2.2) * ph.pfreq
              / (ph.pfreq + 1.2 * (0.25 + 0.75 * dl.doclen / (cs.sttf / cs.n)))
              * 1000000) AS BIGINT) AS score_q
  FROM ph JOIN doclen dl USING (doc_id) CROSS JOIN cstats cs CROSS JOIN idfs i
)
{_topk_sql("SELECT * FROM agg", 10)}
""")


def _ft_searchafter(spark, sf):
    # deep paging: ranks 11..20 of the single-term query (searchAfter
    # cursor semantics, search/IndexSearcher.java:411-441)
    return _ranked_quantized(Searcher(_docs_index(spark, sf), mode="sql"),
                             A.TermQ("merge"), k=10, offset=10)


_register("ft_searchafter", _ft_searchafter, f"""
WITH {FT_BASE}, {_ft_scored(['merge'])},
agg AS (SELECT doc_id, CAST(floor(s * 1000000) AS BIGINT) AS score_q FROM scored)
{_topk_sql("SELECT * FROM agg", 10, offset=10)}
""")


# ---- fulltext: multi-term expansion queries (SURVEY §2.2) ------------------

def _multiterm_docids(spark, sf, node) -> DataFrame:
    idx = _docs_index(spark, sf)
    s = Searcher(idx, mode="sql")
    return s.matches(node).select(F.col("docid").alias("doc_id"))


_register(
    "ft_prefix",
    lambda spark, sf: _multiterm_docids(spark, sf, A.PrefixQ("s")),
    f"""
WITH {FT_BASE}
SELECT DISTINCT doc_id FROM postings WHERE term LIKE 's%'
""")

_register(
    "ft_wildcard",
    lambda spark, sf: _multiterm_docids(spark, sf, A.WildcardQ("*a*")),
    f"""
WITH {FT_BASE}
SELECT DISTINCT doc_id FROM postings WHERE term LIKE '%a%'
""")

_register(
    "ft_regexp",
    lambda spark, sf: _multiterm_docids(spark, sf, A.RegexpQ("(scan|sort|merge)")),
    f"""
WITH {FT_BASE}
SELECT DISTINCT doc_id FROM postings WHERE regexp_matches(term, '^(scan|sort|merge)$')
""")

_register(
    "ft_fuzzy",
    lambda spark, sf: _multiterm_docids(spark, sf, A.FuzzyQ("joins", max_edits=1)),
    f"""
WITH {FT_BASE}
SELECT DISTINCT doc_id FROM postings WHERE levenshtein(term, 'joins') <= 1
""")

_register(
    "ft_term_range",
    lambda spark, sf: _multiterm_docids(
        spark, sf, A.TermRangeQ("b", "d", include_upper=False)),
    f"""
WITH {FT_BASE}
SELECT DISTINCT doc_id FROM postings WHERE term >= 'b' AND term < 'd'
""")

_register(
    "ft_term_in_set",
    lambda spark, sf: _multiterm_docids(
        spark, sf, A.TermInSetQ(("vector", "window", "stream"))),
    f"""
WITH {FT_BASE}
SELECT DISTINCT doc_id FROM postings WHERE term IN ('vector','window','stream')
""")


def _ft_term_stats(spark, sf):
    idx = _docs_index(spark, sf)
    return idx.term_stats.select(
        "term", F.col("df").cast("long").alias("df"),
        F.col("ttf").cast("long").alias("ttf"))


_register("ft_term_stats", _ft_term_stats, f"""
WITH {FT_BASE}
SELECT p.term, count(*)::BIGINT AS df, sum(p.tf)::BIGINT AS ttf
FROM postings p GROUP BY p.term
""")


# ---- facets / stats / grouping (SURVEY §2.5) -------------------------------

def _facet_terms(spark, sf):
    idx = _docs_index(spark, sf)
    counts = idx.term_stats.select("term", F.col("df").cast("long").alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(10)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


_register("facet_terms", _facet_terms, f"""
WITH {FT_BASE}
SELECT term, cnt, rank FROM (
  SELECT term, count(*)::BIGINT AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, term) AS rank
  FROM postings GROUP BY term
) WHERE rank <= 10
""")


def _facet_range_nchars(spark, sf):
    docs = _load(spark, sf, "documents")
    return FC.range_facet(docs, "n_chars", 0, 600, 50).select(
        "bucket", F.col("cnt").cast("long").alias("cnt"))


_register("facet_range_nchars", _facet_range_nchars, """
SELECT CAST(floor((n_chars - 0) / 50.0) AS BIGINT) AS bucket, count(*)::BIGINT AS cnt
FROM documents WHERE n_chars >= 0 AND n_chars < 600
GROUP BY bucket
""")


def _facet_pivot(spark, sf):
    docs = _load(spark, sf, "documents")
    return FC.pivot_facet(docs, ["lang", "source"]).select(
        "lang", "source", F.col("cnt").cast("long").alias("cnt"))


_register("facet_pivot", _facet_pivot, """
SELECT lang, source, count(*)::BIGINT AS cnt FROM documents GROUP BY lang, source
""")


def _stats_nchars(spark, sf):
    docs = _load(spark, sf, "documents")
    return FC.stats_component(docs, F.col("n_chars").cast("long"))


_register("stats_nchars", _stats_nchars, """
SELECT count(*)::BIGINT AS n,
       min(n_chars)::BIGINT AS min_v, max(n_chars)::BIGINT AS max_v,
       sum(n_chars)::BIGINT AS sum_v, sum(n_chars*n_chars)::BIGINT AS sumsq_v,
       sum(n_chars)::DOUBLE / count(*)::DOUBLE AS mean_v,
       sqrt((count(*)::DOUBLE * sum(n_chars*n_chars)::DOUBLE
            - sum(n_chars)::DOUBLE * sum(n_chars)::DOUBLE)
            / (count(*)::DOUBLE * (count(*)::DOUBLE - 1.0))) AS stddev_v
FROM documents
""")


def _group_collapse(spark, sf):
    docs = _load(spark, sf, "documents")
    out = FC.group_top_k(docs, "lang", [F.desc("n_chars"), F.asc("doc_id")], k=1)
    return out.select("lang", "doc_id", F.col("n_chars").cast("long").alias("n_chars"))


_register("group_collapse", _group_collapse, """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn = 1
""")


def _group_topk(spark, sf):
    docs = _load(spark, sf, "documents")
    out = FC.group_top_k(docs, "source", [F.desc("n_chars"), F.asc("doc_id")], k=3)
    return out.select("source", "doc_id", F.col("grank").cast("long").alias("grank"))


_register("group_topk", _group_topk, """
SELECT source, doc_id,
       row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)::BIGINT AS grank
FROM documents
QUALIFY grank <= 3
""")


def _distinct_pairs(spark, sf):
    docs = _load(spark, sf, "documents")
    return FC.distinct_values(docs, ["lang", "source"])


_register("distinct_pairs", _distinct_pairs,
          "SELECT DISTINCT lang, source FROM documents")


# ---- Solr streaming-expression relational ops (SURVEY §2.4-§2.7) ----------

def _select_having(spark, sf):
    orders = _load(spark, sf, "orders")
    sel = R.select_stream(orders, {
        "o_orderkey": "okey",
        "o_custkey": "cust",
        "CAST(round(o_totalprice * 100) AS BIGINT)": "cents",
    })
    return R.having_stream(sel, "cents > 20000000")


_register("select_having", _select_having, f"""
SELECT o_orderkey AS okey, o_custkey AS cust,
       {_CENTS.format(col='o_totalprice')} AS cents
FROM orders
WHERE {_CENTS.format(col='o_totalprice')} > 20000000
""")


def _innerjoin_stream(spark, sf):
    orders = _load(spark, sf, "orders")
    cust = _load(spark, sf, "customer")
    j = R.inner_join_stream(
        orders.select("o_orderkey", F.col("o_custkey").alias("c_custkey"),
                      _cents("o_totalprice").alias("cents")),
        cust.select("c_custkey", "c_mktsegment"),
        ["c_custkey"],
    )
    return j.select("o_orderkey", "c_custkey", "cents", "c_mktsegment")


_register("innerjoin_stream", _innerjoin_stream, f"""
SELECT o_orderkey, c_custkey, {_CENTS.format(col='o_totalprice')} AS cents,
       c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
""")


def _hashjoin_stream(spark, sf):
    li = _load(spark, sf, "lineitem")
    part = _load(spark, sf, "part")
    j = R.hash_join_stream(
        li.select(F.col("l_partkey").alias("p_partkey"),
                  F.col("l_quantity").cast("long").alias("qty")),
        part.select("p_partkey", "p_brand"),
        ["p_partkey"],
    )
    return j.groupBy("p_brand").agg(F.sum("qty").alias("sum_qty"),
                                    F.count(F.lit(1)).alias("cnt"))


_register("hashjoin_stream", _hashjoin_stream, """
SELECT p_brand, sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty, count(*)::BIGINT AS cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""")


def _leftouter_join(spark, sf):
    cust = _load(spark, sf, "customer")
    orders = _load(spark, sf, "orders")
    cnt = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"))
    j = R.left_outer_join_stream(cust.select("c_custkey", "c_mktsegment"),
                                 cnt, ["c_custkey"])
    return j.select("c_custkey", "c_mktsegment",
                    F.coalesce("n_orders", F.lit(0)).alias("n_orders"))


_register("leftouter_join", _leftouter_join, """
SELECT c_custkey, c_mktsegment, coalesce(o.n, 0)::BIGINT AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
  ON c_custkey = o_custkey
""")


def _intersect_stream(spark, sf):
    cust = _load(spark, sf, "customer")
    orders = _load(spark, sf, "orders")
    return R.intersect_stream(
        cust.select("c_custkey"),
        orders.select(F.col("o_custkey").alias("c_custkey")),
        ["c_custkey"])


_register("intersect_stream", _intersect_stream, """
SELECT c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
""")


def _complement_stream(spark, sf):
    cust = _load(spark, sf, "customer")
    orders = _load(spark, sf, "orders")
    return R.complement_stream(
        cust.select("c_custkey"),
        orders.select(F.col("o_custkey").alias("c_custkey")),
        ["c_custkey"])


_register("complement_stream", _complement_stream, """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""")


def _fetch_stream(spark, sf):
    orders = _load(spark, sf, "orders")
    cust = _load(spark, sf, "customer")
    top = R.rank_stream(
        orders.select("o_orderkey", "o_custkey", _cents("o_totalprice").alias("cents")),
        [F.desc("cents"), F.asc("o_orderkey")], 20)
    fetched = R.fetch_stream(top, cust.select(F.col("c_custkey").alias("o_custkey"),
                                              "c_name"),
                             ["o_custkey"], ["c_name"])
    w = Window.orderBy(F.desc("cents"), F.asc("o_orderkey"))
    return fetched.select("o_orderkey", "cents", "c_name").withColumn(
        "rank", F.row_number().over(w).cast("long"))


_register("fetch_stream", _fetch_stream, f"""
SELECT o_orderkey, cents, c_name, rank FROM (
  SELECT o_orderkey, {_CENTS.format(col='o_totalprice')} AS cents, c_name,
         row_number() OVER (ORDER BY {_CENTS.format(col='o_totalprice')} DESC,
                            o_orderkey) AS rank
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
) WHERE rank <= 20
""")


def _rollup_stream(spark, sf):
    li = _load(spark, sf, "lineitem")
    base = li.select(
        "l_returnflag", "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("base_c"),
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("disc_c2"),
    )
    out = R.rollup_stream(base, ["l_returnflag", "l_linestatus"], [
        F.sum("qty").alias("sum_qty"),
        F.sum("base_c").alias("sum_base_c"),
        F.sum("disc_c2").alias("sum_disc_c2"),
        F.count(F.lit(1)).alias("cnt"),
    ])
    return out.withColumn(
        "avg_qty", F.col("sum_qty").cast("double") / F.col("cnt").cast("double"))


_register("rollup_stream", _rollup_stream, f"""
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
       sum({_CENTS.format(col='l_extendedprice')})::BIGINT AS sum_base_c,
       sum({_CENTS.format(col='l_extendedprice')}
           * (100 - {_CENTS.format(col='l_discount')}))::BIGINT AS sum_disc_c2,
       count(*)::BIGINT AS cnt,
       sum(CAST(l_quantity AS BIGINT))::DOUBLE / count(*)::DOUBLE AS avg_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")


def _stats_stream(spark, sf):
    orders = _load(spark, sf, "orders")
    return R.stats_stream(orders.select(_cents("o_totalprice").alias("c")), [
        F.count(F.lit(1)).alias("n"),
        F.min("c").alias("min_c"),
        F.max("c").alias("max_c"),
        F.sum("c").alias("sum_c"),
    ]).withColumn("mean_c", F.col("sum_c").cast("double") / F.col("n").cast("double"))


_register("stats_stream", _stats_stream, f"""
SELECT count(*)::BIGINT AS n,
       min({_CENTS.format(col='o_totalprice')}) AS min_c,
       max({_CENTS.format(col='o_totalprice')}) AS max_c,
       sum({_CENTS.format(col='o_totalprice')})::BIGINT AS sum_c,
       sum({_CENTS.format(col='o_totalprice')})::DOUBLE / count(*)::DOUBLE AS mean_c
FROM orders
""")


def _unique_stream(spark, sf):
    orders = _load(spark, sf, "orders")
    return R.unique_stream(orders.select("o_orderpriority"), ["o_orderpriority"])


_register("unique_stream", _unique_stream,
          "SELECT DISTINCT o_orderpriority FROM orders")


def _rank_stream(spark, sf):
    orders = _load(spark, sf, "orders")
    top = R.rank_stream(
        orders.select("o_orderkey", _cents("o_totalprice").alias("cents")),
        [F.desc("cents"), F.asc("o_orderkey")], 10)
    return R.ranked(top, [F.desc("cents"), F.asc("o_orderkey")]).withColumn(
        "rank", F.col("rank").cast("long"))


_register("rank_stream", _rank_stream, f"""
SELECT o_orderkey, cents, rank FROM (
  SELECT o_orderkey, {_CENTS.format(col='o_totalprice')} AS cents,
         row_number() OVER (ORDER BY {_CENTS.format(col='o_totalprice')} DESC,
                            o_orderkey) AS rank
  FROM orders
) WHERE rank <= 10
""")


def _merge_stream(spark, sf):
    orders = _load(spark, sf, "orders")
    a = orders.where(F.col("o_orderpriority") == "1-URGENT")
    b = orders.where(F.col("o_orderpriority") == "5-LOW")
    m = R.merge_stream(
        [a.select("o_orderkey", "o_orderpriority"),
         b.select("o_orderkey", "o_orderpriority")],
        [F.asc("o_orderkey")])
    return R.ranked(m.limit(50), [F.asc("o_orderkey")]).withColumn(
        "rank", F.col("rank").cast("long"))


_register("merge_stream", _merge_stream, """
SELECT o_orderkey, o_orderpriority,
       row_number() OVER (ORDER BY o_orderkey) AS rank
FROM orders WHERE o_orderpriority IN ('1-URGENT','5-LOW')
QUALIFY rank <= 50
""")


# the SQL front door (EP3): the same ANSI text runs on both engines
_SQL_FRONT_DOOR = """
SELECT o_orderpriority, count(*)::BIGINT AS cnt
FROM orders GROUP BY o_orderpriority
"""


def _sql_front_door(spark, sf):
    _load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL_FRONT_DOOR.replace("::BIGINT", ""))


_register("sql_front_door", _sql_front_door, _SQL_FRONT_DOOR)


def _events_hourly(spark, sf):
    ev = _load(spark, sf, "events")
    return (ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(_cents("value")).alias("sum_value_c")))


_register("events_hourly", _events_hourly, f"""
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
       count(*)::BIGINT AS cnt,
       sum({_CENTS.format(col='value')})::BIGINT AS sum_value_c
FROM events GROUP BY 1, 2
""")


# ---- dedup / similarity / text analysis (training-data ops) ---------------

def _dedup_exact(spark, sf):
    docs = _load(spark, sf, "documents")
    return D.exact_dedup(docs)


_register("dedup_exact", _dedup_exact, """
SELECT md5(text) AS digest, min(doc_id) AS survivor_id, count(*)::BIGINT AS dup_count
FROM documents GROUP BY md5(text)
""")


def _dedup_jaccard(spark, sf):
    # explicit hot-shingle cap (capped-Jaccard semantics; mirrored in
    # the oracle's qualifying filter) — bounds the shared-shingle
    # self-join at any corpus scale
    docs = _load(spark, sf, "documents")
    return D.jaccard_pairs(docs, n=3, threshold=0.10,
                           max_shingle_df=1_000).select(
        "id_a", "id_b", F.col("inter").cast("long").alias("inter"),
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"))


_register("dedup_jaccard", _dedup_jaccard, """
WITH sh0 AS (
  SELECT DISTINCT doc_id AS id, sh AS shingle FROM (
    SELECT doc_id,
           unnest([array_to_string(arr[i+1:i+3], ' ')
                   for i in range(greatest(len(arr) - 2, 0))]) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
  )
),
sh AS (
  SELECT id, shingle FROM sh0
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
),
sizes AS (SELECT id, count(*)::BIGINT AS sz FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b, inter, sa.sz AS size_a, sb.sz AS size_b
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.10
""")


def _dedup_minhash(spark, sf):
    docs = _load(spark, sf, "documents")
    return D.minhash_lsh_pairs(docs, n=3, num_hashes=8, bands=4)


_register("dedup_minhash", _dedup_minhash, """
WITH sh AS (
  SELECT DISTINCT doc_id AS id, sh AS shingle FROM (
    SELECT doc_id,
           unnest([array_to_string(arr[i+1:i+3], ' ')
                   for i in range(greatest(len(arr) - 2, 0))]) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
  )
),
sig AS (
  SELECT id,
         {mins}
  FROM sh GROUP BY id
),
banded AS (
  SELECT id, band, bucket FROM (
    SELECT id,
           unnest([0, 1, 2, 3]) AS band,
           unnest([md5(h0::VARCHAR || ':' || h1::VARCHAR),
                   md5(h2::VARCHAR || ':' || h3::VARCHAR),
                   md5(h4::VARCHAR || ':' || h5::VARCHAR),
                   md5(h6::VARCHAR || ':' || h7::VARCHAR)]) AS bucket
    FROM sig
  )
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.id < b.id
""".format(mins=",\n         ".join(
    f"min(('0x' || substr(md5('{i}:' || shingle), 1, 15))::BIGINT) AS h{i}"
    for i in range(8))))


def _dedup_simhash(spark, sf):
    docs = _load(spark, sf, "documents")
    return D.simhash(docs, bits=32).select(F.col("id").alias("doc_id"), "simhash")


_SIMHASH_BITS_SQL = " + ".join(
    f"(CASE WHEN sum(tf * ((('0x' || substr(md5(term),1,15))::BIGINT >> {j}) & 1) * 2 - tf) > 0 "
    f"THEN {1 << j} ELSE 0 END)"
    for j in range(32)
)

_register("dedup_simhash", _dedup_simhash, f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) GROUP BY doc_id, term
)
SELECT doc_id, CAST({_SIMHASH_BITS_SQL} AS BIGINT) AS simhash
FROM tf GROUP BY doc_id
""")


def _ann_cosine(spark, sf):
    emb = _load(spark, sf, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = SIM.brute_force_topk(emb, list(qvec), k=10)
    return out.select("vec_id", "cos_q", F.col("rank").cast("long").alias("rank"))


_register("ann_cosine", _ann_cosine, """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         CAST(floor(
           list_sum(list_transform(range(1, len(e.embedding)+1),
                    i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE))))
           * 1000000) AS BIGINT) AS cos_q
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, cos_q, row_number() OVER (ORDER BY cos_q DESC, vec_id) AS rank
FROM scored
QUALIFY rank <= 10
""")


def _ann_knn_join(spark, sf):
    emb = _load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    out = SIM.knn_join(queries, emb, k=5)
    return out.select("qid", "cid", "cos_q", F.col("rank").cast("long").alias("rank"))


_register("ann_knn_join", _ann_knn_join, """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.qid, e.vec_id AS cid,
         CAST(floor(
           list_sum(list_transform(range(1, len(e.embedding)+1),
                    i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE))))
           * 1000000) AS BIGINT) AS cos_q
  FROM embeddings e CROSS JOIN q
)
SELECT qid, cid, cos_q,
       row_number() OVER (PARTITION BY qid ORDER BY cos_q DESC, cid) AS rank
FROM scored
QUALIFY rank <= 5
""")


def _text_token_count(spark, sf):
    return TS.token_count(_load(spark, sf, "documents")).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"))


_register("text_token_count", _text_token_count, """
SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_tokens,
       len(list_distinct(string_split(text,' ')))::BIGINT AS n_distinct
FROM documents
""")


def _text_quality(spark, sf):
    return TS.quality_score(_load(spark, sf, "documents")).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_stopwords").cast("long").alias("n_stopwords"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "quality_q")


_register("text_quality", _text_quality, f"""
WITH w AS (
  SELECT doc_id, text, string_split(text,' ') AS arr,
         length(text) AS nchars
  FROM documents
), feat AS (
  SELECT doc_id,
         len(arr)::BIGINT AS n_tokens,
         len(list_filter(arr, x -> x IN {_STOP_SQL}))::BIGINT AS n_stopwords,
         len(list_distinct(arr))::BIGINT AS n_distinct,
         (nchars - (len(arr) - 1))::DOUBLE / len(arr) AS mean_len
  FROM w
)
SELECT doc_id, n_tokens, n_stopwords, n_distinct,
       CAST(floor(1000.0 * (
         0.4 * least(1.0, (n_stopwords::DOUBLE / n_tokens) / 0.05)
         + 0.3 * (CASE WHEN mean_len >= 3 AND mean_len <= 12 THEN 1.0 ELSE 0.0 END)
         + 0.3 * (n_distinct::DOUBLE / n_tokens))) AS BIGINT) AS quality_q
FROM feat
""")


def _text_langid(spark, sf):
    return TS.lang_id(_load(spark, sf, "documents"))


_register("text_langid", _text_langid, f"""
SELECT doc_id,
       CASE WHEN len(list_filter(string_split(text,' '), x -> x IN {_STOP_SQL}))::DOUBLE
                 / len(string_split(text,' ')) >= 0.02
            THEN 'en' ELSE 'unknown' END AS pred_lang
FROM documents
""")


def _text_fingerprint(spark, sf):
    return TS.fingerprint(_load(spark, sf, "documents"))


_register("text_fingerprint", _text_fingerprint, """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' '))
       AS fingerprint
FROM documents
""")


# --------------------------------------------------------------------------
# extension registrations (spans, dismax/synonym/req-opt, suggest/
# spellcheck/MLT/highlight, block join, export/diversified/rerank,
# stats percentile/HLL, LSH/IVF ANN, multimodal, segment read path)
# --------------------------------------------------------------------------

from lucene_solr_spark import driver_surface_ext  # noqa: E402,F401

# --------------------------------------------------------------------------
# driver-check ordering
# --------------------------------------------------------------------------
# The correctness driver verifies the FIRST 50 registered queries per
# round. Rounds 1+2 green-checked 96 of the 104 then-registered
# queries; this round the window leads with (a) the 8 round-2 late
# registrations that never got a driver verdict, (b) the queries new
# in round 3 (DFR/IB similarities, doc-values function query/sort,
# path-returning shortest path, multi-term-repeat sloppy multiphrase),
# (c) the flagship segment/WAND path (regression guard on the scoring
# kernel), then (d) a cross-category regression sample of r01/r02
# greens. Everything else follows in registration order.

DRIVER_PRIORITY = [
    # (a) new or re-pointed in round 4: the two-phase phrase kernel,
    # multi-field qf, persisted SQ8 layout, deterministic HLL (clears
    # the r3 no_oracle row), persisted suggester, executor-striped
    # JDBC, contract-fixed whitespace oracle, six QParser ValueSource/
    # bool/mlt dialects, polygons with holes
    # (r5 late: seg_phrase displaced — r4-green; exact phrases stay
    # via seg_phrase_hot + seg_multiphrase)
    # (r5 late: ft_multifield_qf / seg_multiphrase displaced —
    # r4-green; multifield stays via seg_multifield_qf, phrases via
    # seg_phrase_hot) FreeTextSuggester n-gram LM:
    "seg_phrase_hot", "suggest_freetext",
    # (r5 late: ft_multifield_bool displaced — r4-green; multifield
    # stays via ft_multifield_qf + seg_multifield_qf)
    "ann_sq8", "cardinality_hll",
    # (r5) UnifiedHighlighter passage ranking (displaced
    # ann_sq8_rerank — r4-green, SQ8 family stays via ann_sq8)
    "highlight_passages",
    "jdbc_stream", "ft_whitespace_term",
    # (r5) PayloadScoreQuery over the .pay-analogue offset payloads —
    # the last un-mapped reference query family (displaced
    # suggest_analyzing — r4-green, suggester gate-covered)
    "payload_score",
    # (r5 late: solr_func_qp / solr_frange_qp displaced — r4-green;
    # ValueSources stay via ft_func_bool + func_ord + ft_sweetspot +
    # solr_stats_vs dialect machinery re-validated by the local gate)
    "high_freq_terms", "ft_sweetspot", "func_ord",
    # (r5) {!export} dialect (ExportWriter surface; displaced
    # solr_boost_qp — r4-green, ValueSource family stays via
    # solr_func_qp/solr_frange_qp/solr_stats_vs_qp/ft_func_bool)
    "solr_export_qp",
    "solr_mlt_qp",
    # (r5) segment-native NESTED spans (span_nested_topk; displaced
    # geo_polygon_holes — r4-green, spatial family in solr_geo_qp)
    "seg_span_nested",
    # (r5) the three registrations that had never had a driver verdict
    # (oracled + local-gate green since r4); displaced solr_terms_qp /
    # solr_bool_qp / leftouter_join — all r4-driver-green, families
    # still represented (solr_*_qp batch, innerjoin_stream)
    "ft_func_bool", "solr_tlogit_qp", "synonym_graph",
    # (a2) round-4 session 2: dialect batch 2 ({!field}/{!raw}/
    # {!switch}/{!maxscore}, block join, graph, geofilt/bbox,
    # surround/complexphrase) + the segment-native MultiPhrase kernel
    # (r5 late: solr_graph_qp displaced — r4-green; graph traversal
    # stays via shortest_path_paths, dialect batches via mix2/mix3)
    # (r5 late: solr_qparser_mix2 displaced — r4-green; dialect
    # batches stay via solr_classic_qp/solr_export_qp/solr_tlogit_qp)
    "solr_block_qp",
    "solr_geo_qp",
    # DrillSideways: per-dimension near-miss facet counts
    "drill_sideways",
    # (r5 late) FastVectorHighlighter fragments over the indexed
    # term-vector stream
    "fvh_highlight",
    # (r5) classic QueryParser grammar completion (&&/||/!, field
    # groups, escapes, q.op); displaced solr_phrase_qp — r4-green,
    # phrase family in-window via seg_phrase/seg_phrase_hot
    "solr_classic_qp",
    # (b) flagship: segment index + block-max WAND (float32-exact
    # oracles) — permanent regression guard on the scoring kernel.
    # (r5 late) seg_bm25_and/seg_bm25_msm/seg_or_match displaced —
    # all r4-driver-green; AND/MSM/OR coverage stays via seg_bm25_wand,
    # seg_bm25_not, seg_and_match, ft_bool_or_msm
    # (r5 late: seg_and_match displaced — r4-green; boolean kernels
    # stay via seg_bm25_wand/seg_bm25_not)
    "seg_bm25_wand", "seg_bm25_not",
    # (r5 late: seg_function_query / seg_sort_dv displaced —
    # r4-green; the dv sidecar stays via seg_dv_numbers)
    "dataset_split",
    # (r5 late) FuzzySuggester + AnalyzingInfixSuggester over the
    # persisted completion layout
    "suggest_fuzzy", "suggest_infix",
    # (r5 late) sandbox DocValuesNumbersQuery from the dv sidecar
    "seg_dv_numbers",
    # (r5 late) JoinUtil ScoreMode joins, grouped faceting,
    # WordBreakSpellChecker — displaced ft_term / ft_bool_and /
    # ft_phrase / innerjoin_stream (all r4-driver-green; term family
    # stays via ft_whitespace_term + the seg_* kernels, phrase via
    # seg_phrase/seg_phrase_hot, relational joins via the score joins
    # + solr_block_qp/solr_graph_qp)
    "join_score_max", "join_score_avg", "group_facet",
    "spellcheck_wordbreak",
    # (r5 late) the widened similarity lattice (DFR G-B-H1, IB SPL-T-H2,
    # LM Jelinek-Mercer) — registered this round, windowed immediately
    # so nothing accumulates a never-windowed debt
    "ft_dfr_gb", "ft_ib_spl", "ft_lmjm",
    # (r5 late) DirectSpellChecker with the reference comparator/OSA
    # scoring (displaced ft_bm25_or — r1-green on record; OR scoring
    # stays via seg_bm25_wand + ft_bool_or_msm)
    "spellcheck_direct",
    # (r5 late) SpellCheckCollator re-queried collations (displaced
    # group_topk — r4-green; grouping family stays via group_facet +
    # json_facet_nested)
    "spellcheck_collate",
    # (r5 late: ft_bool_or_msm displaced — r1+r4-green; booleans stay
    # via seg_bm25_wand/seg_bm25_not) SpanMultiTermQueryWrapper:
    "seg_span_multiterm",
    # (r5 late: dedup_exact / json_facet_nested displaced — both
    # driver-green on record; LLM-pipeline coverage stays via
    # random_stream/stratified_sample/seq_packing/dataset_split, facets
    # via interval_facet + group_facet + cardinality_hll)
    # IndexSearcher.explain: the f32 component breakdown, bit-checked
    "explain_score",
    # QueryElevationComponent + sortMissingLast semantics
    "query_elevation", "sort_missing",
    # (a3) round-4 session 3: index-stats ValueSources (termfreq/idf/
    # docfreq/ttf/strdist in the {!func} grammar), the segment-native
    # two-phase span kernel, and QParser dialect batch 3
    # ({!knn}/{!hash}/{!rank} + {!dismax} over the multi-field engine)
    # (r5 late: solr_qparser_mix4 / seg_span_near / solr_dismax_qp /
    # solr_stats_vs_qp / solr_qparser_mix3 displaced — all driver-green
    # on record; dialect batches stay via mix2 + solr_tlogit_qp, the
    # span kernel via seg_span_nested, dismax via seg_multifield_qf +
    # ft_multifield_qf, ValueSources via solr_func_qp/solr_frange_qp/
    # ft_func_bool)
    "ltr_rerank",
    # (r5 late) deterministic hash-keyed RandomStream sample + the
    # LLM-pipeline sampling/packing pair
    "random_stream", "stratified_sample", "seq_packing",
    # (r5 late) interval facets + cursorMark tuple-predicate paging
    "interval_facet", "cursor_mark",
    # (r5 late) {!payload_check} — the payload family complete
    # (displaced seg_multifield_title — r4-green; multifield stays via
    # ft_multifield_qf/ft_multifield_bool/seg_multifield_qf)
    "payload_check",
    "seg_multifield_qf",
    # (d) r2/r3 regression sample across operator families
    # (ft_edismax, events_sessionize, term_automaton rotated out — all
    # driver-green on record; edismax machinery is in-window via
    # ft_multifield_qf)
    "shortest_path_paths",
]


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """QUERIES with DRIVER_PRIORITY names first, then the rest in
    registration order (drives the driver's 50-query check window)."""
    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"
    out = {n: QUERIES[n] for n in DRIVER_PRIORITY}
    out.update({n: f for n, f in QUERIES.items() if n not in out})
    return out
