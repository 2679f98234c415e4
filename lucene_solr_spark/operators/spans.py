"""Span (positional) queries over the flat index's positions arrays.

Reference: lucene/core/src/java/org/apache/lucene/search/spans/
(SpanNearQuery, SpanOrQuery, ...). The Spark expression of the span
algebra: join the two terms' postings on docid (phase 1, cheap), then
count position pairs satisfying the window constraint with a JVM-side
array expression (phase 2) — the TwoPhaseIterator pattern
(search/TwoPhaseIterator.java) without any Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables


def span_near_pairs(index: IndexTables, first: str, second: str,
                    slop: int = 0, in_order: bool = True) -> DataFrame:
    """(docid, pairs): number of (p1, p2) occurrence pairs with
    0 < p2 - p1 <= slop + 1 (in_order) or 0 < |p2 - p1| <= slop + 1
    (unordered). slop=0 in_order == exact adjacency (phrase shape)."""
    a = index.postings.where(F.col("term") == first).select(
        "docid", F.col("positions").alias("p1"))
    b = index.postings.where(F.col("term") == second).select(
        "docid", F.col("positions").alias("p2"))
    j = a.join(b, "docid")
    # count pairs via a fold over p1 x filtered p2 — Catalyst
    # higher-order functions, no UDF
    if in_order:
        cond = lambda x, y: (y > x) & (y <= x + F.lit(slop + 1))  # noqa: E731
    else:
        cond = lambda x, y: (F.abs(y - x) <= F.lit(slop + 1)) & (y != x)  # noqa: E731
    pairs = F.aggregate(
        F.col("p1"), F.lit(0),
        lambda acc, x: acc + F.size(F.filter(F.col("p2"), lambda y: cond(x, y))),
    )
    return j.select("docid", pairs.alias("pairs")).where(F.col("pairs") > 0)
