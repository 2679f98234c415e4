"""Solr streaming-expression relational operators (SURVEY §2.4-§2.7).

The reference implements a pull-based tuple dataflow
(solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/); every
operator below is the DataFrame-native equivalent. These are thin on
purpose: the *point* of the Spark-first design is that Catalyst plans
the join strategy / partial aggregation / sort placement that the
reference hand-writes.

Scale notes per operator are in the docstrings; the common theme:
sort-merge joins shuffle both sides on the key (fine — AQE picks
broadcast when one side is small), rollup is a partial+final hash
aggregate (map-side combine handles skew), and rank/limit compiles to
TakeOrderedAndProject (per-partition bounded heaps, no global sort).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def select_stream(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """SelectStream (io/stream/SelectStream.java:38-41): projection +
    rename. mapping: {source_col_or_expr: out_name}."""
    return df.select(*[F.expr(src).alias(dst) for src, dst in mapping.items()])


def having_stream(df: DataFrame, predicate: str | Column) -> DataFrame:
    """HavingStream (io/stream/HavingStream.java:35-38): boolean filter."""
    return df.where(predicate)


def inner_join_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """InnerJoinStream (io/stream/InnerJoinStream.java:29-32): the
    reference requires both streams pre-sorted on the key and zippers
    them; Spark's sort-merge join does the same with the sort pushed
    into the shuffle."""
    return left.join(right, on, "inner")


def left_outer_join_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """LeftOuterJoinStream — sort-merge left join."""
    return left.join(right, on, "left")


def hash_join_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """HashJoinStream (io/stream/HashJoinStream.java:36-43): the hash
    side is read fully into memory — i.e. a broadcast join. We make
    the broadcast explicit instead of trusting the threshold."""
    return left.join(F.broadcast(right), on, "inner")


def fetch_stream(df: DataFrame, lookup: DataFrame, on: list[str],
                 fields: list[str]) -> DataFrame:
    """FetchStream (io/stream/FetchStream.java:40-47): batched lookup
    of additional fields — a broadcast lookup join."""
    return df.join(F.broadcast(lookup.select(*on, *fields)), on, "left")


def intersect_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """IntersectStream (io/stream/IntersectStream.java:37-40): emit
    left tuples whose key appears in right — left_semi."""
    return left.join(right.select(*on), on, "left_semi")


def complement_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """ComplementStream (io/stream/ComplementStream.java:37-40): left
    minus right on key — left_anti."""
    return left.join(right.select(*on), on, "left_anti")


def rollup_stream(df: DataFrame, keys: list[str], metrics: list[Column]) -> DataFrame:
    """RollupStream (io/stream/RollupStream.java:43-90): group-by with
    Sum/Min/Max/Mean/Count metrics. The reference is sort-based over a
    pre-sorted stream; Spark's partial+final hash aggregate is the
    TAAT equivalent and handles unsorted input."""
    return df.groupBy(*keys).agg(*metrics)


def stats_stream(df: DataFrame, metrics: list[Column]) -> DataFrame:
    """StatsStream (io/stream/StatsStream.java): global aggregates,
    no group-by."""
    return df.agg(*metrics)


def unique_stream(df: DataFrame, keys: list[str]) -> DataFrame:
    """UniqueStream (io/stream/UniqueStream.java:40-43): distinct on
    keys, keeping the first tuple per key in sort order. We keep the
    deterministic 'first by full sort order' via a min struct."""
    others = [c for c in df.columns if c not in keys]
    if not others:
        return df.dropDuplicates(keys)
    agg = F.min(F.struct(*[F.col(c) for c in others])).alias("_s")
    out = df.groupBy(*keys).agg(agg)
    return out.select(*keys, *[F.col(f"_s.{c}").alias(c) for c in others])


def rank_stream(df: DataFrame, order: list[Column], n: int) -> DataFrame:
    """RankStream (io/stream/RankStream.java:41-43): top-N by
    comparator — orderBy().limit() → TakeOrderedAndProject (bounded
    per-partition heaps + driver merge, never a full sort)."""
    return df.orderBy(*order).limit(n)


def sort_stream(df: DataFrame, order: list[Column]) -> DataFrame:
    """SortStream (io/stream/SortStream.java): full sort. The
    reference sorts in memory; Spark range-partitions + sorts
    distributed (this is also ExportWriter's sorted full-result
    export, solr/core/.../handler/ExportWriter.java:82,229)."""
    return df.orderBy(*order)


def merge_stream(parts: list[DataFrame], order: list[Column]) -> DataFrame:
    """MergeStream (io/stream/MergeStream.java:36-39): k-way ordered
    merge of pre-sorted streams = union + re-sort (Spark's sort is a
    k-way merge of sorted runs internally)."""
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy(*order)


def ranked(df: DataFrame, order: list[Column], rank_col: str = "rank") -> DataFrame:
    """Attach a deterministic rank column (1-based) by `order`.
    Used to expose sorted results through the order-insensitive
    correctness harness. Note: a global row_number window is
    single-partition — only for small/top-k results; large exports
    should carry their sort keys instead."""
    return df.withColumn(rank_col, F.row_number().over(Window.orderBy(*order)))


def score_join(from_scored: DataFrame, to_df: DataFrame, key_col: str,
               mode: str = "max", k: int = 10,
               score_col: str = "score_q", doc_col: str = "doc_id",
               broadcast_values: bool = True) -> DataFrame:
    """Query-time score-carrying join — JoinUtil.createJoinQuery with a
    ScoreMode (lucene/join/src/java/org/apache/lucene/search/join/
    JoinUtil.java:91, ScoreMode.java:23-47,
    TermsWithScoreCollector.java): from-side hit scores are aggregated
    per unique join value (Max / Min / Total / Avg), then every to-side
    doc carrying that value is returned with the aggregated score.

    ``from_scored``: (key_col, score_col) rows — one per from-side hit
    (already joined to its join value). ``to_df`` must carry
    (doc_col, key_col). Returns (doc_col, score_q, rank) top-k by
    (score desc, doc asc).

    Determinism deviation (documented): the reference's
    TermsWithScoreCollector folds float scores in doc-encounter order
    (order-dependent float sums); we aggregate the *quantized* integer
    scores (floor(f32_score * 1e6), the engine's standard quantization)
    so Total/Max/Min are exact integer folds and Avg is an IEEE-double
    division of exact integers — order-free and engine-portable.

    Scale: the per-value aggregate is a partial+final hash agg (one
    shuffle on the join value); the aggregated dim is one row per
    distinct join value — the reference keeps exactly this in memory
    (TermsIncludingScoreQuery), so broadcasting it is the faithful
    plan. Set broadcast_values=False for join keys too wide to
    broadcast (falls back to a shuffle join, AQE still free to pick
    broadcast)."""
    if mode == "avg":
        agg = F.floor(F.sum(score_col).cast("double")
                      / F.count(F.lit(1))).cast("long")
    elif mode == "total":
        agg = F.sum(score_col).cast("long")
    elif mode == "max":
        agg = F.max(score_col).cast("long")
    elif mode == "min":
        agg = F.min(score_col).cast("long")
    else:
        raise ValueError(f"score_join: unknown ScoreMode {mode!r}")
    dim = from_scored.groupBy(key_col).agg(agg.alias("score_q"))
    if broadcast_values:
        dim = F.broadcast(dim)
    hits = to_df.select(doc_col, key_col).join(dim, key_col)
    order = [F.desc("score_q"), F.asc(doc_col)]
    w = Window.orderBy(*order)
    return (hits.orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .select(doc_col, "score_q", "rank"))


def random_stream(df: DataFrame, key_col: str, k: int,
                  seed: str = "42") -> DataFrame:
    """RandomStream (solr/solrj/src/java/org/apache/solr/client/solrj/
    io/stream/RandomStream.java): a pseudo-random sample of k rows.
    Deviation (documented): the reference sorts on Solr's
    random_<seed> dynamic field (a per-doc hash of seed + uniqueKey —
    RandomSortField); we use md5(seed || key) as the sort key, which
    is the same construction with an engine-portable hash, so the
    sample is deterministic and identical on every engine and at any
    parallelism.

    Scale: TakeOrderedAndProject over the hash key — per-partition
    bounded heaps, no global sort, no RNG state; exactly how a 100 TB
    training-data pipeline wants its deterministic samples."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"),
                       F.col(key_col).cast("string")))
    order = [F.asc("rnd"), F.asc(key_col)]
    w = Window.orderBy(*order)
    return (df.withColumn("rnd", h)
            .orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long")))
