"""Learning-to-rank reranking — the solr/contrib/ltr module's shape.

Reference: solr/contrib/ltr/src/java/org/apache/solr/ltr/
(LTRScoringQuery.java drives feature extraction + model scoring over
the rerank window; model/LinearModel.java scores a weighted feature
sum; model/MultipleAdditiveTreesModel.java walks {feature, threshold,
left, right} trees and sums weighted leaf values;
feature/OriginalScoreFeature.java exposes the first-pass score as a
feature; feature/SolrFeature.java evaluates arbitrary function
queries as features).

Spark-first mapping: features are ValueSource EXPRESSIONS
(search/solrq.py grammar — arithmetic, index stats, conditionals)
evaluated as Columns over the rerank window's joined attrs frame; the
model is a Column expression too (linear fold in sorted-feature-name
order, trees as nested CASE/when chains), so the whole rerank is one
Catalyst plan: first-pass top-N window → feature join → model column
→ window re-sort. No UDFs, no driver loops; the window (reRankDocs)
bounds the model-scored set exactly like LTRScoringQuery's rescorer.

Determinism contract: the linear fold adds features in sorted-name
order in float64; trees fold in list order. A SQL oracle writing the
same CASE chains and the same fold order reproduces the doubles
bit-for-bit (quantized by the driver contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_solr_spark.search.solrq import (augment_value_source_frame,
                                            parse_value_source,
                                            value_source_column)

ORIGINAL_SCORE = "originalScore"


def feature_columns(searcher, window_df: DataFrame,
                    features: dict[str, str]) -> DataFrame:
    """Evaluate named ValueSource expressions over the rerank window.

    ``window_df``: (docid, score, <attr cols>...) — the first-pass
    window already joined with whatever attrs the expressions read.
    The reserved name/expression ``originalScore`` reads the
    first-pass score (OriginalScoreFeature.java). Returns window_df
    plus one ``f_<name>`` double column per feature.
    """
    out = window_df
    for name in sorted(features):
        expr = features[name]
        if expr == ORIGINAL_SCORE:
            col = F.col("score").cast("double")
        else:
            node = parse_value_source(expr)
            out = augment_value_source_frame(node, out, searcher)
            col = value_source_column(node, out, searcher)
        out = out.withColumn(f"f_{name}", col)
    return out


def linear_model(weights: dict[str, float]) -> F.Column:
    """LinearModel.java: score = sum(w_f * feature_f), folded in
    sorted-feature-name order (float64)."""
    names = sorted(weights)
    if not names:
        raise ValueError("linear model needs at least one weight")
    out = F.lit(float(weights[names[0]])) * F.col(f"f_{names[0]}")
    for n in names[1:]:
        out = out + F.lit(float(weights[n])) * F.col(f"f_{n}")
    return out


def _tree_column(node) -> F.Column:
    """One MultipleAdditiveTrees tree as a nested when-chain:
    {"feature": name, "threshold": t, "left": ..., "right": ...} |
    {"value": v}. Branch rule (MultipleAdditiveTreesModel.java:
    RegressionTreeNode.score): feature <= threshold -> left."""
    if "value" in node:
        return F.lit(float(node["value"]))
    cond = F.col(f"f_{node['feature']}") <= F.lit(float(node["threshold"]))
    return F.when(cond, _tree_column(node["left"])) \
            .otherwise(_tree_column(node["right"]))


def additive_trees_model(trees: list[dict]) -> F.Column:
    """MultipleAdditiveTreesModel.java: sum of weight * tree score in
    list order. Each entry: {"weight": w, "root": <tree node>}."""
    if not trees:
        raise ValueError("trees model needs at least one tree")
    out = F.lit(float(trees[0]["weight"])) * _tree_column(trees[0]["root"])
    for t in trees[1:]:
        out = out + F.lit(float(t["weight"])) * _tree_column(t["root"])
    return out


def ltr_rerank(searcher, q, doc_attrs: DataFrame,
               features: dict[str, str], model: F.Column | None = None,
               weights: dict[str, float] | None = None,
               rerank_docs: int = 200,
               rows: int | None = None) -> DataFrame:
    """Rerank the main query's top window with an LTR model
    (LTRQParserPlugin's {!ltr model=... reRankDocs=...} shape).

    First pass: searcher.matches(q); the top ``rerank_docs`` by
    (score desc, docid asc) form the window — selected with
    orderBy().limit() (Catalyst's TakeOrderedAndProject: per-partition
    top-k + a k-row merge), NOT a global ranking window, so the plan
    never funnels the full match set through one partition. Features
    evaluate over window ∪ attrs; the model column REPLACES the window
    docs' scores (LTRScoringQuery rescoring). Final order: window docs
    by (model desc, docid asc) occupy ranks 1..|window|; when ``rows``
    > rerank_docs, first-pass docs up to ``rows`` follow in their
    original order (the reference rescorer's contract). Every ranking
    window runs over <= max(rows, rerank_docs) rows. Returns
    (docid, score, rank).

    Pass ``model`` (a Column over the f_<name> columns) or
    ``weights`` for a LinearModel shorthand.
    """
    if model is None:
        if weights is None:
            raise ValueError("ltr_rerank needs model= or weights=")
        model = linear_model(weights)
    if isinstance(q, str):
        from lucene_solr_spark.search import ast as A

        q = A.parse_query(q)
    main = searcher.matches(q)
    window_df = (main.orderBy(F.desc("score"), F.asc("docid"))
                 .limit(rerank_docs)
                 .join(doc_attrs, "docid", "left"))
    feats = feature_columns(searcher, window_df, features)
    rescored = feats.select(
        "docid", model.cast("double").alias("score"),
        F.lit(0).alias("_tier"))
    if rows is not None and rows > rerank_docs:
        head = (main.orderBy(F.desc("score"), F.asc("docid"))
                .limit(rows))
        rest = (head.join(rescored.select("docid"), "docid",
                          "left_anti")
                .select("docid",
                        F.col("score").cast("double").alias("score"),
                        F.lit(1).alias("_tier")))
        u = rescored.unionByName(rest)
    else:
        u = rescored
    w1 = Window.orderBy(F.asc("_tier"), F.desc("score"), F.asc("docid"))
    out = (u.withColumn("rank", F.row_number().over(w1))
           .select("docid", "score", "rank"))
    # the reference rescorer returns at most `rows` docs — without
    # this, rows=10 with rerank_docs=200 would hand back 200
    if rows is not None:
        out = out.where(F.col("rank") <= rows)
    return out
