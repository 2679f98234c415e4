"""Classification module (SURVEY §2.13; reference:
lucene/classification/src/java/org/apache/lucene/classification/).

- kNN over embeddings lives in the driver surface (knn_classify).
- naive_bayes_classify mirrors SimpleNaiveBayesClassifier.java:
  multinomial NB over the index's term statistics — log prior
  ln(docs_c/N) plus per-token-occurrence add-one-smoothed
  log-likelihood ln((count(t,c)+1)/(tokens_c + V)). The reference
  computes exactly these from TermsEnum.docFreq/totalTermFreq walks;
  here they are two groupBy aggregations, and scoring one class-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def naive_bayes_classify(train: DataFrame, test: DataFrame,
                         class_col: str = "lang", text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Classify ``test`` docs into ``train``'s classes. Tokenization =
    whitespace split (matching the dedup/textstats convention).
    Returns (doc_id, pred) with deterministic (score desc, class asc)
    tie-breaks."""
    tok_tr = train.select(F.col(class_col).alias("cls"),
                          F.explode(F.split(F.col(text_col), " ")).alias("t"))
    n_train = train.count()
    vocab = tok_tr.select("t").distinct().count()
    priors = train.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_docs"))
    tokens_per_cls = tok_tr.groupBy("cls").agg(F.count(F.lit(1)).alias("n_tok"))
    term_counts = tok_tr.groupBy("cls", "t").agg(F.count(F.lit(1)).alias("c"))

    test_tok = test.select(F.col(id_col),
                           F.explode(F.split(F.col(text_col), " ")).alias("t"))
    # per (test token occurrence, class) log-likelihood; classes are a
    # tiny broadcast side
    cls_dim = F.broadcast(priors.join(tokens_per_cls, "cls"))
    crossed = (test_tok.crossJoin(cls_dim)
               .join(term_counts, ["cls", "t"], "left"))
    ll = F.log((F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(1.0))
               / (F.col("n_tok").cast("double") + F.lit(float(vocab))))
    scored = (crossed.groupBy(id_col, "cls", "n_docs")
              .agg(F.sum(ll).alias("ll_sum")))
    total = (F.log(F.col("n_docs").cast("double") / F.lit(float(n_train)))
             + F.col("ll_sum"))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("cls"))
    return (scored.select(id_col, "cls", total.alias("score"))
            .withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
            .select(id_col, F.col("cls").alias("pred")))
