"""LTR rerank (solr/contrib/ltr analogue): linear + additive-trees
models over ValueSource features, verified against independent Python
computations of the same window/feature/model arithmetic."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.ltr import (additive_trees_model,
                                             linear_model, ltr_rerank)
from lucene_solr_spark.search.executor import Searcher


@pytest.fixture(scope="module")
def sql_searcher(tiny_index):
    return Searcher(tiny_index, mode="sql")


def _first_pass(s, q):
    from lucene_solr_spark.search import ast as A

    rows = s.matches(A.parse_query(q)).collect()
    return sorted(((r["docid"], float(r["score"])) for r in rows),
                  key=lambda t: (-t[1], t[0]))


def test_ltr_linear_rerank(spark, tiny_index, sql_searcher):
    s = sql_searcher
    attrs = tiny_index.docs.select(
        "docid", F.col("doclen").cast("double").alias("dl"))
    dls = {r["docid"]: float(r["dl"]) for r in attrs.collect()}
    tfs = {r["docid"]: float(r["tf"])
           for r in tiny_index.postings
           .where(F.col("term") == "t000002").collect()}

    q = "t000001 OR t000002"
    features = {"orig": "originalScore",
                "tf2": "termfreq(text,t000002)",
                "short": "if(lt(dl,60),1,0)"}
    weights = {"orig": 0.5, "short": 2.0, "tf2": 1.5}
    n_win = 5

    got = {r["docid"]: (float(r["score"]), r["rank"]) for r in
           ltr_rerank(s, q, attrs, features, weights=weights,
                      rerank_docs=n_win, rows=10 ** 6).collect()}

    fp = _first_pass(s, q)
    window, rest = fp[:n_win], fp[n_win:]
    exp = []
    for d, sc in window:
        # sorted(weights) fold order: orig, short, tf2
        m = (0.5 * sc
             + 2.0 * (1.0 if dls[d] < 60 else 0.0)
             + 1.5 * tfs.get(d, 0.0))
        exp.append((d, m))
    exp.sort(key=lambda t: (-t[1], t[0]))
    exp += [(d, sc) for d, sc in rest]
    assert len(got) == len(exp)
    for rank, (d, sc) in enumerate(exp, 1):
        gsc, grank = got[d]
        assert grank == rank, (d, grank, rank)
        assert abs(gsc - sc) < 1e-12, (d, gsc, sc)


def test_ltr_trees_rerank(spark, tiny_index, sql_searcher):
    s = sql_searcher
    attrs = tiny_index.docs.select(
        "docid", F.col("doclen").cast("double").alias("dl"))
    dls = {r["docid"]: float(r["dl"]) for r in attrs.collect()}

    trees = [
        {"weight": 1.0,
         "root": {"feature": "dlf", "threshold": 55.0,
                  "left": {"value": 3.0},
                  "right": {"feature": "orig", "threshold": 2.0,
                            "left": {"value": 1.0},
                            "right": {"value": 5.0}}}},
        {"weight": 0.25,
         "root": {"feature": "orig", "threshold": 1.0,
                  "left": {"value": -4.0}, "right": {"value": 8.0}}},
    ]

    def walk(node, feats):
        if "value" in node:
            return node["value"]
        nxt = ("left" if feats[node["feature"]] <= node["threshold"]
               else "right")
        return walk(node[nxt], feats)

    q = "t000001 OR t000003"
    features = {"orig": "originalScore", "dlf": "dl"}
    got = {r["docid"]: (float(r["score"]), r["rank"]) for r in
           ltr_rerank(s, q, attrs, features,
                      model=additive_trees_model(trees),
                      rerank_docs=4, rows=10 ** 6).collect()}

    fp = _first_pass(s, q)
    window, rest = fp[:4], fp[4:]
    exp = []
    for d, sc in window:
        feats = {"orig": sc, "dlf": dls[d]}
        m = sum(t["weight"] * walk(t["root"], feats) for t in trees)
        exp.append((d, m))
    exp.sort(key=lambda t: (-t[1], t[0]))
    exp += [(d, sc) for d, sc in rest]
    for rank, (d, sc) in enumerate(exp, 1):
        gsc, grank = got[d]
        assert grank == rank, (d, grank, rank)
        assert abs(gsc - sc) < 1e-12


def test_ltr_qparser_dialect(spark, tiny_index, sql_searcher):
    """{!ltr model=<json> reRankDocs=N}: the request-string surface
    of LTRQParserPlugin wires onto ltr_rerank — same rows/scores as
    the direct call."""
    import json

    from lucene_solr_spark.search.solrq import solr_qparser

    s = sql_searcher
    attrs = tiny_index.docs.select(
        "docid", F.col("doclen").cast("double").alias("dl"))
    features = {"orig": "originalScore", "short": "if(lt(dl,60),1,0)"}
    weights = {"orig": 0.5, "short": 2.0}
    model = json.dumps({"features": features, "weights": weights})
    got = {r["docid"]: float(r["score"]) for r in solr_qparser(
        s, f"{{!ltr model='{model}' reRankDocs=5}}t000001 OR t000002",
        attrs).collect()}
    want = {r["docid"]: float(r["score"]) for r in ltr_rerank(
        s, "t000001 OR t000002", attrs, features, weights=weights,
        rerank_docs=5).collect()}
    assert got == want and len(got) == 5


def test_ltr_model_validation(sql_searcher, tiny_index):
    attrs = tiny_index.docs.select("docid")
    with pytest.raises(ValueError):
        linear_model({})
    with pytest.raises(ValueError):
        additive_trees_model([])
    with pytest.raises(ValueError):
        ltr_rerank(sql_searcher, "t000001", attrs, {"o": "originalScore"})


def test_ltr_rows_truncates(sql_searcher, tiny_index):
    """The reference rescorer returns at most `rows` docs even when
    reRankDocs exceeds it (QueryRescorer.rescore topN contract)."""
    s = sql_searcher
    attrs = tiny_index.docs.select(
        "docid", F.col("doclen").cast("double").alias("dl"))
    features = {"orig": "originalScore"}
    full = ltr_rerank(s, "t000001 OR t000002", attrs, features,
                      weights={"orig": 1.0}, rerank_docs=200).collect()
    assert len(full) > 3
    cut = ltr_rerank(s, "t000001 OR t000002", attrs, features,
                     weights={"orig": 1.0}, rerank_docs=200,
                     rows=3).collect()
    assert len(cut) == 3
    assert (sorted((r["rank"], r["docid"]) for r in cut)
            == sorted((r["rank"], r["docid"]) for r in full)[:3])
