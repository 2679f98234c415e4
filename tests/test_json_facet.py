"""JSON Facet API subset (nested bucket facets + metrics) vs an
independent pandas recomputation of the same bucket/rank semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.facets import json_facet


@pytest.fixture(scope="module")
def cat_df(spark):
    rows = []
    for i in range(400):
        rows.append((i, f"lang{i % 5}", f"src{i % 3}",
                     float((i * 37) % 100)))
    return spark.createDataFrame(
        rows, "id long, lang string, source string, score double").cache()


def _pdf(df):
    return df.toPandas()


def test_terms_facet_with_metrics(cat_df):
    out = _pdf(json_facet(cat_df, {
        "type": "terms", "field": "lang", "limit": 3,
        "metrics": {"avg_score": "avg(score)",
                    "n_src": "unique(source)"}}))
    p = _pdf(cat_df)
    g = (p.groupby("lang")
         .agg(cnt=("id", "count"), avg_score=("score", "mean"),
              n_src=("source", "nunique")).reset_index())
    g = g.sort_values(["cnt", "lang"], ascending=[False, True]).head(3)
    got = out.sort_values("lang").reset_index(drop=True)
    want = g.sort_values("lang").reset_index(drop=True)
    assert list(got["lang"]) == list(want["lang"])
    assert list(got["cnt_0"]) == list(want["cnt"])
    assert all(abs(a - b) < 1e-9
               for a, b in zip(got["avg_score"], want["avg_score"]))
    assert list(got["n_src"]) == list(want["n_src"])


def test_nested_terms_per_parent_limit(cat_df):
    out = _pdf(json_facet(cat_df, {
        "type": "terms", "field": "lang", "limit": 2,
        "facet": {"by_src": {"type": "terms", "field": "source",
                             "limit": 2,
                             "metrics": {"s": "sum(score)"}}}}))
    p = _pdf(cat_df)
    top_langs = (p.groupby("lang").size().reset_index(name="c")
                 .sort_values(["c", "lang"], ascending=[False, True])
                 .head(2)["lang"].tolist())
    assert set(out["lang"]) == set(top_langs)
    for lang in top_langs:
        sub = p[p["lang"] == lang]
        want = (sub.groupby("source")
                .agg(c=("id", "count"), s=("score", "sum"))
                .reset_index()
                .sort_values(["c", "source"], ascending=[False, True])
                .head(2))
        got = out[out["lang"] == lang].sort_values("source")
        assert list(got["source"]) == sorted(want["source"])
        wmap = dict(zip(want["source"], want["s"]))
        cmap = dict(zip(want["source"], want["c"]))
        for _, r in got.iterrows():
            assert r["cnt_1"] == cmap[r["source"]]
            assert abs(r["s"] - wmap[r["source"]]) < 1e-9
        # parent-level count rides along
        assert (got["cnt_0"] == len(sub)).all()


def test_range_facet_nested_under_terms(cat_df):
    out = _pdf(json_facet(cat_df, {
        "type": "terms", "field": "source", "limit": 3,
        "facet": {"rng": {"type": "range", "field": "score",
                          "start": 0.0, "end": 100.0, "gap": 25.0}}}))
    p = _pdf(cat_df)
    p["score_bucket"] = (p["score"] // 25.0) * 25.0
    for src in p["source"].unique():
        sub = p[(p["source"] == src) & (p["score"] >= 0)
                & (p["score"] < 100)]
        want = sub.groupby("score_bucket").size()
        got = out[out["source"] == src]
        gmap = dict(zip(got["score_bucket"], got["cnt_1"]))
        assert gmap == dict(want)


def test_percentile_metric(cat_df):
    out = _pdf(json_facet(cat_df, {
        "type": "terms", "field": "lang", "limit": 5,
        "metrics": {"p50": "percentile(score, 0.5)",
                    "p90": "percentile(score, 0.9)"}}))
    p = _pdf(cat_df)
    for _, r in out.iterrows():
        sub = p[p["lang"] == r["lang"]]["score"]
        assert abs(r["p50"] - sub.quantile(0.5)) < 1e-9
        assert abs(r["p90"] - sub.quantile(0.9, interpolation="linear")) \
            < 1e-9


def test_query_facet_bucket(cat_df):
    """'query' facet: one predicate bucket, children nest under the
    filtered frame (QueryFacetProcessor)."""
    out = _pdf(json_facet(cat_df, {
        "type": "query", "q": "score >= 50",
        "metrics": {"mx": "max(score)"},
        "facet": {"by_lang": {"type": "terms", "field": "lang",
                              "limit": 2}}}))
    p = _pdf(cat_df)
    sub = p[p["score"] >= 50]
    assert (out["cnt_0"] == len(sub)).all()
    assert (abs(out["mx"] - sub["score"].max()) < 1e-12).all()
    want = (sub.groupby("lang").size().reset_index(name="c")
            .sort_values(["c", "lang"], ascending=[False, True])
            .head(2))
    got = dict(zip(out["lang"], out["cnt_1"]))
    assert got == dict(zip(want["lang"], want["c"]))


def test_index_sort_and_errors(cat_df):
    out = _pdf(json_facet(cat_df, {"type": "terms", "field": "lang",
                                   "limit": 2, "sort": "index"}))
    assert list(out["lang"]) == ["lang0", "lang1"]
    with pytest.raises(ValueError):
        json_facet(cat_df, {"type": "terms", "field": "lang",
                            "metrics": {"bad": "median(score)"}})
    with pytest.raises(ValueError):
        json_facet(cat_df, {"type": "heatmap", "field": "lang"})
    with pytest.raises(ValueError):
        json_facet(cat_df, {"type": "terms", "field": "lang",
                            "facet": {"a": {"type": "terms",
                                            "field": "source"},
                                      "b": {"type": "terms",
                                            "field": "source"}}})
