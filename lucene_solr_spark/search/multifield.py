"""Multi-field search — FieldedQ routing + edismax qf weighting.

The reference's most-used multi-field machinery:

- a Term is (field, text) (index/Term.java); scoring a term against
  field f uses f's own df / docCount / avgdl / norms
  (search/similarities/BM25Similarity.java computes idf and norm
  cache from the PER-FIELD CollectionStatistics/TermStatistics)
- edismax ``qf`` (solr/core/src/java/org/apache/solr/search/
  ExtendedDismaxQParser.java): each user term becomes a
  DisjunctionMaxQuery across the qf fields with per-field boosts,
  tie_breaker blending; the per-term DisMax nodes combine as SHOULD
  clauses.

MultiFieldSearcher subclasses the flat Searcher: every boolean
combinator (AndQ/OrQ/NotQ/DisMaxQ/ReqOptQ/ConstQ — including the
float32-deterministic clause-key-ordered folds) is inherited and
recurses polymorphically; FieldedQ leaves dispatch to the wrapped
field's own single-field Searcher, so a fielded subtree scores
bit-identically to the same query on a standalone index of that field
(duel-tested in tests/test_multifield.py). Unqualified leaves go to
the default field (Solr's ``df`` parameter).

Scale: a cross-field query is a union/join of per-field scored frames
on docid — each field's postings scan is pruned to that field's query
terms; no field reads another field's postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.index.multifield import MultiFieldIndex
from lucene_solr_spark.search import ast as A
from lucene_solr_spark.search.executor import B, K1, Searcher

_COMBINATORS = (A.AndQ, A.OrQ, A.NotQ, A.DisMaxQ, A.ReqOptQ, A.ConstQ,
                A.MatchAllQ)


class MultiFieldSearcher(Searcher):
    """IndexSearcher over a MultiFieldIndex."""

    def __init__(self, mfi: MultiFieldIndex, mode: str = "lucene",
                 k1: float = K1, b: float = B,
                 default_field: str | None = None):
        self.mfi = mfi
        self.default_field = default_field or next(iter(mfi.fields))
        if self.default_field not in mfi.fields:
            raise ValueError(f"unknown default field {self.default_field!r}")
        total = {"doc_count": sum(it.coll_stats["doc_count"]
                                  for it in mfi.fields.values()) or 1,
                 "sum_ttf": sum(it.coll_stats["sum_ttf"]
                                for it in mfi.fields.values())}
        # shared frame backs MatchAllQ (every doc, regardless of which
        # fields it has) and search(with_url=True)
        shared = IndexTables(docs=mfi.docs, postings=None, term_stats=None,
                             coll_stats=total)
        super().__init__(shared, mode=mode, k1=k1, b=b)
        self.searchers = {f: Searcher(it, mode=mode, k1=k1, b=b)
                          for f, it in mfi.fields.items()}

    def _parse(self, s: str) -> A.Query:
        return A.parse_query(s, fields=tuple(self.searchers),
                             default_field=self.default_field)

    def matches(self, q: A.Query | str) -> DataFrame:
        if isinstance(q, str):
            q = self._parse(q)
        return self._eval(q.rewrite(), None)

    def search(self, q: A.Query | str, k: int = 10,
               with_url: bool = False) -> DataFrame:
        if isinstance(q, str):
            q = self._parse(q)
        return super().search(q, k=k, with_url=with_url)

    def search_quantized(self, q: A.Query | str, k: int = 10) -> DataFrame:
        if isinstance(q, str):
            q = self._parse(q)
        return super().search_quantized(q, k=k)

    def _eval(self, q: A.Query, scored: DataFrame | None) -> DataFrame:
        if isinstance(q, A.FieldedQ):
            if q.fld not in self.searchers:
                raise ValueError(f"unknown field {q.fld!r}")
            return self.searchers[q.fld].matches(q.inner)
        if isinstance(q, _COMBINATORS):
            return super()._eval(q, scored)
        return self.searchers[self.default_field].matches(q)


def edismax_qf(qstr: str, qf: dict[str, float],
               tie_breaker: float = 0.0,
               min_should_match: int = 1) -> A.Query:
    """The edismax main-query shape for a free-text ``q`` with field
    weights ``qf`` (ExtendedDismaxQParser: "each term is a DisMax over
    the qf fields"): per whitespace term, DisMaxQ across fields with
    the field's boost on the term; per-term nodes combine as SHOULD
    clauses with ``min_should_match``."""
    terms = [t.lower() for t in qstr.split()]
    if not terms or not qf:
        raise ValueError("edismax_qf needs terms and qf fields")
    per_term = []
    for t in terms:
        clauses = tuple(A.FieldedQ(f, A.TermQ(t, boost=w))
                        for f, w in sorted(qf.items()))
        per_term.append(clauses[0] if len(clauses) == 1
                        else A.DisMaxQ(clauses, tie_breaker=tie_breaker))
    if len(per_term) == 1:
        return per_term[0]
    return A.OrQ(tuple(per_term), min_should_match=min_should_match)
