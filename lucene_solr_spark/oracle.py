"""Pure-numpy reference oracle: exhaustive BM25 top-k, no Spark.

Implements exactly the semantics cited in SURVEY §2.10 / FIXTURES §4:
byte315 norms, float32 weights and per-term scores, float64 clause
accumulation in canonical clause-key order with a final float32
downcast, tie-break (score desc, docid asc). The Spark engine must be
rank- and bit-identical to this on any corpus.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from lucene_solr_spark.analysis.standard import analyze
from lucene_solr_spark.functions.bm25 import BM25, length_norm_byte
from lucene_solr_spark.search import ast as A


class OracleIndex:
    """In-memory exhaustive index over (docid, text) pairs."""

    def __init__(self, docs: list[tuple[int, str]], k1: float = 1.2, b: float = 0.75):
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doclen: dict[int, int] = {}
        self.norm_byte: dict[int, int] = {}
        for docid, text in docs:
            toks = analyze(text)
            self.doclen[docid] = len(toks)
            self.norm_byte[docid] = (
                int(length_norm_byte(len(toks))) if toks else 0
            )
            per_term: dict[str, list[int]] = defaultdict(list)
            for term, pos in toks:
                per_term[term].append(pos)
            for term, positions in per_term.items():
                self.postings[term][docid] = positions
        self.doc_count = len(docs)
        self.sum_ttf = sum(self.doclen.values())
        self.bm25 = BM25(self.doc_count, self.sum_ttf, k1=k1, b=b)

    # -- scoring ---------------------------------------------------------

    def _term_scores(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        plist = self.postings.get(term)
        if not plist:
            return {}
        df = len(plist)
        w = self.bm25.term_weight(df, boost)
        out = {}
        for docid, positions in plist.items():
            out[docid] = self.bm25.score(
                w, np.int64(len(positions)), np.uint8(self.norm_byte[docid])
            )
        return out

    def _phrase_scores(self, terms: tuple[str, ...], boost: float = 1.0) -> dict[int, np.float32]:
        plists = [self.postings.get(t) for t in terms]
        if any(p is None for p in plists):
            return {}
        docids = set(plists[0])
        for p in plists[1:]:
            docids &= set(p)
        idf_sum64 = float(sum(self.bm25.idf(len(p)) for p in plists))
        weight = np.float32(
            np.float32(boost) * np.float32(idf_sum64) * np.float32(self.bm25.k1 + np.float32(1)))
        out = {}
        for d in docids:
            base = np.asarray(plists[0][d], dtype=np.int64)
            for off, p in enumerate(plists[1:], start=1):
                base = np.intersect1d(base, np.asarray(p[d], dtype=np.int64) - off,
                                      assume_unique=True)
                if base.size == 0:
                    break
            if base.size:
                out[d] = self.bm25.score(weight, np.int64(base.size),
                                         np.uint8(self.norm_byte[d]))
        return out

    def evaluate(self, q: A.Query) -> dict[int, np.float32]:
        """docid -> float32 score, with the engine's canonical clause
        ordering (sorted clause keys, float64 accumulation)."""
        q = q.rewrite()
        if isinstance(q, A.TermQ):
            return self._term_scores(q.term, q.boost)
        if isinstance(q, A.PhraseQ):
            if q.slop != 0:
                raise NotImplementedError
            return self._phrase_scores(q.terms, q.boost)
        if isinstance(q, A.MatchAllQ):
            return {d: np.float32(q.boost) for d in self.doclen}
        if isinstance(q, A.ConstQ):
            return {d: np.float32(q.boost) for d in self.evaluate(q.inner)}
        if isinstance(q, A.AndQ):
            clauses = sorted(q.clauses, key=lambda c: c.key())
            maps = [self.evaluate(c) for c in clauses]
            docids = set(maps[0])
            for m in maps[1:]:
                docids &= set(m)
            out = {}
            for d in docids:
                acc = np.float64(0.0)
                for m in maps:
                    acc = acc + np.float64(m[d])
                out[d] = np.float32(acc)
            return out
        if isinstance(q, A.OrQ):
            clauses = sorted(q.clauses, key=lambda c: c.key())
            maps = [(c.key(), self.evaluate(c)) for c in clauses]
            matched = Counter()
            per_doc: dict[int, list[tuple[str, np.float32]]] = defaultdict(list)
            for key, m in maps:
                for d, s in m.items():
                    matched[d] += 1
                    per_doc[d].append((key, s))
            out = {}
            for d, pairs in per_doc.items():
                if matched[d] < q.min_should_match:
                    continue
                acc = np.float64(0.0)
                for _, s in sorted(pairs):
                    acc = acc + np.float64(s)
                out[d] = np.float32(acc)
            return out
        if isinstance(q, A.NotQ):
            pos = self.evaluate(q.positive)
            neg = self.evaluate(q.negative)
            return {d: s for d, s in pos.items() if d not in neg}
        raise TypeError(type(q).__name__)

    def top_k(self, q: A.Query | str, k: int = 10) -> list[tuple[int, np.float32]]:
        """Exhaustive top-k, (score desc, docid asc)."""
        if isinstance(q, str):
            q = A.parse_query(q)
        scores = self.evaluate(q)
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return ranked[:k]
