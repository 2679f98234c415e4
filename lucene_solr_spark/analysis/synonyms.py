"""Query-time synonym graph expansion.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
synonym/SynonymGraphFilter.java (emits a token GRAPH when a synonym
spans multiple tokens) + util/QueryBuilder.java:analyzeGraphBoolean /
analyzeGraphPhrase (multi-token synonym graphs compile to queries over
the graph's finite strings). Solr wires this as the query-time
SynonymGraphFilterFactory — the recommended setup, since index-time
multi-token synonyms corrupt positions (the classic "sausageization"
problem SynonymGraphFilter exists to fix).

Spark-first mapping: the analyzed query's term leaves rewrite against
a synonym map BEFORE execution —
- all-single-token synonym sets become SynonymQ (the reference's
  SynonymQuery: one scorer over the union postings, df-blended), and
- any multi-token alternative becomes a TermAutomatonQ whose accepted
  strings are the original term plus every alternative sequence
  (exactly GraphTokenStreamFiniteStrings' enumeration) — freq counts
  distinct start positions where ANY alternative matches.

The map's values are analyzed strings ("new york", already
lowercased/tokenized by whitespace here; run your analyzer first for
anything fancier).
"""

from __future__ import annotations

from lucene_solr_spark.search import ast as A


def _analyze_seq(s: str) -> tuple[str, ...]:
    return tuple(w.lower() for w in s.split() if w)


def synonym_query(term: str, alternatives: list[str],
                  include_original: bool = True,
                  boost: float = 1.0) -> A.Query:
    """One term's expansion: SynonymQ when every alternative is a
    single token, else a TermAutomatonQ accepting the original and
    every alternative sequence."""
    seqs = [_analyze_seq(a) for a in alternatives if _analyze_seq(a)]
    if not seqs:
        return A.TermQ(term.lower(), boost=boost)
    if all(len(q) == 1 for q in seqs):
        terms = [q[0] for q in seqs]
        if include_original:
            terms = [term.lower()] + terms
        return A.SynonymQ(tuple(dict.fromkeys(terms)), boost=boost)
    paths = [(term.lower(),)] if include_original else []
    paths += seqs
    transitions: list[tuple] = []
    accept_state = 1
    next_state = 2
    for p in paths:
        state = 0
        for i, t in enumerate(p):
            dst = accept_state if i == len(p) - 1 else next_state
            if dst == next_state:
                next_state += 1
            transitions.append((state, dst, t))
            state = dst
    return A.TermAutomatonQ(tuple(transitions), (accept_state,),
                            boost=boost)


def expand_query_synonyms(q: A.Query,
                          synonyms: dict[str, list[str]]) -> A.Query:
    """Rewrite TermQ leaves through the synonym map; boolean
    combinators recurse. Phrase/span/multiterm leaves pass through
    unchanged (the reference expands synonyms during analysis of the
    FREE-TEXT query; quoted phrases keep their literal tokens)."""
    syn = {k.lower(): v for k, v in synonyms.items()}

    def walk(node: A.Query) -> A.Query:
        if isinstance(node, A.TermQ) and node.term in syn:
            return synonym_query(node.term, syn[node.term],
                                 boost=node.boost)
        if isinstance(node, (A.AndQ, A.OrQ)):
            kids = tuple(walk(c) for c in node.clauses)
            if isinstance(node, A.AndQ):
                return A.AndQ(kids)
            return A.OrQ(kids, min_should_match=node.min_should_match)
        if isinstance(node, A.DisMaxQ):
            return A.DisMaxQ(tuple(walk(c) for c in node.clauses),
                             tie_breaker=node.tie_breaker)
        if isinstance(node, A.NotQ):
            return A.NotQ(walk(node.positive), walk(node.negative))
        if isinstance(node, A.ReqOptQ):
            return A.ReqOptQ(walk(node.required), walk(node.optional))
        if isinstance(node, A.ConstQ):
            return A.ConstQ(walk(node.inner), boost=node.boost)
        return node

    return walk(q)
