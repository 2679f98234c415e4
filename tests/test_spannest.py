"""spannest evaluator: exactness for width-1 sub-spans (terms and ORs
of terms) against a brute-force all-chains reference, plus the
documented emission rules."""

from __future__ import annotations

import itertools

import numpy as np

from lucene_solr_spark.search import ast as A
from lucene_solr_spark.search.spannest import (emit_spans, leaf_terms,
                                               nested_match, slot_groups)


def _brute_match(slots: list[np.ndarray], slop: int) -> bool:
    """All-chains reference for width-1 slots: positions p_1..p_m with
    p_i + 1 <= p_{i+1} and total gap sum(p_{i+1} - (p_i + 1)) <= slop."""
    for chain in itertools.product(*slots):
        ok = all(chain[i] + 1 <= chain[i + 1]
                 for i in range(len(chain) - 1))
        gap = sum(chain[i + 1] - chain[i] - 1
                  for i in range(len(chain) - 1))
        if ok and gap <= slop:
            return True
    return False


def test_fuzz_width1_exact():
    rng = np.random.default_rng(11)
    for trial in range(300):
        m = int(rng.integers(2, 5))
        slop = int(rng.integers(0, 6))
        slots = [np.unique(rng.integers(0, 25, rng.integers(1, 5)))
                 for _ in range(m)]
        pos = {f"t{i}": slots[i] for i in range(m)}
        q = A.SpanNearNQ(tuple(f"t{i}" for i in range(m)), slop=slop)
        got = nested_match(q, pos)
        want = _brute_match(slots, slop)
        assert got == want, (trial, slop, [list(s) for s in slots])


def test_fuzz_or_slots_exact():
    rng = np.random.default_rng(12)
    for trial in range(200):
        slop = int(rng.integers(0, 5))
        a = np.unique(rng.integers(0, 20, rng.integers(0, 4)))
        b = np.unique(rng.integers(0, 20, rng.integers(0, 4)))
        c = np.unique(rng.integers(0, 20, rng.integers(1, 4)))
        if len(a) + len(b) == 0:
            continue
        pos = {"a": a, "b": b, "c": c}
        q = A.SpanNearNQ((A.SpanOrNQ(("a", "b")), "c"), slop=slop)
        got = nested_match(q, pos)
        want = _brute_match([np.union1d(a, b), c], slop)
        assert got == want, (trial, slop, list(a), list(b), list(c))


def test_emission_dedup_and_order():
    pos = {"a": np.array([1, 5]), "b": np.array([2, 6])}
    s, e = emit_spans(A.SpanOrNQ(("a", "b", "a")), pos)
    assert list(s) == [1, 2, 5, 6] and list(e) == [2, 3, 6, 7]
    s, e = emit_spans(A.SpanNearNQ(("a", "b"), slop=0), pos)
    assert list(zip(s, e)) == [(1, 3), (5, 7)]


def test_nested_near_greedy_rule():
    # inner near emits per-start minimal chains; outer chains on them
    pos = {"a": np.array([0]), "b": np.array([2, 4]), "c": np.array([3])}
    inner = A.SpanNearNQ(("a", "b"), slop=1)   # (0,3) via b@2 (greedy)
    s, e = emit_spans(inner, pos)
    assert list(zip(s, e)) == [(0, 3)]
    outer = A.SpanNearNQ((inner, "c"), slop=0)  # c@3 starts at end 3
    assert nested_match(outer, pos)
    # c before the inner chain: no ordered match
    assert not nested_match(A.SpanNearNQ(("c", inner), slop=0), pos)


def test_slot_groups_shape():
    q = A.SpanNearNQ(
        (A.SpanOrNQ(("x", "y")),
         A.SpanNearNQ(("u", "v"), slop=1),
         "w"), slop=2)
    assert slot_groups(q) == [("x", "y"), ("u",), ("v",), ("w",)]
    assert leaf_terms(q) == {"x", "y", "u", "v", "w"}
    # or-over-nested collapses to one leaf-union group (conservative)
    q2 = A.SpanOrNQ((A.SpanNearNQ(("u", "v"), slop=0), "w"))
    assert slot_groups(q2) == [("u", "v", "w")]


def test_missing_terms():
    pos = {"a": np.array([1])}
    assert not nested_match(A.SpanNearNQ(("a", "zz"), slop=3), pos)
    assert nested_match(
        A.SpanNearNQ((A.SpanOrNQ(("zz", "a")), "a"), slop=5),
        {"a": np.array([1, 4])})
