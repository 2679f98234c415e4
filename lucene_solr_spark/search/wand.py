"""Block-max WAND top-k execution over the segment index (M3).

The read path of EP2 (SURVEY §3) at block granularity:

  reference                                this engine
  ---------                                -----------
  per-leaf scorer tree + BulkScorer        one applyInPandas group per
    (IndexSearcher.search(leaves,...))       segment, numpy kernel inside
  ConjunctionDISI leapfrog / WAND          interval sweep over the merged
    (ConjunctionDISI.java:193-227;           block-boundary grid with
     Broder et al. CIKM'03)                  block-max pruning
  block-max metadata (extension per        per-block (max_tf, max_norm)
    Ding & Suel SIGIR'11 — this Lucene       -> float32 score upper bound
    snapshot predates impacts)               via BM25.block_max_bound
  multi-level skip list advance()          numpy searchsorted over the
    (Lucene50SkipReader)                     skip_last_doc arrays (log-time)
  TopScoreDocCollector bounded heap        per-segment top-k arrays with
    (TopScoreDocCollector.java:63-80)        float32 threshold theta
  TopDocs.merge tie-breaks                 global ORDER BY score DESC,
    (TopDocs.java:96-110)                    docid ASC LIMIT k (tiny input:
                                             k rows per segment)

Correctness invariants (duel-tested against the flat executor and the
numpy oracle):

- Exact float32 score parity: per-term score = float32 BM25 with
  byte315 norms; multi-term sums accumulate in float64 in canonical
  clause-key order (sorted term) and downcast — identical to
  executor.py's fold, so WAND and exhaustive results are bit-equal.
- Safe pruning: an interval is skipped only when
  float32(sum_f64 of per-term block bounds) <= theta. Per-doc score
  is float32(sum_f64 of per-term scores) with each term score <= its
  block bound; float64 summation of <=2048 float32 terms is exact and
  round-to-nearest is monotone, so skipped intervals cannot contain a
  doc that beats the heap bottom (equal scores lose the docid
  tie-break to earlier-collected docs because intervals are processed
  in docid order — the same reasoning as TopScoreDocCollector's
  ``score <= pqTop.score`` reject).

Scale: one Spark task per segment; each task touches only the query
terms' posting rows (term-pruned parquet read), decodes only blocks
whose bound beats theta, and emits k rows. The driver-side merge is
O(segments * k).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_solr_spark.functions.bm25 import BM25
from lucene_solr_spark.index.codec import (
    EncodedPosting,
    block_last_docs,
    decode_nth_block,
)
from lucene_solr_spark.index.segments import SegmentIndex
from lucene_solr_spark.search import ast as A


@dataclass
class WandStats:
    """Pruning telemetry (per kernel call)."""
    blocks_total: int = 0
    blocks_decoded: int = 0
    intervals_total: int = 0
    intervals_scored: int = 0


def _block_bounds(bm25: BM25, w, ep) -> np.ndarray:
    """Per logical block score upper bounds. Baseline: the single
    (max_tf, max_norm) pair. When the posting carries impact frontiers
    (impacts_tf/impacts_norm per FULL block — codec.impact_frontier),
    full blocks tighten to max over the pareto pairs: the true
    in-block maximum is attained on the skyline, so this bound is
    exact-per-block instead of the corner overestimate (high-tf docs
    that are long no longer inflate the bound). Tail/singleton blocks
    keep the baseline pair."""
    base = bm25.block_max_bound(
        w,
        np.asarray(ep.blockmax_tf, dtype=np.int64),
        np.asarray(ep.blockmax_norm, dtype=np.int64)).astype(np.float32)
    imp_tf = getattr(ep, "impacts_tf", None)
    if imp_tf:
        counts = np.fromiter((len(x) for x in imp_tf), dtype=np.int64,
                             count=len(imp_tf))
        if counts.sum() and (counts > 0).all():
            flat_tf = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in imp_tf])
            flat_nb = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in ep.impacts_norm])
            s = bm25.score(np.full(len(flat_tf), np.float32(w), np.float32),
                           flat_tf, flat_nb)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            tight = np.maximum.reduceat(s, starts)
            n = len(counts)
            base[:n] = np.minimum(base[:n], tight)
    return base


def _decode_block_cached(ep, j: int):
    """decode_nth_block through the worker-global decoded-array LRU
    (enabled when the posting carries a cache_key — set by
    _grouped_postings; arrays are shared READ-ONLY, the kernel only
    slices them)."""
    ck = getattr(ep, "cache_key", None)
    if ck is None:
        return decode_nth_block(ep, j)
    hit = _lru_get(_DECODED_CACHE, (ck, j))
    if hit is None:
        hit = decode_nth_block(ep, j)
        _lru_put(_DECODED_CACHE, (ck, j), hit, _DECODED_CACHE_BLOCKS)
    return hit


def _decode_full_cached(ep) -> tuple[np.ndarray, np.ndarray]:
    """Full (docids, tfs) of a posting through the worker-global
    decoded-postings LRU (element-budgeted; keyed on the immutable
    index cell like _PAYLOAD_CACHE — the reused-enum discipline of
    Lucene50PostingsReader's postings reuse). Arrays are shared
    READ-ONLY."""
    from lucene_solr_spark.index.codec import decode_posting

    ck = getattr(ep, "cache_key", None)
    if ck is None:
        return decode_posting(ep)
    hit = _lru_get(_FULLDEC_CACHE, ck)
    if hit is None:
        FULLDEC_STATS["misses"] += 1
        hit = decode_posting(ep)
        global _FULLDEC_ELEMS
        _FULLDEC_ELEMS += len(hit[0])
        _FULLDEC_CACHE[ck] = hit
        while _FULLDEC_ELEMS > _FULLDEC_CACHE_MAX_ELEMS and len(_FULLDEC_CACHE) > 1:
            _, old = _FULLDEC_CACHE.popitem(last=False)
            _FULLDEC_ELEMS -= len(old[0])
            FULLDEC_STATS["evictions"] += 1
    else:
        FULLDEC_STATS["hits"] += 1
    return hit


# sum-of-df crossover below which the vectorized exhaustive scorer
# beats the per-interval WAND sweep (the sweep's Python loop costs
# ~10-25 ms/query on 65k-doc segments while one fused numpy pass over
# every posting costs ~1-3 ms; at production segment sizes the sweep's
# theta pruning wins and this path steps aside). Env-tunable.
import os as _os_mod

EXHAUSTIVE_MAX_NDOCS = int(
    _os_mod.environ.get("LSS_EXHAUSTIVE_MAX_NDOCS", str(1 << 19)))


def exhaustive_topk(
    postings: dict[str, EncodedPosting],
    weights: dict[str, np.float32],
    norms: np.ndarray,
    doc_base: int,
    bm25: BM25,
    k: int,
    msm: int = 1,
    exclude: np.ndarray | None = None,
    stats: WandStats | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized exhaustive boolean scorer for ONE segment — the
    BooleanScorer bulk-scoring tier (search/BooleanScorer.java scores
    whole 2048-doc windows without advancing iterators when pruning
    can't pay): every term's posting is fully decoded (worker-global
    LRU) and scored in ONE fused numpy pass, f64 accumulation in
    sorted-term (clause-key) order, downcast at the end — BIT-EQUAL to
    wand_topk on every input (duel-gated), just a different cost
    model. Dominates below EXHAUSTIVE_MAX_NDOCS summed df; above it
    the WAND sweep's theta pruning wins."""
    terms = sorted(postings)
    m = len(terms)
    if m < msm or m == 0:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    st = stats if stats is not None else WandStats()
    d_parts: list[np.ndarray] = []
    s_parts: list[np.ndarray] = []
    for t in terms:
        d, tf = _decode_full_cached(postings[t])
        st.blocks_decoded += max(1, len(d) // 128)
        s_parts.append(bm25.score(
            np.full(len(d), np.float32(weights[t]), np.float32),
            tf, norms[d - doc_base]))
        d_parts.append(d)
    uniq = np.unique(np.concatenate(d_parts))
    acc = np.zeros(len(uniq), dtype=np.float64)
    cnt = np.zeros(len(uniq), dtype=np.int32)
    for d, s in zip(d_parts, s_parts):  # term-sorted order fold
        if len(d) == 0:
            continue
        idx = np.searchsorted(uniq, d)
        acc[idx] += s.astype(np.float64)
        cnt[idx] += 1
    mask = cnt >= msm
    if exclude is not None and len(exclude) and mask.any():
        mask &= ~np.isin(uniq, exclude, assume_unique=True)
    if not mask.any():
        return np.empty(0, np.int64), np.empty(0, np.float32)
    cand_d = uniq[mask]
    cand_s = acc[mask].astype(np.float32)
    order = np.lexsort((cand_d, -cand_s.astype(np.float64)))[:k]
    return cand_d[order], cand_s[order]


def synonym_topk(
    postings: dict[str, EncodedPosting],
    w32: np.float32,
    norms: np.ndarray,
    doc_base: int,
    bm25: BM25,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """SynonymQuery.java on the segment tier: the terms' postings
    union with tf SUMMED per doc (integer, order-free), scored ONCE as
    a pseudo-term with the blended weight — bit-equal to the flat
    _eval_synonym (duel-gated)."""
    terms = sorted(postings)
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    d_parts = []
    tf_parts = []
    for t in terms:
        d, tf = _decode_full_cached(postings[t])
        d_parts.append(d)
        tf_parts.append(tf)
    uniq = np.unique(np.concatenate(d_parts))
    tf_sum = np.zeros(len(uniq), dtype=np.int64)
    for d, tf in zip(d_parts, tf_parts):
        np.add.at(tf_sum, np.searchsorted(uniq, d), tf)
    s32 = bm25.score(np.full(len(uniq), np.float32(w32), np.float32),
                     tf_sum, norms[uniq - doc_base])
    order = np.lexsort((uniq, -s32.astype(np.float64)))[:k]
    return uniq[order], s32[order]


def dismax_terms_topk(
    postings: dict[str, EncodedPosting],
    weights: dict[str, np.float32],
    tie: float,
    norms: np.ndarray,
    doc_base: int,
    bm25: BM25,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """DisjunctionMaxQuery over term clauses on the segment tier:
    per-term f32 scores, f64 max + tie*(sum-max) (DisjunctionMax
    Scorer.java:36-61), downcast — bit-equal to the flat _eval_dismax
    over TermQ clauses (duel-gated)."""
    terms = sorted(postings)  # clause key "t:<term>" order == sorted
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    d_parts, s_parts = [], []
    for t in terms:
        d, tf = _decode_full_cached(postings[t])
        s_parts.append(bm25.score(
            np.full(len(d), np.float32(weights[t]), np.float32),
            tf, norms[d - doc_base]))
        d_parts.append(d)
    uniq = np.unique(np.concatenate(d_parts))
    mx = np.full(len(uniq), -np.inf, dtype=np.float64)
    sm = np.zeros(len(uniq), dtype=np.float64)
    for d, s in zip(d_parts, s_parts):
        idx = np.searchsorted(uniq, d)
        s64 = s.astype(np.float64)
        np.maximum.at(mx, idx, s64)
        sm[idx] += s64
    s32 = (mx + np.float64(tie) * (sm - mx)).astype(np.float32)
    order = np.lexsort((uniq, -s32.astype(np.float64)))[:k]
    return uniq[order], s32[order]


def boolean_topk(
    postings: dict[str, EncodedPosting],
    weights: dict[str, np.float32],
    norms: np.ndarray,
    doc_base: int,
    bm25: BM25,
    k: int,
    msm: int = 1,
    exclude: np.ndarray | None = None,
    theta0: float = -np.inf,
    stats: WandStats | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Cost-model dispatch between the two bit-equal boolean scorers
    (Lucene's BooleanWeight chooses BooleanScorer vs WAND-pruned
    scorers the same way): small summed segment-local df -> the fused
    exhaustive pass; large -> the block-max WAND sweep."""
    total = sum(postings[t].ndocs for t in postings)
    if total <= EXHAUSTIVE_MAX_NDOCS:
        return exhaustive_topk(postings, weights, norms, doc_base, bm25,
                               k, msm=msm, exclude=exclude, stats=stats)
    return wand_topk(postings, weights, norms, doc_base, bm25, k,
                     msm=msm, exclude=exclude, theta0=theta0, stats=stats)


def wand_topk(
    postings: dict[str, EncodedPosting],
    weights: dict[str, np.float32],
    norms: np.ndarray,
    doc_base: int,
    bm25: BM25,
    k: int,
    msm: int = 1,
    exclude: np.ndarray | None = None,
    theta0: float = -np.inf,
    stats: WandStats | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Numpy block-max WAND kernel for ONE segment.

    postings: query term -> EncodedPosting (terms absent from the
    segment simply don't appear). weights: float32 per-term weight
    (boost * idf * (k1+1), global stats). norms: dense uint8 norm
    array indexed by docid - doc_base. msm: minimum matching terms
    (len(postings) for pure AND, 1 for OR). exclude: sorted docid
    array of MUST_NOT matches within this segment. theta0: initial
    threshold (enables cross-segment threshold passing).

    Returns (docids, scores_float32) of up to k hits sorted by
    (score desc, docid asc).
    """
    terms = sorted(postings)  # canonical clause-key order == sorted term
    m = len(terms)
    if m < msm or m == 0:
        return np.empty(0, np.int64), np.empty(0, np.float32)

    eps = [postings[t] for t in terms]
    w = [np.float32(weights[t]) for t in terms]

    # per-term logical block boundary tables + block score bounds
    last_docs: list[np.ndarray] = []
    ubs: list[np.ndarray] = []
    for t, ep in zip(terms, eps):
        # last docid of the term's posting overall:
        if ep.singleton_docid is not None:
            last = ep.singleton_docid
        elif getattr(ep, "last_doc", -1) >= 0:
            # group rows carry the exact last doc as metadata — no
            # payload IO just to learn the posting's end
            last = int(ep.last_doc)
        else:
            # tail's last doc isn't in skip data; decode lazily only if
            # needed — bound it by scanning the tail once here (cheap:
            # <128 vints) via decode_nth_block on the tail.
            if ep.has_tail:
                tdocs, _ = _decode_block_cached(ep, ep.n_full_blocks)
                last = int(tdocs[-1])
            else:
                last = int(ep.skip_last_doc[-1])
        last_docs.append(block_last_docs(ep, last))
        ubs.append(_block_bounds(bm25, weights[t], ep))

    # merged interval grid: all block boundaries, sorted unique.
    bounds = np.unique(np.concatenate(last_docs))
    n_int = len(bounds)
    # j[t, i] = term t's active block for interval i (= first block
    # whose last >= bounds[i]); >= nblocks -> exhausted.
    ub_sum = np.zeros(n_int, dtype=np.float64)
    active = np.zeros(n_int, dtype=np.int32)
    jmat = np.empty((m, n_int), dtype=np.int64)
    for ti in range(m):
        j = np.searchsorted(last_docs[ti], bounds, side="left")
        jmat[ti] = j
        ok = j < len(last_docs[ti])
        active[ok] += 1
        ub_sum[ok] += ubs[ti][j[ok]].astype(np.float64)

    st = stats if stats is not None else WandStats()
    st.blocks_total += sum(len(x) for x in last_docs)
    st.intervals_total += n_int

    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    # Cost-ordered lead-driven candidate filter (ConjunctionDISI's
    # "two cheapest lead, others confirm", ConjunctionDISI.java:181-189,
    # generalized by pigeonhole to n-of-m: every match must occur in at
    # least one of the (m - msm + 1) lowest-df terms). The leads are
    # decoded LAZILY, inside the sweep, only for intervals that survive
    # the block-max theta test — the leapfrog discipline of
    # ConjunctionDISI over Lucene50SkipReader: advance() never
    # materializes the lead stream, so theta-pruned intervals cost the
    # leads neither decode CPU nor (via the lazy group fetcher) any
    # payload IO. Only pays when msm >= 2; for pure OR the block-max
    # bound below is the only (and correct) pruning.
    leads: list[int] | None = None
    if msm >= 2:
        by_cost = sorted(range(m), key=lambda ti: eps[ti].ndocs)
        leads = by_cost[: m - msm + 1]

    # bounded collector state. TWO thresholds with different tie
    # semantics (the distinction matters — conflating them either
    # weakens pruning or drops seed-tied docs):
    # - theta: the LOCAL kth score once the heap fills; prunes <=
    #   (equal scores lose the docid tie-break to earlier-collected
    #   docs, TopScoreDocCollector's ``score <= pqTop.score`` reject).
    # - theta_seed: the cross-segment floor; prunes STRICTLY < at all
    #   times, full or not (a doc scoring below another segment's kth
    #   can never reach the global top-k; ties at the seed are KEPT so
    #   the global docid tie-break stays exact). The floor is never
    #   lowered by a local kth that sits below it.
    top_docs = np.empty(0, np.int64)
    top_scores = np.empty(0, np.float32)
    seeded = bool(np.isfinite(theta0))
    theta_seed = np.float32(theta0) if seeded else None
    theta = np.float32(-np.inf)

    excl = exclude if exclude is not None and len(exclude) else None

    # iterate only candidate intervals (msm filter applied vectorized;
    # dead intervals never enter the Python loop)
    cand_idx = np.nonzero(active >= msm)[0]
    ub32 = ub_sum.astype(np.float32)

    for i in cand_idx:
        hi = int(bounds[i])
        lo = int(bounds[i - 1]) if i > 0 else -1
        full = len(top_scores) >= k
        if full and ub32[i] <= theta:
            continue
        if seeded and ub32[i] < theta_seed:
            continue

        if leads is not None:
            # pigeonhole: skip the interval unless at least one lead
            # term has a docid inside (lo, hi] — decoding only the
            # leads' ACTIVE blocks (cached across the intervals each
            # block spans), never the expensive terms'
            hit = False
            for ti in leads:
                j = int(jmat[ti, i])
                if j >= len(last_docs[ti]):
                    continue
                key = (ti, j)
                if key not in decoded:
                    decoded[key] = _decode_block_cached(eps[ti], j)
                    st.blocks_decoded += 1
                docs_j = decoded[key][0]
                a = np.searchsorted(docs_j, lo, side="right")
                if a < len(docs_j) and docs_j[a] <= hi:
                    hit = True
                    break
            if not hit:
                continue

        # exact scoring of the interval
        st.intervals_scored += 1
        d_parts: list[np.ndarray] = []
        s_parts: list[np.ndarray] = []
        for ti in range(m):
            j = int(jmat[ti, i])
            if j >= len(last_docs[ti]):
                continue
            key = (ti, j)
            if key not in decoded:
                decoded[key] = _decode_block_cached(eps[ti], j)
                st.blocks_decoded += 1
            docs_j, tfs_j = decoded[key]
            a = np.searchsorted(docs_j, lo, side="right")
            b = np.searchsorted(docs_j, hi, side="right")
            if a == b:
                d_parts.append(np.empty(0, np.int64))
                s_parts.append(np.empty(0, np.float32))
                continue
            d = docs_j[a:b]
            tf = tfs_j[a:b]
            nb = norms[d - doc_base]
            s_parts.append(bm25.score(
                np.full(len(d), w[ti], dtype=np.float32), tf, nb))
            d_parts.append(d)

        if not d_parts:
            continue
        all_d = np.concatenate(d_parts)
        if len(all_d) == 0:
            continue
        uniq = np.unique(all_d)
        acc = np.zeros(len(uniq), dtype=np.float64)
        cnt = np.zeros(len(uniq), dtype=np.int32)
        for d, s in zip(d_parts, s_parts):  # term-sorted order fold
            if len(d) == 0:
                continue
            idx = np.searchsorted(uniq, d)
            acc[idx] += s.astype(np.float64)
            cnt[idx] += 1
        mask = cnt >= msm
        if excl is not None and mask.any():
            mask &= ~np.isin(uniq, excl, assume_unique=True)
        if not mask.any():
            continue
        cand_d = uniq[mask]
        cand_s = acc[mask].astype(np.float32)

        # collector merge: keep k best by (score desc, docid asc).
        # Earlier-collected docs have smaller docids within equal
        # scores automatically because intervals ascend in docid.
        if seeded:
            keep = cand_s >= theta_seed  # strictly-below floor dropped
            cand_d, cand_s = cand_d[keep], cand_s[keep]
        if full and len(cand_s):
            keep = cand_s > theta
            cand_d, cand_s = cand_d[keep], cand_s[keep]
        if len(cand_d) == 0:
            continue
        md = np.concatenate([top_docs, cand_d])
        ms = np.concatenate([top_scores, cand_s])
        order = np.lexsort((md, -ms.astype(np.float64)))[:k]
        top_docs, top_scores = md[order], ms[order]
        if len(top_scores) >= k:
            theta = top_scores[-1]

    return top_docs, top_scores


def _positions_flat(ep, docids: np.ndarray) -> tuple[np.ndarray,
                                                     np.ndarray]:
    """Flat (idx_rep, positions) dispatch: GroupedPosting has the
    vectorized segmented-cumsum path; anything else flattens the
    per-doc lists."""
    if hasattr(ep, "positions_flat"):
        return ep.positions_flat(docids)
    lists = _positions_for(ep, docids)
    lens = np.fromiter((len(p) for p in lists), np.int64, len(lists))
    idx = np.repeat(np.arange(len(lists), dtype=np.int64), lens)
    pos = (np.concatenate(lists) if lists
           else np.empty(0, np.int64))
    return idx, pos.astype(np.int64, copy=False)


def _positions_for(ep, docids: np.ndarray) -> list[np.ndarray]:
    """positions_for dispatch: GroupedPosting fetches its .pos payload
    lazily per group; a plain EncodedPosting (kernel-level tests)
    decodes its own pos_enc once and slices."""
    if hasattr(ep, "positions_for"):
        return ep.positions_for(docids)
    from lucene_solr_spark.index.codec import decode_posting, read_vints_arr

    cached = getattr(ep, "_pos_decoded", None)
    if cached is None:
        docs, tfs = decode_posting(ep)
        if not ep.pos_enc:
            raise ValueError("posting has no positions")
        vals = read_vints_arr(ep.pos_enc)
        starts = np.concatenate(([0], np.cumsum(tfs)))
        cached = (docs, tfs, vals, starts)
        ep._pos_decoded = cached
    docs, tfs, vals, starts = cached
    idxs = np.searchsorted(docs, np.asarray(docids, dtype=np.int64))
    out = []
    for ii in idxs:
        ii = int(ii)
        s, t = int(starts[ii]), int(tfs[ii])
        out.append(np.cumsum(vals[s:s + t]))
    return out


def phrase_topk(
    terms: list[str],
    postings: dict[str, "object"],
    weight: np.float32,
    norms: np.ndarray,
    doc_base: int,
    bm25: BM25,
    k: int,
    slop: int = 0,
    stats: WandStats | None = None,
    collect_freqs: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Segment-native two-phase phrase kernel — the reference's
    ExactPhraseScorer discipline (search/ExactPhraseScorer.java:62,123:
    ConjunctionDISI.intersectIterators drives docids, phraseFreq runs
    only on the intersection, behind search/TwoPhaseIterator.java)
    instead of a full posting decode:

    phase 1 (approximation): interval sweep over the merged block grid
    of the phrase's DISTINCT terms; an interval is live only where ALL
    terms have an active block. Surviving intervals decode blocks
    cheapest-term-first and intersect docids, so a (rare, zipf-head)
    phrase does O(df_rare) work — the head term's blocks are decoded
    only in intervals the rare term reaches, and its .pos stream only
    for groups holding intersection docs.

    phase 2 (verify): positions are fetched lazily per GROUP for
    intersection docs only (GroupedPosting.positions_for), rebased per
    slot, and matched — vectorized intersect for slop=0, the reference
    SloppyPhraseScorer traversal for slop>0.

    Pruning (skipped when ``collect_freqs``): per-interval score bound
    = f32(weight, tf_bound, min-over-terms block-max norm byte) with
    tf_bound = min-over-terms block-max tf for slop=0 (each phrase
    occurrence consumes one occurrence of every slot) or the
    slot-multiplicity-weighted sum for slop>0 (sloppy freq adds <= 1
    per PhrasePositions advance; advances <= sum of slot tfs). The
    bound dominates any in-interval doc's score (score is monotone in
    tf and norm byte; float32 rounding is monotone), so skipped
    intervals cannot beat theta — the block-max WAND safety argument.

    weight: f32(boost * f32(sum idf over the SLOT array) * (k1+1)) —
    the flat executor's phrase weight, so scores duel bit-equal.

    Returns top-k (docids, float32 scores) by (score desc, docid asc);
    with ``collect_freqs`` returns ALL matches' (docids, float64
    phrase freqs) and applies no theta pruning.
    """
    uniq = sorted(set(terms))
    m = len(uniq)
    if m == 0 or any(t not in postings for t in uniq):
        return np.empty(0, np.int64), np.empty(0, np.float32)
    eps = [postings[t] for t in uniq]
    mult = {t: terms.count(t) for t in uniq}

    last_docs: list[np.ndarray] = []
    for t, ep in zip(uniq, eps):
        if ep.singleton_docid is not None:
            last = ep.singleton_docid
        elif getattr(ep, "last_doc", -1) >= 0:
            last = int(ep.last_doc)
        elif ep.has_tail:
            last = int(_decode_block_cached(ep, ep.n_full_blocks)[0][-1])
        else:
            last = int(ep.skip_last_doc[-1])
        last_docs.append(block_last_docs(ep, last))

    bounds = np.unique(np.concatenate(last_docs))
    n_int = len(bounds)
    jmat = np.empty((m, n_int), dtype=np.int64)
    active = np.zeros(n_int, dtype=np.int32)
    tf_bound = (np.full(n_int, np.iinfo(np.int32).max, dtype=np.int64)
                if slop == 0 else np.zeros(n_int, dtype=np.int64))
    nb_min = np.full(n_int, 255, dtype=np.int64)
    for ti in range(m):
        bm_tf = np.asarray(eps[ti].blockmax_tf, dtype=np.int64)
        bm_nb = np.asarray(eps[ti].blockmax_norm, dtype=np.int64)
        j = np.searchsorted(last_docs[ti], bounds, side="left")
        jmat[ti] = j
        ok = j < len(last_docs[ti])
        active[ok] += 1
        if slop == 0:
            tf_bound[ok] = np.minimum(tf_bound[ok], bm_tf[j[ok]])
        else:
            tf_bound[ok] += mult[uniq[ti]] * bm_tf[j[ok]]
        nb_min[ok] = np.minimum(nb_min[ok], bm_nb[j[ok]])

    st = stats if stats is not None else WandStats()
    st.blocks_total += sum(len(x) for x in last_docs)
    st.intervals_total += n_int

    ub32 = bm25.score(np.full(n_int, np.float32(weight), np.float32),
                      tf_bound, nb_min)
    cand_idx = np.nonzero(active == m)[0]
    by_cost = sorted(range(m), key=lambda ti: eps[ti].ndocs)
    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    groups = [[i for i, t in enumerate(terms) if t == d]
              for d in uniq if mult[d] > 1] or None
    if slop > 0:
        from lucene_solr_spark.search.executor import _sloppy_phrase_freq

    top_docs = np.empty(0, np.int64)
    top_scores = np.empty(0, np.float32)
    theta = np.float32(-np.inf)
    out_d: list[np.ndarray] = []
    out_f: list[np.ndarray] = []

    for i in cand_idx:
        hi = int(bounds[i])
        lo = int(bounds[i - 1]) if i > 0 else -1
        full = len(top_scores) >= k
        if not collect_freqs and full and ub32[i] <= theta:
            continue

        # phase 1: docid conjunction, cheapest term's block first
        inter: np.ndarray | None = None
        for ti in by_cost:
            j = int(jmat[ti, i])
            key = (ti, j)
            if key not in decoded:
                decoded[key] = _decode_block_cached(eps[ti], j)
                st.blocks_decoded += 1
            docs_j = decoded[key][0]
            a = np.searchsorted(docs_j, lo, side="right")
            b = np.searchsorted(docs_j, hi, side="right")
            d = docs_j[a:b]
            if len(d) == 0:
                inter = None
                break
            inter = d if inter is None else np.intersect1d(
                inter, d, assume_unique=True)
            if len(inter) == 0:
                inter = None
                break
        if inter is None or len(inter) == 0:
            continue
        st.intervals_scored += 1

        # phase 2: positions verify on the intersection only
        nd = len(inter)
        freqs = np.zeros(nd, dtype=np.float64)
        if slop == 0:
            # vectorized across ALL intersection docs at once: fold
            # per-slot compound keys (doc_index << 33 | rebased
            # position) through one sorted intersect per slot — no
            # per-doc Python loop (hot-hot phrases have large
            # intersections; per-doc work was the phase-2 bottleneck).
            # Keys are unique (positions unique per doc) and sorted
            # (docs ascend, rebased positions ascend within a doc).
            max_off = len(terms)
            flat = {t: _positions_flat(postings[t], inter) for t in uniq}
            base: np.ndarray | None = None
            for off, t in enumerate(terms):
                di_rep, pos = flat[t]
                keys = (di_rep << 33) | (pos - off + max_off)
                base = keys if base is None else np.intersect1d(
                    base, keys, assume_unique=True)
                if base.size == 0:
                    break
            if base is not None and base.size:
                di_surv, counts = np.unique(base >> 33,
                                            return_counts=True)
                freqs[di_surv] = counts.astype(np.float64)
        else:
            pos_by_term = {t: _positions_for(postings[t], inter)
                           for t in uniq}
            for di in range(nd):
                rebased = [pos_by_term[t][di] - off
                           for off, t in enumerate(terms)]
                freqs[di] = _sloppy_phrase_freq(rebased, slop, groups)
        mask = freqs > 0
        if not mask.any():
            continue
        cand_d = inter[mask]
        f = freqs[mask]
        if collect_freqs:
            out_d.append(cand_d)
            out_f.append(f)
            continue

        nb = norms[cand_d - doc_base]
        cand_s = bm25.score(
            np.full(len(cand_d), np.float32(weight), np.float32), f, nb)
        if full and len(cand_s):
            keep = cand_s > theta
            cand_d, cand_s = cand_d[keep], cand_s[keep]
        if len(cand_d) == 0:
            continue
        md = np.concatenate([top_docs, cand_d])
        ms = np.concatenate([top_scores, cand_s])
        order = np.lexsort((md, -ms.astype(np.float64)))[:k]
        top_docs, top_scores = md[order], ms[order]
        if len(top_scores) >= k:
            theta = top_scores[-1]

    if collect_freqs:
        if not out_d:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(out_d), np.concatenate(out_f)
    return top_docs, top_scores


def span_near_topk(
    first: str,
    second: str,
    postings: dict[str, "object"],
    boost: float,
    k: int,
    slop: int = 0,
    in_order: bool = True,
    stats: WandStats | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Segment-native two-phase SpanNear kernel (search/spans/
    SpanNearQuery.java semantics, the flat executor's pair condition):
    a doc matches when some occurrence pair satisfies
    0 < p2 - p1 <= slop + 1 (in_order) or 0 < |p2 - p1| <= slop + 1
    (unordered).

    phase 1: AND-mode interval sweep over the two terms' merged block
    grid — identical discipline to phrase_topk (intervals live only
    where BOTH terms have an active block; cheapest block decodes
    first, docids intersect). phase 2: .pos payloads are fetched
    lazily per group for intersection docs only; the pair test is a
    vectorized double-searchsorted, no per-position Python loop.

    The score is CONSTANT (float32(boost), the flat executor's span
    score), so theta pruning degenerates to early termination: matches
    arrive in ascending docid order and equal scores lose the
    (score desc, docid asc) tie-break to earlier docids, so the sweep
    stops after the first k matches — O(first-k) block decodes for
    head terms instead of O(df).

    Returns (docids, float32 scores) — at most k, ascending docid.
    """
    if first not in postings or second not in postings:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    uniq = sorted({first, second})
    eps = [postings[t] for t in uniq]
    m = len(uniq)
    last_docs = [_term_block_grid(ep) for ep in eps]
    bounds = np.unique(np.concatenate(last_docs))
    n_int = len(bounds)
    jmat = np.empty((m, n_int), dtype=np.int64)
    active = np.zeros(n_int, dtype=np.int32)
    for ti in range(m):
        j = np.searchsorted(last_docs[ti], bounds, side="left")
        jmat[ti] = j
        active[j < len(last_docs[ti])] += 1

    st = stats if stats is not None else WandStats()
    st.blocks_total += sum(len(x) for x in last_docs)
    st.intervals_total += n_int
    cand_idx = np.nonzero(active == m)[0]
    by_cost = sorted(range(m), key=lambda ti: eps[ti].ndocs)
    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    win = slop + 1
    hits: list[np.ndarray] = []
    n_hits = 0

    for i in cand_idx:
        if n_hits >= k:
            break
        hi = int(bounds[i])
        lo = int(bounds[i - 1]) if i > 0 else -1
        inter: np.ndarray | None = None
        for ti in by_cost:
            j = int(jmat[ti, i])
            key = (ti, j)
            if key not in decoded:
                decoded[key] = _decode_block_cached(eps[ti], j)
                st.blocks_decoded += 1
            docs_j = decoded[key][0]
            a = np.searchsorted(docs_j, lo, side="right")
            b = np.searchsorted(docs_j, hi, side="right")
            d = docs_j[a:b]
            if len(d) == 0:
                inter = None
                break
            inter = d if inter is None else np.intersect1d(
                inter, d, assume_unique=True)
            if len(inter) == 0:
                inter = None
                break
        if inter is None or len(inter) == 0:
            continue
        st.intervals_scored += 1
        # self-pair guard: first == second still needs two distinct
        # occurrences, which the y != x / y > x conditions encode
        p1s = _positions_for(postings[first], inter)
        p2s = (p1s if second == first
               else _positions_for(postings[second], inter))
        keep = np.zeros(len(inter), dtype=bool)
        for di in range(len(inter)):
            p1, p2 = p1s[di], p2s[di]
            # in-order: exists y in (x, x + win]
            lo_i = np.searchsorted(p2, p1, side="right")
            hi_i = np.searchsorted(p2, p1 + win, side="right")
            ok = bool((hi_i > lo_i).any())
            if not ok and not in_order:
                # reverse: exists y in [x - win, x)
                lo_r = np.searchsorted(p2, p1 - win, side="left")
                hi_r = np.searchsorted(p2, p1, side="left")
                ok = bool((hi_r > lo_r).any())
            keep[di] = ok
        matched = inter[keep]
        if len(matched):
            hits.append(matched)
            n_hits += len(matched)

    if not hits:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    d = np.concatenate(hits)[:k]
    return d, np.full(len(d), np.float32(boost), np.float32)


def span_nested_topk(
    node,
    postings: dict[str, "object"],
    boost: float,
    k: int,
    stats: WandStats | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Segment-native NESTED span kernel (SpanNearNQ/SpanOrNQ trees):
    the lazy DISI composition of search/spans/NearSpansOrdered.java +
    SpanOrQuery.java, expressed as the two-phase discipline the other
    positional kernels use — no full posting decode of any term.

    phase 1: interval sweep over the merged block grid of every leaf
    term, conjunction over spannest.slot_groups (each group's docid
    set is the union of its active terms' docids — the multiphrase
    slot-union), cheapest group decodes first. phase 2: .pos payloads
    fetched lazily per group for intersection docs only; the match
    test is the SHARED spannest.emit_spans (the same function the flat
    executor runs, so duels agree bit-for-bit).

    Constant score (float32(boost), the SpanNear contract) ⇒ theta
    pruning degenerates to EXACT early termination at k matches
    (ascending docids win the (score desc, docid asc) tie-break) —
    the span_near_topk argument, inherited verbatim.
    """
    from lucene_solr_spark.search.spannest import (emit_spans,
                                                   slot_groups)

    groups = [[t for t in g if t in postings] for g in slot_groups(node)]
    if not groups or any(not g for g in groups):
        return np.empty(0, np.int64), np.empty(0, np.float32)
    uniq = sorted({t for g in groups for t in g})
    eps = {t: postings[t] for t in uniq}
    grids = {t: _term_block_grid(eps[t]) for t in uniq}
    bounds = np.unique(np.concatenate([grids[t] for t in uniq]))
    n_int = len(bounds)
    jd: dict[str, np.ndarray] = {}
    okd: dict[str, np.ndarray] = {}
    for t in uniq:
        j = np.searchsorted(grids[t], bounds, side="left")
        jd[t] = j
        okd[t] = j < len(grids[t])
    grp_act = np.ones(n_int, dtype=bool)
    for g in groups:
        act_g = np.zeros(n_int, dtype=bool)
        for t in g:
            act_g |= okd[t]
        grp_act &= act_g

    st = stats if stats is not None else WandStats()
    st.blocks_total += sum(len(grids[t]) for t in uniq)
    st.intervals_total += n_int
    cand_idx = np.nonzero(grp_act)[0]
    by_cost = sorted(range(len(groups)),
                     key=lambda gi: sum(eps[t].ndocs for t in groups[gi]))
    decoded: dict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = {}

    def _slice(t: str, i: int, lo: int, hi: int) -> np.ndarray:
        key = (t, int(jd[t][i]))
        if key not in decoded:
            decoded[key] = _decode_block_cached(eps[t], key[1])
            st.blocks_decoded += 1
        docs_j = decoded[key][0]
        a = np.searchsorted(docs_j, lo, side="right")
        b = np.searchsorted(docs_j, hi, side="right")
        return docs_j[a:b]

    hits: list[np.ndarray] = []
    n_hits = 0
    for i in cand_idx:
        if n_hits >= k:
            break
        hi = int(bounds[i])
        lo = int(bounds[i - 1]) if i > 0 else -1
        inter: np.ndarray | None = None
        for gi in by_cost:
            parts = [d for t in groups[gi] if okd[t][i]
                     for d in (_slice(t, i, lo, hi),) if len(d)]
            if not parts:
                inter = None
                break
            d_u = (parts[0] if len(parts) == 1
                   else np.unique(np.concatenate(parts)))
            inter = d_u if inter is None else np.intersect1d(
                inter, d_u, assume_unique=True)
            if len(inter) == 0:
                inter = None
                break
        if inter is None or len(inter) == 0:
            continue
        st.intervals_scored += 1
        # positions per term, only for intersection docs it contains
        nd = len(inter)
        pos_by_doc: list[dict[str, np.ndarray]] = [dict() for _ in range(nd)]
        for t in uniq:
            if not okd[t][i]:
                continue
            d_t = _slice(t, i, lo, hi)
            mask = np.isin(inter, d_t, assume_unique=True)
            if not mask.any():
                continue
            plists = _positions_for(eps[t], inter[mask])
            for oi, arr in zip(np.nonzero(mask)[0], plists):
                pos_by_doc[oi][t] = arr.astype(np.int64, copy=False)
        keep = np.zeros(nd, dtype=bool)
        for di in range(nd):
            keep[di] = len(emit_spans(node, pos_by_doc[di])[0]) > 0
        matched = inter[keep]
        if len(matched):
            hits.append(matched)
            n_hits += len(matched)

    if not hits:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    d = np.concatenate(hits)[:k]
    return d, np.full(len(d), np.float32(boost), np.float32)


def automaton_topk(
    paths: list[tuple],
    postings: dict[str, "object"],
    weight: np.float32,
    norms: np.ndarray,
    doc_base: int,
    bm25: BM25,
    k: int,
    stats: WandStats | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Segment-native TermAutomatonQuery kernel (sandbox/search/
    TermAutomatonQuery.java's TermAutomatonScorer, run over the
    enumerated finite strings like GraphTokenStreamFiniteStrings):

    ``paths``: the automaton's accepted term sequences (None = ANY
    slot, one position ordinal). phase 1: per-path docid conjunction
    over the merged block grid of the paths' terms (an interval is
    live when SOME path has all its terms active; candidates = the
    union over live paths of their term-slice intersections). phase 2:
    .pos fetched lazily per group for intersection docs only; freq =
    distinct start positions matched by ANY path (the reference's
    merge-sorted position run), via the same rebased-intersect the
    flat _eval_term_automaton runs — scores duel bit-equal.

    theta bound: freq <= sum over live paths of the path's min
    slot-level block-max tf (a start consumes >= 1 occurrence of every
    slot term of that path); monotone in tf and norm byte, so skipped
    intervals cannot beat theta. weight: the flat phrase recipe
    f32(f32(boost) * f32(sum idf over ALL automaton terms) * f32(k1+1)).
    """
    pterms = [sorted({t for t in p if t is not None}) for p in paths]
    live_paths = [i for i, ts in enumerate(pterms)
                  if ts and all(t in postings for t in ts)]
    if not live_paths:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    uniq = sorted({t for i in live_paths for t in pterms[i]})
    eps = {t: postings[t] for t in uniq}
    grids = {t: _term_block_grid(eps[t]) for t in uniq}
    bounds = np.unique(np.concatenate([grids[t] for t in uniq]))
    n_int = len(bounds)
    jd: dict[str, np.ndarray] = {}
    okd: dict[str, np.ndarray] = {}
    for t in uniq:
        j = np.searchsorted(grids[t], bounds, side="left")
        jd[t] = j
        okd[t] = j < len(grids[t])
    # per-path activity + freq bound
    path_act = np.zeros((len(live_paths), n_int), dtype=bool)
    tf_bound = np.zeros(n_int, dtype=np.int64)
    nb_min = np.full(n_int, 255, dtype=np.int64)
    for t in uniq:
        ok = okd[t]
        bm_nb = np.asarray(eps[t].blockmax_norm, dtype=np.int64)
        nb_min[ok] = np.minimum(nb_min[ok], bm_nb[jd[t][ok]])
    for pi, i0 in enumerate(live_paths):
        act = np.ones(n_int, dtype=bool)
        ptf = np.full(n_int, np.iinfo(np.int64).max, dtype=np.int64)
        for t in pterms[i0]:
            ok = okd[t]
            act &= ok
            bm_tf = np.asarray(eps[t].blockmax_tf, dtype=np.int64)
            cur = np.full(n_int, np.iinfo(np.int64).max, dtype=np.int64)
            cur[ok] = bm_tf[jd[t][ok]]
            ptf = np.minimum(ptf, cur)
        path_act[pi] = act
        tf_bound[act] += ptf[act]
    any_act = path_act.any(axis=0)

    st = stats if stats is not None else WandStats()
    st.blocks_total += sum(len(grids[t]) for t in uniq)
    st.intervals_total += n_int
    ub32 = bm25.score(np.full(n_int, np.float32(weight), np.float32),
                      np.maximum(tf_bound, 0), nb_min)
    cand_idx = np.nonzero(any_act)[0]
    decoded: dict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = {}

    def _slice(t: str, i: int, lo: int, hi: int) -> np.ndarray:
        key = (t, int(jd[t][i]))
        if key not in decoded:
            decoded[key] = _decode_block_cached(eps[t], key[1])
            st.blocks_decoded += 1
        docs_j = decoded[key][0]
        a = np.searchsorted(docs_j, lo, side="right")
        b = np.searchsorted(docs_j, hi, side="right")
        return docs_j[a:b]

    top_docs = np.empty(0, np.int64)
    top_scores = np.empty(0, np.float32)
    theta = np.float32(-np.inf)
    for i in cand_idx:
        hi = int(bounds[i])
        lo = int(bounds[i - 1]) if i > 0 else -1
        full = len(top_scores) >= k
        if full and ub32[i] <= theta:
            continue
        # phase 1: union over live paths of their term intersections
        inter: np.ndarray | None = None
        per_term_slice: dict[str, np.ndarray] = {}
        for pi, i0 in enumerate(live_paths):
            if not path_act[pi, i]:
                continue
            cur: np.ndarray | None = None
            ok_path = True
            for t in sorted(pterms[i0], key=lambda t: eps[t].ndocs):
                if t not in per_term_slice:
                    per_term_slice[t] = _slice(t, i, lo, hi)
                d = per_term_slice[t]
                if len(d) == 0:
                    ok_path = False
                    break
                cur = d if cur is None else np.intersect1d(
                    cur, d, assume_unique=True)
                if len(cur) == 0:
                    ok_path = False
                    break
            if not ok_path or cur is None:
                continue
            inter = cur if inter is None else np.union1d(inter, cur)
        if inter is None or len(inter) == 0:
            continue
        st.intervals_scored += 1

        # phase 2: positions per term for the docs it contains
        nd = len(inter)
        pos_by_doc: list[dict[str, np.ndarray]] = [dict() for _ in range(nd)]
        for t in uniq:
            if not okd[t][i]:
                continue
            d_t = per_term_slice.get(t)
            if d_t is None:
                d_t = _slice(t, i, lo, hi)
            mask = np.isin(inter, d_t, assume_unique=True)
            if not mask.any():
                continue
            plists = _positions_for(eps[t], inter[mask])
            for oi, arr in zip(np.nonzero(mask)[0], plists):
                pos_by_doc[oi][t] = arr
        freqs = np.zeros(nd, dtype=np.float64)
        for di in range(nd):
            m = pos_by_doc[di]
            starts: set = set()
            for i0 in live_paths:
                base: np.ndarray | None = None
                ok_p = True
                for off, t in enumerate(paths[i0]):
                    if t is None:
                        continue
                    pl = m.get(t)
                    if pl is None:
                        ok_p = False
                        break
                    arr = np.asarray(pl, dtype=np.int64) - off
                    base = arr if base is None else np.intersect1d(
                        base, arr, assume_unique=True)
                    if base.size == 0:
                        ok_p = False
                        break
                if ok_p and base is not None:
                    starts.update(int(x) for x in base if x >= 0)
            freqs[di] = float(len(starts))
        mask = freqs > 0
        if not mask.any():
            continue
        cand_d = inter[mask]
        nb = norms[cand_d - doc_base]
        cand_s = bm25.score(
            np.full(len(cand_d), np.float32(weight), np.float32),
            freqs[mask], nb)
        if full and len(cand_s):
            keep = cand_s > theta
            cand_d, cand_s = cand_d[keep], cand_s[keep]
        if len(cand_d) == 0:
            continue
        md = np.concatenate([top_docs, cand_d])
        ms = np.concatenate([top_scores, cand_s])
        order = np.lexsort((md, -ms.astype(np.float64)))[:k]
        top_docs, top_scores = md[order], ms[order]
        if len(top_scores) >= k:
            theta = top_scores[-1]

    return top_docs, top_scores


def qf_dismax_topk(
    terms: list[str],
    sources: dict[str, dict[str, "object"]],
    weights: dict[str, dict[str, np.float32]],
    norms: dict[str, np.ndarray],
    doc_base: int,
    bm25s: dict[str, "BM25"],
    k: int,
    tie: float = 0.0,
    msm: int = 1,
    boosts: dict[str, np.float32] | None = None,
    stats: WandStats | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """CROSS-FIELD block-max WAND — the edismax qf shape
    (ExtendedDismaxQParser: per term, DisjunctionMaxQuery across the
    qf fields; terms combine as SHOULD) pruned at the kernel level
    instead of the exact-but-exhaustive flat path.

    ``sources[t][f]`` is field f's GroupedPosting for t (fields are
    SEPARATE per-field segment indexes with aligned docids —
    build_multifield_segment_index); ``weights[t][f]`` the per-field
    f32 term weight (that field's idf/docCount); ``norms[f]`` /
    ``bm25s[f]`` field-local norms and similarity.

    Pruning bound: per interval, each (t, f)'s block-max bound
    dominates that field's f32 scores (functions/bm25.py
    block_max_bound); DisMax mx + tie*(sm - mx) = (1-tie)*mx + tie*sm
    is monotone in every per-field score for tie in [0,1], the f64
    SHOULD-sum is monotone, and the final f32 downcast is monotone —
    so the bound expression evaluated on the per-field bounds
    dominates any in-interval doc's final f32 score. Skipped
    intervals cannot beat theta.

    Scoring replicates the flat MultiFieldSearcher bit-for-bit
    (duel-tested): per (t, f) f32 BM25, per term f64
    mx + tie*(sm-mx) over present fields, terms folded in SORTED
    order (the flat OrQ's clause-key order for uniform qf DisMax
    nodes), one f32 downcast; (score desc, docid asc) top-k; msm
    counts terms with any matching field.
    """
    terms = sorted(terms)
    boosts = boosts or {}

    def _boosted(f: str, s32: np.ndarray) -> np.ndarray:
        # the flat executor applies the FieldedQ boost as a
        # post-multiply: f32(f64(score) * f32(boost)) (_boost in
        # executor.py) — mirror it exactly so duels stay bit-equal
        b = boosts.get(f)
        if b is None or float(b) == 1.0:
            return s32
        return (s32.astype(np.float64) * np.float64(b)).astype(
            np.float32)

    pairs = [(t, f) for t in terms for f in sorted(sources.get(t, {}))]
    if not pairs:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    eps = {tf_: sources[tf_[0]][tf_[1]] for tf_ in pairs}
    grids = {tf_: _term_block_grid(eps[tf_]) for tf_ in pairs}
    bounds = np.unique(np.concatenate(list(grids.values())))
    n_int = len(bounds)
    jmap: dict[tuple, np.ndarray] = {}
    active: dict[tuple, np.ndarray] = {}
    pair_ub: dict[tuple, np.ndarray] = {}
    for tf_ in pairs:
        t, f = tf_
        g = grids[tf_]
        j = np.searchsorted(g, bounds, side="left")
        jmap[tf_] = j
        ok = j < len(g)
        active[tf_] = ok
        ub = np.zeros(n_int, dtype=np.float64)
        jj = j[ok]
        b32 = _boosted(f, bm25s[f].score(
            np.full(len(jj), weights[t][f], np.float32),
            np.asarray(eps[tf_].blockmax_tf, dtype=np.int64)[jj],
            np.asarray(eps[tf_].blockmax_norm, dtype=np.int64)[jj]))
        ub[ok] = b32.astype(np.float64)
        pair_ub[tf_] = ub

    tie64 = float(tie)
    ub_total = np.zeros(n_int, dtype=np.float64)
    n_active_terms = np.zeros(n_int, dtype=np.int32)
    for t in terms:
        fb = [pair_ub[(t, f)] for f in sorted(sources.get(t, {}))]
        if not fb:
            continue
        stack = np.stack(fb)
        mx = stack.max(axis=0)
        sm = stack.sum(axis=0)
        # mirror the doc path's PER-TERM f32 downcast (f32 rounding is
        # monotone, so downcasting both sides preserves domination; a
        # bound kept in f64 while the doc value rounds to f32 can lose
        # by half an ulp for tie > 0)
        ub_total += (mx + tie64 * (sm - mx)).astype(
            np.float32).astype(np.float64)
        t_active = np.zeros(n_int, dtype=bool)
        for f in sorted(sources.get(t, {})):
            t_active |= active[(t, f)]
        n_active_terms += t_active.astype(np.int32)
    ub32 = ub_total.astype(np.float32)

    st = stats if stats is not None else WandStats()
    st.blocks_total += sum(len(g) for g in grids.values())
    st.intervals_total += n_int

    top_docs = np.empty(0, np.int64)
    top_scores = np.empty(0, np.float32)
    theta = np.float32(-np.inf)
    decoded: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}

    for i in range(n_int):
        if n_active_terms[i] < msm:
            continue
        full = len(top_scores) >= k
        if full and ub32[i] <= theta:
            continue
        hi = int(bounds[i])
        lo = int(bounds[i - 1]) if i > 0 else -1
        # decode every active (t, f) block slice; disjunction, so no
        # conjunction shortcut — theta does the pruning
        per_pair: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
        for tf_ in pairs:
            if not active[tf_][i]:
                continue
            j = int(jmap[tf_][i])
            key = (tf_, j)
            hit = decoded.get(key)
            if hit is None:
                hit = _decode_block_cached(eps[tf_], j)
                decoded[key] = hit
                st.blocks_decoded += 1
            docs_j, tfs_j = hit
            a = np.searchsorted(docs_j, lo, side="right")
            b = np.searchsorted(docs_j, hi, side="right")
            if a < b:
                per_pair[tf_] = (docs_j[a:b], tfs_j[a:b])
        if not per_pair:
            continue
        st.intervals_scored += 1
        union = np.unique(np.concatenate([d for d, _ in
                                          per_pair.values()]))
        nd = len(union)
        total = np.zeros(nd, dtype=np.float64)
        matched = np.zeros(nd, dtype=np.int32)
        for t in terms:
            mx = np.full(nd, -np.inf, dtype=np.float64)
            sm = np.zeros(nd, dtype=np.float64)
            seen = np.zeros(nd, dtype=bool)
            for f in sorted(sources.get(t, {})):
                pp = per_pair.get((t, f))
                if pp is None:
                    continue
                d, tfv = pp
                idx = np.searchsorted(union, d)
                s32 = _boosted(f, bm25s[f].score(
                    np.full(len(d), weights[t][f], np.float32),
                    tfv, norms[f][d - doc_base]))
                s64 = s32.astype(np.float64)
                np.maximum.at(mx, idx, s64)
                sm[idx] += s64
                seen[idx] = True
            if not seen.any():
                continue
            # the flat DisMax clause downcasts to f32 BEFORE the f64
            # SHOULD fold (_eval_dismax casts to the score type);
            # zero unseen slots first — mx stays -inf there and the
            # fold would form 0*inf=NaN intermediates otherwise
            mx = np.where(seen, mx, 0.0)
            val32 = (mx + tie64 * (sm - mx)).astype(np.float32)
            total += np.where(seen, val32.astype(np.float64), 0.0)
            matched += seen.astype(np.int32)
        ok = matched >= msm
        if not ok.any():
            continue
        cand_d = union[ok]
        cand_s = total[ok].astype(np.float32)
        if full and len(cand_s):
            keep = cand_s > theta
            cand_d, cand_s = cand_d[keep], cand_s[keep]
        if len(cand_d) == 0:
            continue
        md = np.concatenate([top_docs, cand_d])
        ms = np.concatenate([top_scores, cand_s])
        order = np.lexsort((md, -ms.astype(np.float64)))[:k]
        top_docs, top_scores = md[order], ms[order]
        if len(top_scores) >= k:
            theta = top_scores[-1]

    return top_docs, top_scores


def _term_block_grid(ep) -> np.ndarray:
    """Block boundary table of a posting (last docid per logical
    block), resolving the posting's own last doc without decoding."""
    if ep.singleton_docid is not None:
        last = ep.singleton_docid
    elif getattr(ep, "last_doc", -1) >= 0:
        last = int(ep.last_doc)
    elif ep.has_tail:
        last = int(_decode_block_cached(ep, ep.n_full_blocks)[0][-1])
    else:
        last = int(ep.skip_last_doc[-1])
    return block_last_docs(ep, last)


def multiphrase_topk(
    slots: list[tuple[str, ...]],
    postings: dict[str, "object"],
    weight: np.float32,
    norms: np.ndarray,
    doc_base: int,
    bm25: BM25,
    k: int,
    slop: int = 0,
    groups: list[list[int]] | None = None,
    multi_term: bool = False,
    stats: WandStats | None = None,
    collect_freqs: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Segment-native two-phase MultiPhrase kernel — phrase_topk
    generalized to OR-per-position slots (search/MultiPhraseQuery.java's
    UnionPostingsEnum over each slot, driven by the same
    ConjunctionDISI + TwoPhaseIterator discipline as the exact kernel):

    phase 1: interval sweep over the merged block grid of every slot
    term; an interval is live only where EVERY SLOT has at least one
    active term. Surviving intervals decode blocks cheapest-slot-first;
    a slot's docid set is the union of its active terms' docids, and
    slots intersect ConjunctionDISI-style.

    phase 2: per intersection doc, each slot's position set is the
    sorted union of its terms' positions (terms consulted only where
    they contain the doc; .pos payloads fetched lazily per group) —
    vectorized intersect for slop=0, the SloppyPhraseScorer traversal
    with the caller-supplied rptGroups for slop>0 (groups/multi_term
    from executor.multiphrase_rpt_groups, the same inputs the flat
    evaluator uses, so scores duel bit-equal).

    Pruning: per-interval bound = f32 BM25 of (tf_bound, min active
    block-max norm byte) where tf_bound is min-over-slots of the
    slot's summed block-max tfs for slop=0 (an exact occurrence
    consumes >= 1 position of every slot) or the all-slot sum for
    slop>0 (sloppy freq adds <= 1 per PhrasePositions advance;
    advances <= total slot-union positions). Monotone in tf and norm
    byte, so skipped intervals cannot beat theta.

    weight: f32(boost * f32(sum idf over ALL DISTINCT slot terms) *
    (k1+1)) — the flat _eval_multi_phrase weight.
    """
    n_slots = len(slots)
    slot_terms = [[t for t in slot if t in postings] for slot in slots]
    if n_slots == 0 or any(not st for st in slot_terms):
        if collect_freqs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.empty(0, np.int64), np.empty(0, np.float32)
    uniq = sorted({t for st in slot_terms for t in st})
    grids = {t: _term_block_grid(postings[t]) for t in uniq}

    bounds = np.unique(np.concatenate([grids[t] for t in uniq]))
    n_int = len(bounds)
    jd: dict[str, np.ndarray] = {}
    okd: dict[str, np.ndarray] = {}
    nb_min = np.full(n_int, 255, dtype=np.int64)
    slot_act = np.ones(n_int, dtype=bool)
    slot_tf = np.zeros((n_slots, n_int), dtype=np.int64)
    for t in uniq:
        j = np.searchsorted(grids[t], bounds, side="left")
        jd[t] = j
        okd[t] = j < len(grids[t])
    for s, sterms in enumerate(slot_terms):
        act_s = np.zeros(n_int, dtype=bool)
        for t in sterms:
            ok = okd[t]
            act_s |= ok
            bm_tf = np.asarray(postings[t].blockmax_tf, dtype=np.int64)
            bm_nb = np.asarray(postings[t].blockmax_norm, dtype=np.int64)
            slot_tf[s][ok] += bm_tf[jd[t][ok]]
            nb_min[ok] = np.minimum(nb_min[ok], bm_nb[jd[t][ok]])
        slot_act &= act_s
    tf_bound = (slot_tf.min(axis=0) if slop == 0
                else slot_tf.sum(axis=0))

    st = stats if stats is not None else WandStats()
    st.blocks_total += sum(len(grids[t]) for t in uniq)
    st.intervals_total += n_int

    ub32 = bm25.score(np.full(n_int, np.float32(weight), np.float32),
                      tf_bound, nb_min)
    cand_idx = np.nonzero(slot_act)[0]
    by_cost = sorted(range(n_slots),
                     key=lambda s: sum(postings[t].ndocs
                                       for t in slot_terms[s]))
    decoded: dict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = {}
    if slop > 0:
        from lucene_solr_spark.search.executor import _sloppy_phrase_freq

    def _slice(t: str, i: int, lo: int, hi: int) -> np.ndarray:
        key = (t, int(jd[t][i]))
        if key not in decoded:
            decoded[key] = _decode_block_cached(postings[t], key[1])
            st.blocks_decoded += 1
        docs_j = decoded[key][0]
        a = np.searchsorted(docs_j, lo, side="right")
        b = np.searchsorted(docs_j, hi, side="right")
        return docs_j[a:b]

    top_docs = np.empty(0, np.int64)
    top_scores = np.empty(0, np.float32)
    theta = np.float32(-np.inf)
    out_d: list[np.ndarray] = []
    out_f: list[np.ndarray] = []

    for i in cand_idx:
        hi = int(bounds[i])
        lo = int(bounds[i - 1]) if i > 0 else -1
        full = len(top_scores) >= k
        if not collect_freqs and full and ub32[i] <= theta:
            continue

        # phase 1: slot-union docid conjunction, cheapest slot first
        inter: np.ndarray | None = None
        for s in by_cost:
            parts = [d for t in slot_terms[s] if okd[t][i]
                     for d in (_slice(t, i, lo, hi),) if len(d)]
            if not parts:
                inter = None
                break
            d_u = (parts[0] if len(parts) == 1
                   else np.unique(np.concatenate(parts)))
            inter = d_u if inter is None else np.intersect1d(
                inter, d_u, assume_unique=True)
            if len(inter) == 0:
                inter = None
                break
        if inter is None or len(inter) == 0:
            continue
        st.intervals_scored += 1

        # phase 2: per-slot position unions on the intersection only
        nd = len(inter)
        pos_by_slot: list[list[np.ndarray | None]] = []
        for s in range(n_slots):
            per_doc: list[np.ndarray | None] = [None] * nd
            for t in slot_terms[s]:
                if not okd[t][i]:
                    continue
                d_t = _slice(t, i, lo, hi)
                mask = np.isin(inter, d_t, assume_unique=True)
                if not mask.any():
                    continue
                plists = _positions_for(postings[t], inter[mask])
                for oi, arr in zip(np.nonzero(mask)[0], plists):
                    cur = per_doc[oi]
                    per_doc[oi] = (arr if cur is None
                                   else np.union1d(cur, arr))
            pos_by_slot.append(per_doc)

        freqs = np.zeros(nd, dtype=np.float64)
        for di in range(nd):
            plists = [pos_by_slot[s][di] for s in range(n_slots)]
            if any(p is None for p in plists):
                continue
            if slop == 0:
                base: np.ndarray | None = None
                for off, arr in enumerate(plists):
                    a2 = arr - off
                    base = a2 if base is None else np.intersect1d(
                        base, a2, assume_unique=True)
                    if base.size == 0:
                        break
                freqs[di] = float(base.size)
            else:
                rebased = [arr - off for off, arr in enumerate(plists)]
                freqs[di] = _sloppy_phrase_freq(rebased, slop, groups,
                                                multi_term)
        mask = freqs > 0
        if not mask.any():
            continue
        cand_d = inter[mask]
        f = freqs[mask]
        if collect_freqs:
            out_d.append(cand_d)
            out_f.append(f)
            continue

        nb = norms[cand_d - doc_base]
        cand_s = bm25.score(
            np.full(len(cand_d), np.float32(weight), np.float32), f, nb)
        if full and len(cand_s):
            keep = cand_s > theta
            cand_d, cand_s = cand_d[keep], cand_s[keep]
        if len(cand_d) == 0:
            continue
        md = np.concatenate([top_docs, cand_d])
        ms = np.concatenate([top_scores, cand_s])
        order = np.lexsort((md, -ms.astype(np.float64)))[:k]
        top_docs, top_scores = md[order], ms[order]
        if len(top_scores) >= k:
            theta = top_scores[-1]

    if collect_freqs:
        if not out_d:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(out_d), np.concatenate(out_f)
    return top_docs, top_scores


# --- Spark orchestration ----------------------------------------------------


# Hash width for the POSITIONAL kernel task grids (phrase /
# multiphrase / span plans): segment ids are FEW (8-64) — hashed into
# the default shuffle width (2x cores) two segments collide in one
# task ~35% of the time and their kernels run serially (measured ~2x
# wall on hot-hot phrases, whose kernels are the most expensive).
# 128 buckets cut the collision odds to ~20% with negligible AQE
# overhead; the cheap WAND/batched paths keep the default width (the
# extra exchange planning costs more than a rare collision there).
KERNEL_HASH_PARTITIONS = 128

# Batched-serving result schema — shared with MultiFieldWandSearcher's
# empty fast path so the two can never drift.
SEARCH_MANY_SCHEMA = "qid string, docid long, score float, rank int"

METADATA_COLS = ("seg_id", "term", "df", "ttf", "singleton_docid",
                 "skip_last_doc", "skip_doc_off", "skip_tf_off",
                 "bm_tf", "bm_norm", "tail_offset",
                 "imp_tf", "imp_norm",
                 "grp_id", "grp_prev_doc", "grp_last_doc")


# Process-global payload LRU, shared across tasks by Python-worker
# reuse — the executor-side block cache of a serving tier (Lucene
# keeps .doc blocks hot in the OS page cache / JVM the same way).
# Safe because index cells are IMMUTABLE: segments are never rewritten
# in place (merges mint fresh seg_ids; the manifest is generational),
# so a (path, seg_id, term, grp) key can never go stale. Bounded by
# cell count (LSS_PAYLOAD_CACHE_CELLS, ~1-20KB/cell); norms blobs get
# a small separate ring.
import os as _os
from collections import OrderedDict as _OD

_PAYLOAD_CACHE: "_OD[tuple, tuple[bytes, bytes]]" = _OD()
_PAYLOAD_CACHE_CELLS = int(_os.environ.get("LSS_PAYLOAD_CACHE_CELLS", "4096"))
_NORMS_CACHE: "_OD[tuple, tuple]" = _OD()
_NORMS_CACHE_MAX = int(_os.environ.get("LSS_NORMS_CACHE_SEGS", "64"))
# decoded (docids, tfs) block arrays — ~2KB per full block; shared
# read-only (the kernel only slices them)
_DECODED_CACHE: "_OD[tuple, tuple]" = _OD()
_DECODED_CACHE_BLOCKS = int(_os.environ.get("LSS_DECODED_CACHE_BLOCKS",
                                            "16384"))
# FULL decoded (docids, tfs) postings for the exhaustive scorer —
# element-budgeted (16 bytes/element; the default 8M elements is
# ~128 MB/worker), same immutable-cell key argument
_FULLDEC_CACHE: "_OD[tuple, tuple]" = _OD()
_FULLDEC_CACHE_MAX_ELEMS = int(_os.environ.get("LSS_FULLDEC_CACHE_ELEMS",
                                               str(8_000_000)))
_FULLDEC_ELEMS = 0
FULLDEC_STATS = {"hits": 0, "misses": 0, "evictions": 0}


def _lru_get(cache: "_OD", key):
    v = cache.get(key)
    if v is not None:
        cache.move_to_end(key)
    return v


def _lru_put(cache: "_OD", key, val, cap: int) -> None:
    cache[key] = val
    while len(cache) > cap:
        cache.popitem(last=False)


def _prefetch_payloads(idx_path: str, seg_id: int, terms: list[str],
                       cache: dict) -> None:
    """Seed the fetch cache with ALL group payloads of ``terms`` in one
    columnar read (used for single-group terms, whose whole payload is
    one small cell — per-term point reads would cost more IO round
    trips than the bytes saved by laziness)."""
    import pyarrow.parquet as pq

    missing = [t for t in terms
               if _lru_get(_PAYLOAD_CACHE, (idx_path, seg_id, t, 0)) is None]
    for t in terms:
        if t in missing:
            continue
        cache[(t, 0)] = _lru_get(_PAYLOAD_CACHE, (idx_path, seg_id, t, 0))
    if not missing:
        return
    t = pq.read_table(
        f"{idx_path}/postings/seg_id={seg_id}",
        columns=["term", "grp_id", "docs_enc", "tfs_enc"],
        filters=[("term", "in", list(missing))])
    for tm, g, d, f in zip(t["term"].to_pylist(), t["grp_id"].to_pylist(),
                           t["docs_enc"].to_pylist(), t["tfs_enc"].to_pylist()):
        cell = (d if d is not None else b"", f if f is not None else b"")
        cache[(tm, int(g))] = cell
        _lru_put(_PAYLOAD_CACHE, (idx_path, seg_id, tm, int(g)), cell,
                 _PAYLOAD_CACHE_CELLS)


def _make_group_fetcher(idx_path: str, seg_id: int, readahead: int = 4):
    """Task-side lazy payload reader for one segment.

    The Spark plan ships METADATA-ONLY posting rows to the kernel task
    (term, df, skip arrays, block-max arrays — a few hundred bytes per
    group row); encoded byte streams never transit the shuffle/Arrow
    boundary. When the kernel decodes a block, the owning GROUP row's
    payload is read straight from parquet: partition-pruned (one
    seg_id dir), row-group-pruned (rows are written sorted by
    (term, grp_id), so min/max statistics skip unrelated row groups)
    and column-pruned (pos_enc is never touched on WAND shapes).
    Groups whose blocks the kernel prunes by score bound cost NO IO at
    all. ``readahead`` groups are fetched per read because the
    interval sweep requests ascend in docid order — the per-leaf .doc
    stream readahead of the reference, with the scorer task doing its
    own IO instead of the planner mailing it the stream."""
    import pyarrow.parquet as pq

    cache: dict[tuple[str, int], tuple[bytes, bytes]] = {}
    fetch_cache = cache  # exposed for bulk seeding (fetch.cache)

    def fetch(term: str, grp: int) -> tuple[bytes, bytes]:
        key = (term, grp)
        if key not in cache:
            hit = _lru_get(_PAYLOAD_CACHE, (idx_path, seg_id, term, grp))
            if hit is not None:
                cache[key] = hit
                return hit
            t = pq.read_table(
                f"{idx_path}/postings/seg_id={seg_id}",
                columns=["term", "grp_id", "docs_enc", "tfs_enc"],
                filters=[("term", "==", term), ("grp_id", ">=", grp),
                         ("grp_id", "<", grp + readahead)])
            for tm, g, d, f in zip(t["term"].to_pylist(),
                                   t["grp_id"].to_pylist(),
                                   t["docs_enc"].to_pylist(),
                                   t["tfs_enc"].to_pylist()):
                cell = (d if d is not None else b"",
                        f if f is not None else b"")
                cache[(tm, int(g))] = cell
                _lru_put(_PAYLOAD_CACHE, (idx_path, seg_id, tm, int(g)),
                         cell, _PAYLOAD_CACHE_CELLS)
        return cache[key]

    fetch.cache = fetch_cache
    return fetch


def _make_pos_fetcher(idx_path: str, seg_id: int, readahead: int = 2):
    """Lazy .pos payload reader (the .pos stream open of
    ExactPhraseScorer): per-(term, group) point reads of the pos_enc
    column only — docs/tfs payloads are NOT re-read, and groups whose
    docs never reach the phrase's docid intersection cost no IO.
    Shares the worker-global payload LRU under a "pos"-tagged key.

    Adaptive readahead: the phrase sweep requests a term's groups in
    ascending order, so after the THIRD miss on the same term the
    intersection has proven dense there — the remaining groups are
    fetched in ONE read (a hot-hot phrase pays ~2 reads per term
    instead of one ~30 ms parquet point read per group). Rare-led
    phrases touch < 3 groups of the head term and stay fully lazy, so
    the O(df_rare) IO bound is preserved."""
    import pyarrow.parquet as pq

    cache: dict[tuple[str, int], bytes] = {}
    misses: dict[str, int] = {}

    def fetch_pos(term: str, grp: int) -> bytes:
        key = (term, grp)
        if key not in cache:
            hit = _lru_get(_PAYLOAD_CACHE,
                           (idx_path, seg_id, term, grp, "pos"))
            if hit is not None:
                cache[key] = hit
                return hit
            misses[term] = misses.get(term, 0) + 1
            filters = [("term", "==", term), ("grp_id", ">=", grp)]
            if misses[term] < 3:
                filters.append(("grp_id", "<", grp + readahead))
            t = pq.read_table(
                f"{idx_path}/postings/seg_id={seg_id}",
                columns=["term", "grp_id", "pos_enc"],
                filters=filters)
            for tm, g, p in zip(t["term"].to_pylist(),
                                t["grp_id"].to_pylist(),
                                t["pos_enc"].to_pylist()):
                blob = p if p is not None else b""
                cache[(tm, int(g))] = blob
                _lru_put(_PAYLOAD_CACHE,
                         (idx_path, seg_id, tm, int(g), "pos"), blob,
                         _PAYLOAD_CACHE_CELLS)
        return cache[key]

    return fetch_pos


def _is_singleton(row: dict) -> bool:
    sd = row["singleton_docid"]
    return sd is not None and not (isinstance(sd, float) and np.isnan(sd))


def _grouped_postings(idx_path: str, seg_id: int,
                      pdf: pd.DataFrame,
                      bulk_all: bool = False) -> dict[str, "GroupedPosting"]:
    """Assemble one lazy GroupedPosting per term from its metadata rows.

    Payload strategy: SINGLE-group terms (everything but the zipf
    head) are bulk-seeded in one columnar read — their whole payload
    is one small cell, so one IO round trip for all of them beats a
    point read each. MULTI-group (hot) terms stay lazy per group: the
    kernel's score-bound pruning decides which groups' bytes are read
    at all. ``bulk_all``: seed EVERY term's groups in the one read —
    the batched-serving path, where the exhaustive bulk scorer will
    decode every group anyway, so per-group point reads only add IO
    round trips."""
    from lucene_solr_spark.index.codec import GroupedPosting

    fetch = _make_group_fetcher(idx_path, seg_id)
    rows_by_term: dict[str, list[dict]] = {}
    for i in range(len(pdf)):
        row = pdf.iloc[i].to_dict()
        rows_by_term.setdefault(row["term"], []).append(row)
    if bulk_all:
        bulk = [t for t, rows in rows_by_term.items()
                if not (len(rows) == 1 and _is_singleton(rows[0]))]
    else:
        bulk = [t for t, rows in rows_by_term.items()
                if len(rows) == 1 and not _is_singleton(rows[0])]
    if bulk:
        _prefetch_payloads(idx_path, seg_id, bulk, fetch.cache)
    pos_fetch = _make_pos_fetcher(idx_path, seg_id)
    out: dict[str, GroupedPosting] = {}
    for t, rows in rows_by_term.items():
        gp = GroupedPosting(rows, lambda g, t=t: fetch(t, g),
                            pos_fetch=lambda g, t=t: pos_fetch(t, g))
        gp.cache_key = (idx_path, seg_id, t)
        out[t] = gp
    return out


def _load_seg_norms(idx_path: str, seg_id: int) -> tuple[np.ndarray, int]:
    """Task-side sidecar read of a segment's norms blob (the .nvd
    open of TermWeight.scorer): a direct pyarrow read of the
    seg_id-partitioned norms parquet, instead of JOINING the blob onto
    every posting row (which would duplicate a doc_count-byte blob
    per query term — megabytes per row at production segment sizes)."""
    import pyarrow.parquet as pq

    hit = _lru_get(_NORMS_CACHE, (idx_path, seg_id))
    if hit is not None:
        return hit
    t = pq.read_table(f"{idx_path}/norms/seg_id={seg_id}",
                      columns=["doc_base", "norms"])
    doc_base = int(t["doc_base"][0].as_py())
    norms = np.frombuffer(t["norms"][0].as_py(), dtype=np.uint8)
    _lru_put(_NORMS_CACHE, (idx_path, seg_id), (norms, doc_base),
             _NORMS_CACHE_MAX)
    return norms, doc_base


class WandSearcher:
    """Segment-level top-k search with block-max WAND pruning.

    Supports flat boolean shapes — TermQ, AndQ/OrQ over terms (with
    min_should_match), NotQ whose negative side is a term/OR-of-terms
    — which covers the north rule's query set (term + boolean AND/OR).
    Anything else falls back to the exhaustive flat executor over
    decoded postings (same scores, no pruning).
    """

    def __init__(self, si: SegmentIndex, k1: float = 1.2, b: float = 0.75,
                 preload_stats: bool = False):
        """``preload_stats``: serving mode — the (term -> df)
        dictionary and the metadata projection are PERSISTED IN
        EXECUTOR MEMORY on first use (the FST term-dictionary / skip
        tier of a serving stack; distributed, never an O(vocabulary)
        driver collect). Novel query terms cost one tiny
        InMemoryTableScan job; looked-up terms cache driver-side so
        repeat traffic costs zero stats jobs."""
        self.si = si
        self._k1 = k1
        self._b = b
        self.coll = si.coll_stats()
        self.bm25 = BM25(self.coll["doc_count"], self.coll["sum_ttf"], k1=k1, b=b)
        self._df_cache: dict[str, int] = {}
        self._preload = preload_stats
        self._preloaded = False
        self._snapshot = tuple(si.live_segments())

    def _check_snapshot(self) -> None:
        """Invalidate cached term/collection statistics when the live
        segment set changed (NRT append or merge followed by
        si.refresh()): stale df/avgdl would change float32 weights and
        silently break rank identity across the refresh."""
        snap = tuple(self.si.live_segments())
        if snap != self._snapshot:
            self._snapshot = snap
            self._df_cache.clear()
            self._preloaded = False
            if getattr(self, "_meta_df", None) is not None:
                self._meta_df.unpersist()
                self._meta_df = None
            if getattr(self, "_stats_df", None) is not None:
                self._stats_df.unpersist()
                self._stats_df = None
            self.coll = self.si.coll_stats()
            self.bm25 = BM25(self.coll["doc_count"], self.coll["sum_ttf"],
                             k1=self._k1, b=self._b)

    # -- plan shape analysis ------------------------------------------------

    @staticmethod
    def _flat_terms(q: A.Query) -> tuple[list[str], int, list[str]] | None:
        """Decompose into (scored terms, msm, excluded terms) if the
        query is WAND-shaped; None otherwise.

        Scored clauses must be PLAIN terms: a nested OR clause is NOT
        flattened into the term list, because (a) min_should_match
        counts matching top-level CLAUSES (MinShouldMatchSumScorer),
        not distinct matching terms, and (b) the flat executor folds a
        nested OR to float32 before the outer float64 sum, so a
        flattened single fold would break bit-exact score parity.
        Nested trees take the exhaustive fallback (same scores, no
        pruning). The MUST_NOT side may still be an OR-of-terms — it
        contributes an unscored docid set, where flattening is exact.
        """
        def neg_terms_of(node) -> list[str] | None:
            if isinstance(node, A.TermQ):
                return [node.term]
            if isinstance(node, A.OrQ) and node.min_should_match <= 1:
                out = []
                for c in node.clauses:
                    t = neg_terms_of(c)
                    if t is None:
                        return None
                    out.extend(t)
                return out
            return None

        if isinstance(q, A.TermQ) and q.boost == 1.0:
            return [q.term], 1, []
        if isinstance(q, A.AndQ):
            out = []
            for c in q.clauses:
                if not (isinstance(c, A.TermQ) and c.boost == 1.0):
                    return None
                out.append(c.term)
            return out, len(out), []
        if isinstance(q, A.OrQ):
            out = []
            for c in q.clauses:
                if not (isinstance(c, A.TermQ) and c.boost == 1.0):
                    return None
                out.append(c.term)
            return out, max(1, q.min_should_match), []
        if isinstance(q, A.NotQ):
            pos = WandSearcher._flat_terms(q.positive)
            neg = neg_terms_of(q.negative)
            if pos is None or neg is None or pos[2]:
                return None
            return pos[0], pos[1], neg
        return None

    def _meta_rows(self) -> DataFrame:
        """The metadata-only posting projection every kernel plan scans
        (term filter + METADATA_COLS). In serving mode (preload_stats)
        the projection is PERSISTED in Spark executor memory — the
        in-RAM term-dictionary/skip-data tier of a serving stack
        (Lucene's FST + .doc skip blocks stay hot the same way), so a
        query batch pays an InMemoryTableScan instead of re-reading
        parquet footers (measured ~1.0 s -> ~0.05 s per search_many on
        the 500k bench index). Distributed cache, NOT a driver
        collect; invalidated with the segment snapshot."""
        if not self._preload:
            return self.si.postings.select(*METADATA_COLS)
        if getattr(self, "_meta_df", None) is None:
            self._meta_df = (self.si.postings.select(*METADATA_COLS)
                             .persist())
        return self._meta_df

    def _global_df(self, terms: list[str]) -> dict[str, int]:
        """Global df per term. Serving mode (preload_stats) keeps the
        whole (term -> df) dictionary PERSISTED IN EXECUTOR MEMORY
        (the FST term-dictionary tier — Lucene keeps it off-heap, not
        in the coordinator) and collects ONLY the queried terms' rows:
        O(query terms) driver transfer per novel-term batch, never the
        O(vocabulary) driver collect this used to do. Looked-up terms
        LRU into _df_cache so repeat traffic costs zero jobs."""
        if self._preload and getattr(self, "_stats_df", None) is None:
            self._stats_df = (self.si.postings.groupBy("term")
                              .agg(F.sum("df").alias("df")).persist())
            self._stats_df.count()  # materialize once (one stats job)
        missing = [t for t in set(terms) if t not in self._df_cache]
        if missing:
            src = (self._stats_df.where(F.col("term").isin(missing))
                   if self._preload else
                   self.si.postings.where(F.col("term").isin(missing))
                   .groupBy("term").agg(F.sum("df").alias("df")))
            got = {r["term"]: int(r["df"]) for r in src.collect()}
            for t in missing:
                self._df_cache[t] = got.get(t, 0)
        return {t: self._df_cache[t] for t in terms}

    def search(self, q: A.Query | str, k: int = 10,
               seed_theta: bool = False) -> DataFrame:
        """``seed_theta``: spend one extra (tiny) Spark job running the
        lowest-doc_base segment first and seed every other segment's
        kernel with its kth score — at large segment counts this
        prunes most blocks fleet-wide before any local heap fills.
        Off by default: in local/interactive mode the extra job
        round-trip outweighs the pruning."""
        self._check_snapshot()
        if isinstance(q, str):
            q = A.parse_query(q)
        q = q.rewrite()
        if isinstance(q, A.PhraseQ):
            # segment-native two-phase phrase path (no full decode)
            return self._search_phrase(q, k)
        if isinstance(q, A.MultiPhraseQ):
            return self._search_multiphrase(q, k)
        if isinstance(q, A.SpanNearQ):
            return self._search_span_near(q, k)
        if isinstance(q, A.SpanNearNQ):
            return self._search_span_nested(q, k)
        if isinstance(q, A.TermAutomatonQ):
            return self._search_term_automaton(q, k)
        if isinstance(q, (A.SynonymQ, A.BlendedTermQ)):
            return self._search_blend(q, k)
        if (isinstance(q, A.DisMaxQ)
                and all(isinstance(c, A.TermQ) and c.boost == 1.0
                        for c in q.clauses)):
            return self._search_dismax_terms(q, k)
        shape = self._flat_terms(q)
        if shape is None:
            # fallback: exhaustive over decoded postings; positions are
            # decoded from the .pos stream only when the query needs
            # them (phrase/span shapes)
            from lucene_solr_spark.search.executor import Searcher

            def scan(node, pred) -> bool:
                if pred(node):
                    return True
                kids = []
                if isinstance(node, (A.AndQ, A.OrQ, A.DisMaxQ)):
                    kids = node.clauses
                elif isinstance(node, A.NotQ):
                    kids = (node.positive, node.negative)
                elif isinstance(node, A.ReqOptQ):
                    kids = (node.required, node.optional)
                elif isinstance(node, A.ConstQ):
                    kids = (node.inner,)
                return any(scan(c, pred) for c in kids)

            needs_pos = scan(q, lambda n: isinstance(
                n, (A.PhraseQ, A.MultiPhraseQ, A.SpanNearQ,
                    A.SpanOrNQ, A.SpanNearNQ, A.TermAutomatonQ)))
            needs_offs = scan(q, lambda n: isinstance(n, A.PayloadScoreQ))
            # term-restricted decode is only valid when the term set is
            # closed (multi-term queries expand against the dictionary;
            # Synonym/Blended/SpanNear leaves are closed — their terms
            # come back from _collect_terms, and df/coll stats stay
            # index-global under restriction)
            expands = scan(q, lambda n: isinstance(
                n, (A.MultiTermQ, A.MatchAllQ)))
            from lucene_solr_spark.search.executor import _collect_terms

            qterms = None if expands else (sorted(_collect_terms(q)) or None)
            flat = self.si.as_flat_tables(with_positions=needs_pos,
                                          terms=qterms,
                                          with_offsets=needs_offs)
            return Searcher(flat, mode="lucene").search(q, k=k)
        terms, msm, neg_terms = shape
        dfs = self._global_df(terms + neg_terms)
        present = sorted({t for t in terms if dfs[t] > 0})
        if len(present) < msm or not present:
            return self.si.spark.createDataFrame(
                [], "docid long, score float, rank int")
        weights = {t: self.bm25.term_weight(dfs[t]) for t in present}
        neg_present = sorted({t for t in neg_terms if dfs[t] > 0})

        bm25 = self.bm25
        k_ = int(k)
        msm_ = int(msm)
        neg_set = set(neg_present)
        pos_set = set(present)
        idx_path = self.si.path

        def make_per_segment(theta0: float):
            def per_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                from lucene_solr_spark.index.codec import decode_posting

                sid = int(key[0])
                norms, doc_base = _load_seg_norms(idx_path, sid)
                eps = _grouped_postings(idx_path, sid, pdf)
                postings = {t: gp for t, gp in eps.items() if t in pos_set}
                exclude = None
                neg_parts = [_decode_full_cached(eps[t])[0]
                             for t in neg_set if t in eps]
                if neg_parts:
                    exclude = np.unique(np.concatenate(neg_parts))
                d, s = boolean_topk(postings, weights, norms, doc_base, bm25,
                                    k=k_, msm=msm_, exclude=exclude,
                                    theta0=theta0)
                return pd.DataFrame({"docid": d, "score": s})
            return per_segment

        rows = self._meta_rows().where(
            F.col("term").isin(present + neg_present))
        if seed_theta and len(self.si.live_segments()) > 1:
            # Cross-segment threshold seeding (the distributed
            # TopScoreDocCollector's setMinCompetitiveScore round):
            # run the kernel on the LOWEST-DOC_BASE segment first; its
            # kth score is a valid floor for the global threshold, so
            # every other segment's kernel starts with a competitive
            # theta and skips strictly-below blocks before its own
            # heap fills. Results stay bit-identical: ties at the
            # seed are kept, and equal-score docs in later segments
            # lose the docid tie-break anyway (their docids are
            # larger than the seed segment's).
            seed_seg = self._lowest_docbase_segment()
            seed_hits = (rows.where(F.col("seg_id") == seed_seg)
                         .groupBy("seg_id")
                         .applyInPandas(make_per_segment(float("-inf")),
                                        schema="docid long, score float")
                         .collect())
            theta0 = float("-inf")
            if len(seed_hits) >= k:
                theta0 = float(sorted(
                    (r["score"] for r in seed_hits), reverse=True)[k - 1])
            rest = (rows.where(F.col("seg_id") != seed_seg)
                    .groupBy("seg_id")
                    .applyInPandas(make_per_segment(theta0),
                                   schema="docid long, score float"))
            seed_df = self.si.spark.createDataFrame(
                [(int(r["docid"]), float(r["score"])) for r in seed_hits],
                "docid long, score float")
            per_seg = rest.unionByName(seed_df)
        else:
            per_seg = rows.groupBy("seg_id").applyInPandas(
                make_per_segment(float("-inf")),
                schema="docid long, score float")
        top = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return top.withColumn("rank", F.row_number().over(w))

    def _phrase_plan(self, terms: list[str], slop: int, k: int,
                     weight: np.float32, collect_freqs: bool) -> DataFrame:
        """Shared phrase orchestration: ship METADATA-ONLY posting rows
        of the phrase's distinct terms to one applyInPandas task per
        segment; the kernel does lazy payload + .pos IO task-side.
        Schema: (docid, score) for top-k, (docid, pfreq) for freqs."""
        bm25 = self.bm25
        k_ = int(k)
        slop_ = int(slop)
        idx_path = self.si.path
        terms_ = list(terms)
        uniq = sorted(set(terms_))

        def per_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(key[0])
            norms, doc_base = _load_seg_norms(idx_path, sid)
            eps = _grouped_postings(idx_path, sid, pdf)
            if any(t not in eps for t in uniq):
                cols = {"docid": np.empty(0, np.int64)}
                cols["pfreq" if collect_freqs else "score"] = (
                    np.empty(0, np.float64 if collect_freqs else np.float32))
                return pd.DataFrame(cols)
            d, v = phrase_topk(terms_, eps, weight, norms, doc_base, bm25,
                               k=k_, slop=slop_, collect_freqs=collect_freqs)
            if collect_freqs:
                return pd.DataFrame({"docid": d, "pfreq": v})
            return pd.DataFrame({"docid": d, "score": v})

        rows = self._meta_rows().where(F.col("term").isin(uniq))
        schema = ("docid long, pfreq double" if collect_freqs
                  else "docid long, score float")
        rows = rows.repartition(KERNEL_HASH_PARTITIONS,
                                F.col("seg_id"))
        return rows.groupBy("seg_id").applyInPandas(per_segment,
                                                    schema=schema)

    def _search_phrase(self, q: A.PhraseQ, k: int) -> DataFrame:
        """PhraseQ over the segment index via the two-phase kernel —
        same scores as the flat executor's _eval_phrase (duel-tested):
        weight = f32(boost * f32(sum idf over the slot array) * (k1+1)),
        score = f32 BM25 of the phrase freq."""
        terms = list(q.terms)
        dfs = self._global_df(sorted(set(terms)))
        if any(dfs[t] == 0 for t in set(terms)):
            return self.si.spark.createDataFrame(
                [], "docid long, score float, rank int")
        idf_sum64 = float(sum(self.bm25.idf(dfs[t]) for t in terms))
        weight = (np.float32(q.boost) * np.float32(idf_sum64)
                  * np.float32(self._k1 + 1.0))
        per_seg = self._phrase_plan(terms, q.slop, k, weight,
                                    collect_freqs=False)
        top = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return top.withColumn("rank", F.row_number().over(w))

    def _search_multiphrase(self, q: A.MultiPhraseQ, k: int) -> DataFrame:
        """MultiPhraseQ over the segment index via the two-phase
        slot-union kernel (multiphrase_topk) — same scores as the flat
        _eval_multi_phrase (duel-tested): weight = f32(boost *
        f32(sum idf over ALL distinct slot terms) * (k1+1)), rptGroups
        from the shared multiphrase_rpt_groups."""
        from lucene_solr_spark.search.executor import multiphrase_rpt_groups

        all_terms = sorted({t for slot in q.slots for t in slot})
        dfs = self._global_df(all_terms)
        if any(all(dfs[t] == 0 for t in slot) for slot in q.slots):
            return self.si.spark.createDataFrame(
                [], "docid long, score float, rank int")
        idf_sum64 = float(sum(self.bm25.idf(dfs[t]) for t in all_terms))
        weight = (np.float32(q.boost) * np.float32(idf_sum64)
                  * np.float32(self._k1 + 1.0))
        groups, multi_term = multiphrase_rpt_groups(q.slots, q.slop)

        bm25 = self.bm25
        k_ = int(k)
        slop_ = int(q.slop)
        idx_path = self.si.path
        slots_ = [tuple(s) for s in q.slots]
        present = sorted({t for t in all_terms if dfs[t] > 0})

        def per_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(key[0])
            norms, doc_base = _load_seg_norms(idx_path, sid)
            eps = _grouped_postings(idx_path, sid, pdf)
            d, s = multiphrase_topk(slots_, eps, weight, norms, doc_base,
                                    bm25, k=k_, slop=slop_, groups=groups,
                                    multi_term=multi_term)
            return pd.DataFrame({"docid": d, "score": s})

        rows = self._meta_rows().where(F.col("term").isin(present))
        per_seg = (rows
                   .repartition(KERNEL_HASH_PARTITIONS, F.col("seg_id"))
                   .groupBy("seg_id").applyInPandas(
                       per_segment, schema="docid long, score float"))
        top = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return top.withColumn("rank", F.row_number().over(w))

    def _search_span_near(self, q: A.SpanNearQ, k: int) -> DataFrame:
        """Top-level SpanNearQ over the segment index via the two-phase
        span kernel (span_near_topk) — no full posting decode; the
        constant score makes per-segment early termination exact (k
        lowest docids win the tie-break). Same matches and scores as
        the flat executor's _eval_span_near (duel-tested)."""
        dfs = self._global_df(sorted({q.first, q.second}))
        if any(v == 0 for v in dfs.values()):
            return self.si.spark.createDataFrame(
                [], "docid long, score float, rank int")
        k_ = int(k)
        slop_ = int(q.slop)
        in_order_ = bool(q.in_order)
        boost_ = float(np.float32(q.boost))
        idx_path = self.si.path
        first_, second_ = q.first, q.second

        def per_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(key[0])
            eps = _grouped_postings(idx_path, sid, pdf)
            d, s = span_near_topk(first_, second_, eps, boost_, k=k_,
                                  slop=slop_, in_order=in_order_)
            return pd.DataFrame({"docid": d, "score": s})

        rows = self._meta_rows().where(
            F.col("term").isin(sorted({first_, second_})))
        per_seg = (rows
                   .repartition(KERNEL_HASH_PARTITIONS, F.col("seg_id"))
                   .groupBy("seg_id").applyInPandas(
                       per_segment, schema="docid long, score float"))
        top = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return top.withColumn("rank", F.row_number().over(w))

    def _search_span_nested(self, q, k: int) -> DataFrame:
        """Nested span tree (SpanNearNQ with SpanOrNQ / SpanNearNQ
        sub-clauses) over the segment index via span_nested_topk — a
        nested span pairing a zipf-head term no longer full-decodes it
        (the r4 fallback went through as_flat_tables). Same matches
        and scores as the flat executor's _eval_span_nested: both call
        spannest.emit_spans (duel-tested)."""
        from lucene_solr_spark.search.spannest import leaf_terms

        terms = sorted(leaf_terms(q))
        dfs = self._global_df(terms)
        if all(dfs[t] == 0 for t in terms):
            return self.si.spark.createDataFrame(
                [], "docid long, score float, rank int")
        k_ = int(k)
        boost_ = float(np.float32(q.boost))
        idx_path = self.si.path
        present = [t for t in terms if dfs[t] > 0]

        def per_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(key[0])
            eps = _grouped_postings(idx_path, sid, pdf)
            d, s = span_nested_topk(q, eps, boost_, k=k_)
            return pd.DataFrame({"docid": d, "score": s})

        rows = self._meta_rows().where(F.col("term").isin(present))
        per_seg = (rows
                   .repartition(KERNEL_HASH_PARTITIONS, F.col("seg_id"))
                   .groupBy("seg_id").applyInPandas(
                       per_segment, schema="docid long, score float"))
        top = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return top.withColumn("rank", F.row_number().over(w))

    def _search_blend(self, q, k: int) -> DataFrame:
        """SynonymQ / BlendedTermQ on the segment tier — both score
        with the BLENDED df (max over the terms); Synonym sums tf and
        scores once (synonym_topk), Blended scores per term with the
        shared weight and SHOULD-folds (== exhaustive_topk with one
        weight). Bit-equal to the flat evaluators (duels)."""
        terms = sorted(set(q.terms))
        dfs = self._global_df(terms)
        present = [t for t in terms if dfs[t] > 0]
        if not present:
            return self.si.spark.createDataFrame(
                [], "docid long, score float, rank int")
        w32 = np.float32(self.bm25.term_weight(
            max(dfs[t] for t in present), q.boost))
        is_syn = isinstance(q, A.SynonymQ)
        bm25 = self.bm25
        k_ = int(k)
        idx_path = self.si.path

        def per_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(key[0])
            norms, doc_base = _load_seg_norms(idx_path, sid)
            eps = _grouped_postings(idx_path, sid, pdf, bulk_all=True)
            if is_syn:
                d, s = synonym_topk(eps, w32, norms, doc_base, bm25, k=k_)
            else:
                d, s = exhaustive_topk(eps, {t: w32 for t in eps},
                                       norms, doc_base, bm25, k=k_)
            return pd.DataFrame({"docid": d, "score": s})

        rows = self._meta_rows().where(F.col("term").isin(present))
        per_seg = (rows.groupBy("seg_id").applyInPandas(
            per_segment, schema="docid long, score float"))
        top = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return top.withColumn("rank", F.row_number().over(w))

    def _search_dismax_terms(self, q, k: int) -> DataFrame:
        """DisMaxQ over plain term clauses on the segment tier
        (dismax_terms_topk). Bit-equal to the flat _eval_dismax."""
        terms = sorted({c.term for c in q.clauses})
        dfs = self._global_df(terms)
        present = [t for t in terms if dfs[t] > 0]
        if not present:
            return self.si.spark.createDataFrame(
                [], "docid long, score float, rank int")
        weights = {t: self.bm25.term_weight(dfs[t]) for t in present}
        tie = float(q.tie_breaker)
        bm25 = self.bm25
        k_ = int(k)
        idx_path = self.si.path

        def per_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(key[0])
            norms, doc_base = _load_seg_norms(idx_path, sid)
            eps = _grouped_postings(idx_path, sid, pdf, bulk_all=True)
            d, s = dismax_terms_topk(eps, weights, tie, norms, doc_base,
                                     bm25, k=k_)
            return pd.DataFrame({"docid": d, "score": s})

        rows = self._meta_rows().where(F.col("term").isin(present))
        per_seg = (rows.groupBy("seg_id").applyInPandas(
            per_segment, schema="docid long, score float"))
        top = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return top.withColumn("rank", F.row_number().over(w))

    def _search_term_automaton(self, q, k: int) -> DataFrame:
        """TermAutomatonQ over the segment index via automaton_topk —
        the finite strings run as per-path block-grid conjunctions
        with lazy .pos (the r4 fallback full-decoded the automaton's
        terms). Same matches/scores as the flat executor's
        _eval_term_automaton (duel-tested): weight = the phrase recipe
        over ALL automaton terms (absent terms contribute their
        df=0 idf, as the flat path does)."""
        paths = q.finite_strings()
        all_terms = sorted({t for p in paths for t in p if t is not None})
        if not all_terms:
            return self.si.spark.createDataFrame(
                [], "docid long, score float, rank int")
        dfs = self._global_df(all_terms)
        present = [t for t in all_terms if dfs[t] > 0]
        if not present:
            return self.si.spark.createDataFrame(
                [], "docid long, score float, rank int")
        idf_sum64 = float(sum(self.bm25.idf(dfs[t]) for t in all_terms))
        weight = np.float32(np.float32(q.boost) * np.float32(idf_sum64)
                            * np.float32(self._k1 + 1.0))
        bm25 = self.bm25
        k_ = int(k)
        idx_path = self.si.path

        def per_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(key[0])
            norms, doc_base = _load_seg_norms(idx_path, sid)
            eps = _grouped_postings(idx_path, sid, pdf)
            d, s = automaton_topk(paths, eps, weight, norms, doc_base,
                                  bm25, k=k_)
            return pd.DataFrame({"docid": d, "score": s})

        rows = self._meta_rows().where(F.col("term").isin(present))
        per_seg = (rows
                   .repartition(KERNEL_HASH_PARTITIONS, F.col("seg_id"))
                   .groupBy("seg_id").applyInPandas(
                       per_segment, schema="docid long, score float"))
        top = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return top.withColumn("rank", F.row_number().over(w))

    def phrase_freqs(self, terms: list[str], slop: int = 0) -> DataFrame:
        """All (docid, phrase freq) matches of a phrase — the unranked
        MatchesIterator view. Runs the same two-phase kernel with no
        theta (every match is returned), still decoding docs only in
        all-terms-active intervals and positions only for intersection
        docs. pfreq is integral for slop=0, fractional (sloppyFreq
        sums 1/(len+1)) for slop>0."""
        self._check_snapshot()
        dfs = self._global_df(sorted(set(terms)))
        if any(dfs[t] == 0 for t in set(terms)):
            return self.si.spark.createDataFrame([], "docid long, pfreq double")
        return self._phrase_plan(list(terms), slop, 0, np.float32(1.0),
                                 collect_freqs=True)

    def _lowest_docbase_segment(self) -> int:
        snap = tuple(self.si.live_segments())
        if getattr(self, "_seed_seg_snap", None) != snap:
            row = self.si.meta.orderBy("doc_base").select("seg_id").first()
            self._seed_seg = int(row["seg_id"])
            self._seed_seg_snap = snap
        return self._seed_seg

    def search_many(self, queries: dict[str, A.Query | str],
                    k: int = 10, query_shards: int | None = None) -> DataFrame:
        """Batched serving: run MANY WAND-shaped queries in ONE Spark
        job. Each segment task receives the union of all queries'
        term postings once and runs the kernel per query — the
        per-query job-scheduling overhead (the dominant latency at
        interactive k) is amortized across the batch, which is how a
        Spark-based search tier actually serves traffic (micro-batched
        scatter-gather, EP2b's PURPOSE_GET_TOP_IDS phase for a whole
        request window). Returns (qid, docid, score, rank).

        ``query_shards``: split the query batch over S tasks PER
        SEGMENT (task key = (seg_id, qid-hash shard)) so batch
        parallelism is segments x shards instead of capping at the
        segment count — the replica fan-out of a serving tier, with
        metadata rows (tiny) duplicated per shard and payload reads
        shared via the OS page cache. Default: auto —
        ceil(parallelism / live segments), so a big batch uses the
        whole cluster. Accepts WAND shapes AND exact/sloppy PhraseQ
        (routed to the two-phase phrase kernel inside the same
        segment task); other shapes are not accepted here (use
        search()).
        """
        self._check_snapshot()
        n_seg = max(1, len(self.si.live_segments()))
        if query_shards is None:
            par = self.si.spark.sparkContext.defaultParallelism
            query_shards = max(1, -(-par // n_seg))  # ceil
        query_shards = max(1, min(int(query_shards), len(queries)))
        parsed: dict[str, tuple[list[str], int, list[str]]] = {}
        phrase_specs: dict[str, tuple[list[str], int, float]] = {}
        for qid, q in queries.items():
            if isinstance(q, str):
                q = A.parse_query(q)
            q = q.rewrite()
            if isinstance(q, A.PhraseQ):
                phrase_specs[qid] = (list(q.terms), int(q.slop),
                                     float(q.boost))
                continue
            shape = self._flat_terms(q)
            if shape is None:
                raise ValueError(f"query {qid!r} is not WAND-shaped")
            parsed[qid] = shape
        all_terms = sorted(
            {t for s in parsed.values() for t in s[0] + s[2]}
            | {t for ts, _, _ in phrase_specs.values() for t in ts})
        if not all_terms:
            return self.si.spark.createDataFrame([], SEARCH_MANY_SCHEMA)
        dfs = self._global_df(all_terms)
        weights = {t: self.bm25.term_weight(dfs[t])
                   for t in all_terms if dfs[t] > 0}
        plan = {
            qid: (sorted({t for t in terms if dfs[t] > 0}), msm,
                  sorted({t for t in negs if dfs[t] > 0}))
            for qid, (terms, msm, negs) in parsed.items()
        }
        # phrase weight = f32(boost * f32(sum idf over slots) * (k1+1)),
        # exactly _search_phrase's; phrases with a missing term match
        # nothing and drop out of the plan here
        phrase_plan = {
            qid: (terms, slop,
                  np.float32(boost)
                  * np.float32(float(sum(self.bm25.idf(dfs[t])
                                         for t in terms)))
                  * np.float32(self._k1 + 1.0))
            for qid, (terms, slop, boost) in phrase_specs.items()
            if all(dfs[t] > 0 for t in set(terms))
        }
        bm25 = self.bm25
        k_ = int(k)
        idx_path = self.si.path

        # deterministic round-robin shard assignment over sorted qids;
        # each metadata row is exploded only to the shards whose
        # queries use its term (no blanket duplication)
        shard_of = {qid: i % query_shards
                    for i, qid in enumerate(sorted(plan) + sorted(phrase_plan))}
        term_shards: dict[str, set[int]] = {}
        for qid, (terms, msm, negs) in plan.items():
            for t in terms + negs:
                term_shards.setdefault(t, set()).add(shard_of[qid])
        for qid, (terms, slop, weight) in phrase_plan.items():
            for t in terms:
                term_shards.setdefault(t, set()).add(shard_of[qid])

        def per_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            sid, shard = int(key[0]), int(key[1])
            norms, doc_base = _load_seg_norms(idx_path, sid)
            eps = _grouped_postings(idx_path, sid, pdf, bulk_all=True)
            from lucene_solr_spark.index.codec import decode_posting

            out_q, out_d, out_s = [], [], []
            for qid, (terms, msm, negs) in plan.items():
                if shard_of[qid] != shard:
                    continue
                postings = {t: eps[t] for t in terms if t in eps}
                if len(postings) < msm or not postings:
                    continue
                exclude = None
                neg_parts = [_decode_full_cached(eps[t])[0]
                             for t in negs if t in eps]
                if neg_parts:
                    exclude = np.unique(np.concatenate(neg_parts))
                d, s = boolean_topk(postings, weights, norms, doc_base, bm25,
                                    k=k_, msm=msm, exclude=exclude)
                out_q.extend([qid] * len(d))
                out_d.append(d)
                out_s.append(s)
            for qid, (terms, slop, weight) in phrase_plan.items():
                if shard_of[qid] != shard:
                    continue
                if any(t not in eps for t in set(terms)):
                    continue
                d, s = phrase_topk(terms, eps, weight, norms, doc_base,
                                   bm25, k=k_, slop=slop)
                out_q.extend([qid] * len(d))
                out_d.append(d)
                out_s.append(s)
            if not out_q:
                return pd.DataFrame({"qid": [], "docid": [], "score": []})
            return pd.DataFrame({
                "qid": out_q,
                "docid": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            })

        shard_map = F.create_map(*[
            x for t, ss in sorted(term_shards.items())
            for x in (F.lit(t),
                      F.array(*[F.lit(int(s)) for s in sorted(ss)]))])
        rows = (self._meta_rows()
                .where(F.col("term").isin([t for t in all_terms if dfs[t] > 0]))
                .withColumn("shard", F.explode(shard_map[F.col("term")])))
        per_seg = rows.groupBy("seg_id", "shard").applyInPandas(
            per_segment, schema="qid string, docid long, score float")
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
        return (per_seg.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))
