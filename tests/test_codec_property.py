"""Property-based codec tests (SURVEY §5.1-§5.2: the reference's
randomized BasePostingsFormatTestCase pattern, via hypothesis).

Round-trip and invariant properties over random posting shapes: FOR
blocks, vint tails, singletons, skip/block-max consistency, random
block access, position streams, and the vectorized vint codec against
its scalar reference decoder.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.index.codec import (
    BLOCK_SIZE,
    block_last_docs,
    decode_block,
    decode_nth_block,
    decode_positions,
    decode_posting,
    decode_tail,
    encode_positions,
    encode_posting,
    posting_from_row,
    posting_to_row,
    read_vints,
    read_vints_arr,
    write_vints,
)

postings_shape = st.integers(min_value=1, max_value=700)


@st.composite
def posting(draw):
    n = draw(postings_shape)
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    space = draw(st.sampled_from([1 << 12, 1 << 20, 1 << 34]))
    docs = np.sort(rng.choice(space, size=min(n, space), replace=False)).astype(np.int64)
    tfs = rng.integers(1, draw(st.sampled_from([2, 8, 1000])),
                       size=len(docs)).astype(np.int64)
    norms = rng.integers(0, 256, size=len(docs)).astype(np.int64)
    return docs, tfs, norms


@settings(max_examples=60, deadline=None)
@given(posting())
def test_posting_roundtrip(p):
    docs, tfs, norms = p
    ep = encode_posting(docs, tfs, norms)
    d, t = decode_posting(ep)
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)


@settings(max_examples=60, deadline=None)
@given(posting())
def test_row_serialization_roundtrip(p):
    docs, tfs, norms = p
    ep = encode_posting(docs, tfs, norms)
    ep2 = posting_from_row(posting_to_row(ep, ttf=int(tfs.sum())))
    d, t = decode_posting(ep2)
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)


@settings(max_examples=40, deadline=None)
@given(posting())
def test_skip_and_blockmax_invariants(p):
    """CheckIndex-style: skip entries = true block-last docids;
    blockmax = true per-block maxima; random block access equals the
    sequential decode slice (advance() correctness)."""
    docs, tfs, norms = p
    ep = encode_posting(docs, tfs, norms)
    full = len(docs) // BLOCK_SIZE
    for b in range(full):
        lo, hi = b * BLOCK_SIZE, (b + 1) * BLOCK_SIZE
        assert int(ep.skip_last_doc[b]) == int(docs[hi - 1])
        assert int(ep.blockmax_tf[b]) == int(tfs[lo:hi].max())
        assert int(ep.blockmax_norm[b]) == int(norms[lo:hi].max())
        bd, bt = decode_block(ep, b)
        np.testing.assert_array_equal(bd, docs[lo:hi])
        np.testing.assert_array_equal(bt, tfs[lo:hi])
    if ep.has_tail:
        td, tt = decode_tail(ep)
        np.testing.assert_array_equal(td, docs[full * BLOCK_SIZE:])
        np.testing.assert_array_equal(tt, tfs[full * BLOCK_SIZE:])
    # logical-block geometry covers every doc exactly once
    lasts = block_last_docs(ep, int(docs[-1]))
    assert int(lasts[-1]) == int(docs[-1])
    parts = [decode_nth_block(ep, i)[0]
             for i in range(len(lasts))]
    np.testing.assert_array_equal(np.concatenate(parts), docs)


@settings(max_examples=60, deadline=None)
@given(posting())
def test_positions_roundtrip(p):
    docs, tfs, norms = p
    seed = int(docs[0]) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    plists = [np.sort(rng.choice(10_000, size=int(t), replace=False))
              for t in tfs]
    flat = np.concatenate(plists)
    enc = encode_positions(flat, tfs)
    out = decode_positions(enc, tfs)
    assert len(out) == len(plists)
    for a, b in zip(out, plists):
        np.testing.assert_array_equal(a, b)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(0, 2**50), min_size=0, max_size=400))
def test_vint_vectorized_matches_scalar(vals):
    arr = np.array(vals, dtype=np.int64) if vals else np.empty(0, np.int64)
    buf = write_vints(arr)
    fast = read_vints_arr(buf)
    np.testing.assert_array_equal(fast, arr)
    if len(arr):
        slow, pos = read_vints(buf, 0, len(arr))
        np.testing.assert_array_equal(slow, arr)
        assert pos == len(buf)


def test_split_posting_roundtrip_and_lazy_groups():
    """Group sharding: split_posting_to_rows slices decode standalone,
    GroupedPosting reassembles them bit-equal, and a pruned WAND run
    fetches only the groups it decodes."""
    import numpy as np

    from lucene_solr_spark.functions.bm25 import BM25
    from lucene_solr_spark.index.codec import (
        BLOCK_SIZE,
        GROUP_BLOCKS,
        GroupedPosting,
        decode_posting,
        encode_posting,
        split_posting_to_rows,
    )
    from lucene_solr_spark.search.wand import wand_topk

    rng = np.random.default_rng(7)
    n = GROUP_BLOCKS * BLOCK_SIZE * 2 + 777   # 3 groups, tail in last
    docs = np.cumsum(rng.integers(1, 5, size=n))
    tfs = rng.integers(1, 9, size=n)
    norms_b = rng.integers(1, 255, size=n)
    pos_flat = np.concatenate(
        [np.sort(rng.choice(10_000, size=t, replace=False)) for t in tfs])
    ep = encode_posting(docs, tfs, norms_b)
    rows = split_posting_to_rows(ep, tfs, pos_flat)
    assert len(rows) == 3
    assert [r["grp_id"] for r in rows] == [0, 1, 2]
    assert rows[-1]["grp_last_doc"] == int(docs[-1])
    assert sum(r["df"] for r in rows) == n
    assert sum(r["ttf"] for r in rows) == int(tfs.sum())

    # each row decodes standalone
    from lucene_solr_spark.index.codec import decode_positions, posting_from_row
    got_d, got_t, got_p = [], [], []
    for r in rows:
        ep_g = posting_from_row(r)
        d, t = decode_posting(ep_g)
        got_d.append(d)
        got_t.append(t)
        got_p.extend(decode_positions(ep_g.pos_enc, t))
    assert np.array_equal(np.concatenate(got_d), docs)
    assert np.array_equal(np.concatenate(got_t), tfs)
    assert np.array_equal(np.concatenate(got_p), pos_flat)

    # lazy reassembly: bit-equal kernel results, group-pruned IO
    fetched: list[int] = []

    def fetch(g: int):
        fetched.append(g)
        return rows[g]["docs_enc"], rows[g]["tfs_enc"]

    meta_rows = [{k: v for k, v in r.items()
                  if k not in ("docs_enc", "tfs_enc", "pos_enc")}
                 for r in rows]
    gp = GroupedPosting(meta_rows, fetch)
    gd, gt = decode_posting(gp)
    assert np.array_equal(gd, docs) and np.array_equal(gt, tfs)

    dense_norms = np.zeros(int(docs[-1]) + 1, dtype=np.uint8)
    dense_norms[docs] = norms_b
    bm = BM25(n, int(tfs.sum() * 4))
    w = {"t": bm.term_weight(n // 3)}
    d1, s1 = wand_topk({"t": ep}, w, dense_norms, 0, bm, k=10)
    fetched.clear()
    gp2 = GroupedPosting(meta_rows, fetch)
    d2, s2 = wand_topk({"t": gp2}, w, dense_norms, 0, bm, k=10)
    assert np.array_equal(d1, d2)
    assert np.array_equal(s1.view(np.int32), s2.view(np.int32))
