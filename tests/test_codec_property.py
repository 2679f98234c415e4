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
