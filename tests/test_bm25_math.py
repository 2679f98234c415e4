"""byte315 / BM25 math unit tests (TestBM25Similarity-style sanity +
SmallFloat round-trip properties)."""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.functions.bm25 import (
    BM25,
    NORM_TABLE,
    byte315_to_float,
    float_to_byte315,
    length_norm_byte,
)


def test_byte315_known_values():
    # SmallFloat: identity-ish landmarks. byte315(1.0f):
    # bits(1.0)=0x3F800000, >>21 = 0x1FC, fzero=(63-15)<<3=384=0x180
    # -> 0x1FC-0x180 = 0x7C = 124
    assert int(float_to_byte315(np.float32(1.0))[()]) == 124
    assert int(float_to_byte315(np.float32(0.0))[()]) == 0
    assert float(byte315_to_float(np.uint8(0))[0]) == 0.0
    # decode(124) must be exactly 1.0
    assert float(byte315_to_float(np.uint8(124))[0]) == 1.0


def test_byte315_roundtrip_monotone():
    bytes_ = np.arange(1, 256, dtype=np.uint8)
    decoded = byte315_to_float(bytes_)
    assert np.all(np.diff(decoded) > 0)  # strictly increasing
    # encode(decode(b)) == b
    reenc = float_to_byte315(decoded)
    assert np.array_equal(reenc, bytes_)


def test_byte315_lossy_quantization():
    # many lengths map to the same byte (3 mantissa bits)
    lens = np.arange(1, 10_000)
    b = length_norm_byte(lens)
    assert len(np.unique(b)) < 120
    # longer docs -> smaller byte (1/sqrt(len) decreasing)
    assert b[0] >= b[-1]


def test_norm_table_matches_reference_construction():
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    expect = np.float32(1.0) / (f[100] * f[100])
    assert NORM_TABLE[100] == expect
    assert NORM_TABLE[0] == np.float32(1.0) / NORM_TABLE[255]


def test_idf_and_score_sanity():
    bm = BM25(doc_count=100, sum_total_term_freq=10_000)
    # idf decreasing in df
    idfs = bm.idf(np.array([1, 10, 50, 99]))
    assert np.all(np.diff(idfs) < 0)
    # score increasing in tf
    w = bm.term_weight(10)
    nb = int(length_norm_byte(100))
    s = bm.score(np.full(3, w), np.array([1, 2, 10]), np.full(3, nb, dtype=np.uint8))
    assert s.dtype == np.float32
    assert np.all(np.diff(s) > 0)
    # score decreasing in doc length (larger len -> smaller byte -> bigger cache)
    nb_short, nb_long = int(length_norm_byte(10)), int(length_norm_byte(1000))
    s2 = bm.score(np.full(2, w), np.array([5, 5]),
                  np.array([nb_short, nb_long], dtype=np.uint8))
    assert s2[0] > s2[1]


def test_block_max_bound_is_upper_bound():
    bm = BM25(doc_count=1000, sum_total_term_freq=200_000)
    rng = np.random.default_rng(42)
    w = bm.term_weight(37)
    tfs = rng.integers(1, 50, size=500)
    lens = rng.integers(5, 2000, size=500)
    nbs = length_norm_byte(lens)
    scores = bm.score(np.full(500, w), tfs, nbs)
    bound = bm.block_max_bound(w, np.max(tfs), np.max(nbs))
    assert float(bound) >= float(np.max(scores))
