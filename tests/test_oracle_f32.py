"""The float32-exact BM25 DuckDB oracle (oracle_f32.py) must be
BIT-equal to the engine's numpy kernels — this is what lets the
flagship WAND queries carry a value-hash oracle instead of a
duel-only gate. No Spark needed: DuckDB vs functions/bm25.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from lucene_solr_spark.functions.bm25 import BM25, NORM_TABLE, length_norm_byte
from lucene_solr_spark.oracle_f32 import _RANGES, f32_base_sql


def test_norm_range_table_matches_kernel():
    """The inline (lo, hi, NORM_TABLE value) table equals the byte315
    pipeline for every doclen up to 200k plus spot checks to 2^40."""
    lens = np.arange(0, 200_001, dtype=np.int64)
    want = NORM_TABLE[length_norm_byte(lens)]
    los = np.array([r[0] for r in _RANGES], dtype=np.int64)
    vals = np.array([r[2] for r in _RANGES], dtype=np.float32)
    idx = np.searchsorted(los, lens, side="right") - 1
    assert np.array_equal(vals[idx], want)
    for big in (1 << 20, 1 << 30, 1 << 40):
        i = int(np.searchsorted(los, big, side="right")) - 1
        assert _RANGES[i][0] <= big <= _RANGES[i][1]
        assert np.float32(_RANGES[i][2]) == NORM_TABLE[
            length_norm_byte(np.array([big]))][0]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_f32_scores_bit_equal_duckdb(seed):
    """Random (doclen, tf, df, collection) -> the SQL fscored values
    must be bit-identical to BM25.score with byte315 norms."""
    rng = np.random.default_rng(seed)
    n_docs = 400
    doc_count = int(rng.integers(100, 5000))
    sum_ttf = int(rng.integers(doc_count, doc_count * 200))
    bm = BM25(doc_count, sum_ttf)
    doclens = rng.integers(0, 3000, size=n_docs)
    tfs = rng.integers(1, 50, size=n_docs)
    df = int(rng.integers(1, doc_count))
    w = bm.term_weight(df)
    want = bm.score(np.full(n_docs, w, np.float32), tfs,
                    length_norm_byte(doclens.astype(np.int64)))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE doclen AS SELECT unnest(range(?))::BIGINT AS doc_id,"
        " unnest(?::BIGINT[]) AS doclen", [n_docs, doclens.tolist()])
    con.execute(
        "CREATE TABLE postings AS SELECT unnest(range(?))::BIGINT AS doc_id,"
        " 'x' AS term, unnest(?::BIGINT[]) AS tf", [n_docs, tfs.tolist()])
    con.execute(f"CREATE TABLE cstats AS SELECT {doc_count}::DOUBLE AS n,"
                f" {sum_ttf}::DOUBLE AS sttf")
    con.execute(f"CREATE TABLE tstats AS SELECT 'x' AS term, {df}::DOUBLE AS df")
    got = con.execute(
        "WITH " + f32_base_sql(["x"])
        + " SELECT s FROM fscored ORDER BY doc_id").fetchnumpy()["s"]
    got32 = got.astype(np.float32)
    assert np.array_equal(got32.view(np.int32), want.view(np.int32)), (
        np.nonzero(got32 != want)[0][:5])
