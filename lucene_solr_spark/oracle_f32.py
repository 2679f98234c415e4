"""Float32-exact BM25 oracle SQL (DuckDB) for the segment/WAND path.

The engine's flagship scoring (functions/bm25.py) is Lucene's float32
BM25 with byte315-quantized norms — previously "not SQL-expressible",
so the WAND queries had no DuckDB oracle. It IS expressible:

- DuckDB FLOAT arithmetic is IEEE binary32 with round-to-nearest
  (verified in tests/test_oracle_f32.py against the numpy kernels),
  so ``w * tf / (tf + cache)`` evaluates to the same bits as
  BM25.score when written with the same association order.
- The one bit-twiddling piece — SmallFloat.floatToByte315 over
  ``1/sqrt(doclen)`` (SmallFloat.java:78-98) — is a pure step
  function of the integer doclen, so it is materialized here as an
  inline (lo, hi, NORM_TABLE[byte]) range table generated from the
  very numpy kernels the engine uses. ~130 rows cover doclen 0..2^62.
- Multi-clause sums: the kernel accumulates float32 clause scores in
  float64 and downcasts once (wand.py). float64 addition of a handful
  of same-magnitude float32 values is exact, so SQL's unordered
  ``sum(s::DOUBLE)`` matches the kernel's sorted-order fold bit
  for bit; the final ``::FLOAT`` downcast mirrors the kernel's.

Score quantization contract: both engines order by
``score_q = floor(float32_score::DOUBLE * 1e6)`` with docid
tie-breaks, so sub-quantum collisions rank identically.
"""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.functions.bm25 import NORM_TABLE, length_norm_byte

_MAX_LEN = 1 << 62


def _norm_value_ranges() -> list[tuple[int, int, float]]:
    """(lo_doclen, hi_doclen, NORM_TABLE[byte315(doclen)]) ranges.

    byte315(1/sqrt(len)) is monotone non-increasing in len, so each
    byte value owns one contiguous doclen range; boundaries are found
    by doubling + bisection (exact up to 2^62, ~130 ranges total).
    doclen 0 encodes 1/sqrt(0)=inf -> byte 255 (its own row).
    """

    def byte_of(length: int) -> int:
        return int(length_norm_byte(np.array([length], dtype=np.int64))[0])

    ranges: list[tuple[int, int, float]] = [
        (0, 0, float(NORM_TABLE[byte_of(0)]))]
    lo = 1
    while lo <= _MAX_LEN:
        b = byte_of(lo)
        # find the largest hi with byte_of(hi) == b: doubling then bisect
        step = 1
        hi = lo
        while hi + step <= _MAX_LEN and byte_of(hi + step) == b:
            hi += step
            step *= 2
        while step > 1:
            step //= 2
            if hi + step <= _MAX_LEN and byte_of(hi + step) == b:
                hi += step
        ranges.append((lo, hi, float(NORM_TABLE[b])))
        lo = hi + 1
    return ranges


_RANGES = _norm_value_ranges()

# inline VALUES table; NORM_TABLE entries are float32 values whose
# repr round-trips exactly through DuckDB's DOUBLE -> ::FLOAT cast
NT_SQL = "(VALUES " + ", ".join(
    f"({lo}, {hi}, {v!r}::DOUBLE)" for lo, hi, v in _RANGES) + ")"

K1P1_F32 = "(1.2::FLOAT + 1.0::FLOAT)"      # np.float32(1.2) + np.float32(1)
ONE_MINUS_B_F32 = "(1.0::FLOAT - 0.75::FLOAT)"


def f32_base_sql(terms: list[str], prefix: str = "") -> str:
    """CTE block computing per-(doc, term) float32 Lucene BM25 scores
    ``{prefix}fscored(doc_id, term, s)``; requires
    ``{prefix}postings/{prefix}doclen/{prefix}cstats/{prefix}tstats``
    CTEs in scope (FT_BASE's names when prefix is empty). Every FLOAT
    expression mirrors the association order of functions/bm25.py so
    the bits match. A non-empty ``prefix`` lets one query carry
    several fields' f32 pipelines side by side (per-field indexes).
    """
    q = prefix
    tlist = ",".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
{q}nt(lo, hi, v) AS {NT_SQL},
{q}favg AS (SELECT (sttf / n)::FLOAT AS avgdl FROM {q}cstats),
{q}fcache AS (
  -- BM25.cache: k1 * ((1-b) + b * NORM_TABLE[byte] / avgdl), float32
  SELECT dl.doc_id,
         (1.2::FLOAT * ({ONE_MINUS_B_F32}
            + ((0.75::FLOAT * nt.v::FLOAT) / fa.avgdl))) AS c
  FROM {q}doclen dl JOIN {q}nt nt ON dl.doclen BETWEEN nt.lo AND nt.hi
  CROSS JOIN {q}favg fa
),
{q}fweights AS (
  -- term_weight: (boost32 * float32(ln idf)) * (k1+1), float32
  SELECT ts.term,
         ((1.0::FLOAT
            * (ln(1.0 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)))::FLOAT)
            * {K1P1_F32}) AS w
  FROM {q}tstats ts CROSS JOIN {q}cstats cs WHERE ts.term IN ({tlist})
),
{q}fscored AS (
  -- BM25.score: (w * tf32) / (tf32 + cache), float32
  SELECT p.doc_id, p.term,
         ((fw.w * p.tf::FLOAT) / (p.tf::FLOAT + fc.c)) AS s
  FROM {q}postings p
  JOIN {q}fweights fw ON p.term = fw.term
  JOIN {q}fcache fc ON p.doc_id = fc.doc_id
  WHERE p.term IN ({tlist})
)"""


def f32_sum_q(having: str = "") -> str:
    """Aggregate fscored to quantized per-doc scores: float64 clause
    accumulation, one float32 downcast, then floor(x*1e6) — the exact
    pipeline of wand_topk's collector."""
    return f"""
  SELECT doc_id,
         CAST(floor(CAST(sum(s::DOUBLE) AS FLOAT)::DOUBLE * 1000000)
              AS BIGINT) AS score_q
  FROM fscored GROUP BY doc_id {having}"""
