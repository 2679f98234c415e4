"""Lucene BM25Similarity math, float32-exact, as numpy kernels.

Ports (from public Lucene 7.0.0-SNAPSHOT sources, reference repo):

- SmallFloat.floatToByte315 / byte315ToFloat
  (lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98):
  lossy 1-byte float with 3 mantissa bits, zero exponent 15.
- BM25Similarity (search/similarities/BM25Similarity.java):
  * k1 = 1.2, b = 0.75 defaults (lines 61-69)
  * idf = ln(1 + (docCount - df + 0.5)/(df + 0.5))  (lines 71-74)
  * avgdl = sumTotalTermFreq / docCount              (lines 86-97)
  * norm byte = floatToByte315(boost / sqrt(fieldLength)) (99-105) —
    the legacy pre-LUCENE-7730 encoding this snapshot pins.
  * NORM_TABLE[i] = 1/f², f = byte315ToFloat(i), NORM_TABLE[0]
    = 1/NORM_TABLE[255] (lines 134-143)
  * cache[i] = k1 * ((1-b) + b * NORM_TABLE[i] / avgdl) (213-218)
  * weight = boost * idf * (k1+1), all float32 (229-254)
  * score(doc) = weight * tf / (tf + cache[norm_byte]), float32
  * multi-clause sums accumulate in float64 then cast to float32
    (ConjunctionScorer.java:54-60, DisjunctionSumScorer.java:36-42).

All kernels operate on numpy arrays so they can run inside Arrow UDFs
without per-row Python.
"""

from __future__ import annotations

import numpy as np

K1_DEFAULT = np.float32(1.2)
B_DEFAULT = np.float32(0.75)


def float_to_byte315(f: np.ndarray | float) -> np.ndarray:
    """SmallFloat.floatToByte(f, numMantissaBits=3, zeroExp=15).

    Vectorized port of SmallFloat.java:78-88.
    """
    f = np.asarray(f, dtype=np.float32)
    bits = f.view(np.int32)
    small = bits >> (24 - 3)  # arithmetic shift, like Java
    fzero = (63 - 15) << 3
    out = (small - fzero).astype(np.int32)
    out = np.where(small <= fzero, np.where(bits <= 0, 0, 1), out)
    out = np.where(small >= fzero + 0x100, 255, out)  # (byte)-1 == 0xFF
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray | int) -> np.ndarray:
    """SmallFloat.byte315ToFloat (SmallFloat.java:90-98)."""
    b = np.atleast_1d(np.asarray(b, dtype=np.uint8)).astype(np.int32)
    bits = (b << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32).copy()
    out[b == 0] = 0.0
    return out


def length_norm_byte(field_length: np.ndarray | int, boost: float = 1.0) -> np.ndarray:
    """Index-time norm byte: floatToByte315(boost/sqrt(length)).

    BM25Similarity.computeNorm (BM25Similarity.java:99-105); length is
    the emitted-token count minus overlaps (discountOverlaps=true).
    """
    length = np.asarray(field_length, dtype=np.float64)
    with np.errstate(divide="ignore"):  # doclen 0 -> inf -> byte 255
        f = (np.float32(boost) / np.sqrt(length).astype(np.float32)).astype(np.float32)
    return float_to_byte315(f)


# --- static tables -------------------------------------------------------

def _build_norm_table() -> np.ndarray:
    # BM25Similarity static block (lines 134-143)
    table = np.zeros(256, dtype=np.float32)
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    with np.errstate(divide="ignore"):
        table[1:] = (np.float32(1.0) / (f[1:] * f[1:])).astype(np.float32)
    table[0] = np.float32(1.0) / table[255]
    return table


NORM_TABLE = _build_norm_table()


class BM25:
    """A compiled per-(collection, field) BM25 scorer.

    Mirrors BM25Similarity.BM25Stats + the per-field norm cache
    (BM25Similarity.java:208-218): the cache depends only on avgdl and
    (k1, b), so it's computed once per query and broadcast.
    """

    def __init__(self, doc_count: int, sum_total_term_freq: int,
                 k1: float = 1.2, b: float = 0.75):
        self.doc_count = int(doc_count)
        self.sum_ttf = int(sum_total_term_freq)
        self.k1 = np.float32(k1)
        self.b = np.float32(b)
        # avgFieldLength (BM25Similarity.java:86-97): float division of
        # the two longs -> float32.
        self.avgdl = np.float32(self.sum_ttf / float(self.doc_count))
        # cache[i] = k1 * ((1-b) + b * NORM_TABLE[i] / avgdl), float32
        self.cache = (
            self.k1
            * ((np.float32(1) - self.b) + self.b * NORM_TABLE / self.avgdl)
        ).astype(np.float32)

    def idf(self, doc_freq: np.ndarray | int) -> np.ndarray:
        """ln(1 + (N - df + 0.5)/(df + 0.5)) — computed in float64
        (Math.log) then kept; Lucene stores it in a float Explanation
        but multiplies as float32 weight."""
        df = np.asarray(doc_freq, dtype=np.float64)
        n = float(self.doc_count)
        return np.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def term_weight(self, doc_freq: np.ndarray | int, boost: float = 1.0) -> np.ndarray:
        """weight = boost * idf * (k1 + 1), float32
        (BM25Similarity.java:229-254)."""
        idf = self.idf(doc_freq)
        return (np.float32(boost) * idf.astype(np.float32) * (self.k1 + np.float32(1))).astype(np.float32)

    def score(self, weight: np.ndarray, tf: np.ndarray, norm_byte: np.ndarray) -> np.ndarray:
        """Per-doc float32 score: weight * tf / (tf + cache[norm])."""
        tf32 = np.asarray(tf, dtype=np.float32)
        c = self.cache[np.asarray(norm_byte, dtype=np.uint8)]
        return (np.asarray(weight, dtype=np.float32) * tf32 / (tf32 + c)).astype(np.float32)

    def block_max_bound(self, weight: np.float32, max_tf: np.ndarray,
                        max_norm_byte: np.ndarray) -> np.ndarray:
        """Upper bound on any in-block score (our block-max extension,
        Ding & Suel SIGIR'11): score is increasing in tf and
        decreasing in cache[norm]; cache is decreasing in the norm
        byte (larger byte = shorter doc), so the bound uses
        (max_tf, max_norm_byte)."""
        return self.score(weight, max_tf, max_norm_byte)
