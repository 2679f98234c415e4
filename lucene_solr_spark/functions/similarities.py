"""Alternate similarity families as Catalyst column builders.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
(DFRSimilarity.java, IBSimilarity.java, LMJelinekMercerSimilarity.java
and their pluggable components). Each builder returns a DOUBLE Column
over a (term, docid, tf, doclen) frame — the engine's sql-mode scoring
tier (cross-engine reproducible after floor(x*1e6) quantization; the
reference's float32 rounding is a documented sub-ulp deviation).

DFR lattice (DFRSimilarity.java:110-114 — score = basic model x
after effect, over a normalized tf):
  normalizations: H1 (NormalizationH1.java: tfn = c * tf * avgdl/dl),
                  H2 (NormalizationH2.java: tfn = tf * log2(1 + c*avgdl/dl))
  basic models:   In  (BasicModelIn.java:  tfn * log2((N+1)/(df+0.5)))
                  G   (BasicModelG.java:   lambda = F/(N+F);
                       log2(lambda+1) + tfn*log2((1+lambda)/lambda))
                  IF  (BasicModelIF.java:  tfn * log2(1 + (N+1)/(F+0.5)))
                  Ine (BasicModelIne.java: ne = N*(1 - ((N-1)/N)^F);
                       tfn * log2((N+1)/(ne+0.5)))
  after effects:  L   (AfterEffectL.java:  1/(tfn+1))
                  B   (AfterEffectB.java:  (F+1)/(df*(tfn+1)))

IB lattice (IBSimilarity.java:120-127):
  distributions:  LL  (DistributionLL.java:  -ln(lambda/(tfn+lambda)))
                  SPL (DistributionSPL.java:
                       -log2((lambda^(tfn/(tfn+1)) - lambda)/(1-lambda)))
  lambdas:        D   (LambdaDF.java:  (df+1)/(N+1))
                  T   (LambdaTTF.java: (F+1)/(N+1))

LM Jelinek-Mercer (LMJelinekMercerSimilarity.java:40-44):
  score = log(1 + ((1-lambda) * tf/dl) / (lambda * P(t|C))),
  P(t|C) = F / sum_ttf (LMSimilarity.DefaultCollectionModel).

N = doc count, df = term doc freq, F = term total term freq (ttf).
SHOULD clauses sum per doc, like the reference's BooleanQuery fold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["tfn_h1", "tfn_h2", "dfr_score", "ib_score", "lmjm_score"]

_LOG2E = 1.4426950408889634  # log2(x) = ln(x) * _LOG2E


def tfn_h1(tf: Column, doclen: Column, avgdl: float, c: float = 1.0) -> Column:
    """NormalizationH1: tfn = c * tf * avgdl / dl."""
    return F.lit(c) * tf.cast("double") * F.lit(avgdl) / doclen.cast("double")


def tfn_h2(tf: Column, doclen: Column, avgdl: float, c: float = 1.0) -> Column:
    """NormalizationH2: tfn = tf * log2(1 + c * avgdl / dl)."""
    return tf.cast("double") * F.log2(
        F.lit(1.0) + F.lit(c) * F.lit(avgdl) / doclen.cast("double"))


def dfr_score(tfn: Column, *, basic: str, after: str, n_docs: float,
              df: Column, ttf: Column) -> Column:
    """One DFR lattice cell: ``basic`` in {'In','G','IF','Ine'},
    ``after`` in {'L','B'}. df/ttf are per-term double columns."""
    if basic == "In":
        info = tfn * F.log2(F.lit(n_docs + 1.0) / (df + F.lit(0.5)))
    elif basic == "G":
        lam = ttf / (F.lit(n_docs) + ttf)
        info = (F.log2(lam + F.lit(1.0))
                + tfn * F.log2((F.lit(1.0) + lam) / lam))
    elif basic == "IF":
        info = tfn * F.log2(F.lit(1.0)
                            + F.lit(n_docs + 1.0) / (ttf + F.lit(0.5)))
    elif basic == "Ine":
        ne = F.lit(n_docs) * (F.lit(1.0) - F.pow(
            F.lit((n_docs - 1.0) / n_docs), ttf))
        info = tfn * F.log2(F.lit(n_docs + 1.0) / (ne + F.lit(0.5)))
    else:
        raise ValueError(f"unknown DFR basic model {basic!r}")
    if after == "L":
        ae = F.lit(1.0) / (tfn + F.lit(1.0))
    elif after == "B":
        ae = (ttf + F.lit(1.0)) / (df * (tfn + F.lit(1.0)))
    else:
        raise ValueError(f"unknown DFR after effect {after!r}")
    return info * ae


def ib_score(tfn: Column, *, distribution: str, lam: Column) -> Column:
    """One IB lattice cell: ``distribution`` in {'LL','SPL'}; ``lam``
    is the per-term lambda column (LambdaDF: (df+1)/(N+1); LambdaTTF:
    (ttf+1)/(N+1))."""
    if distribution == "LL":
        return -F.log(lam / (tfn + lam))
    if distribution == "SPL":
        return -(F.log((F.pow(lam, tfn / (tfn + F.lit(1.0))) - lam)
                       / (F.lit(1.0) - lam)) * F.lit(_LOG2E))
    raise ValueError(f"unknown IB distribution {distribution!r}")


def lmjm_score(tf: Column, doclen: Column, *, ttf: Column,
               sum_ttf: float, lam: float = 0.1) -> Column:
    """LMJelinekMercerSimilarity: log(1 + ((1-lam)*tf/dl) /
    (lam * F/sum_ttf))."""
    p_c = ttf / F.lit(float(sum_ttf))
    return F.log(F.lit(1.0)
                 + (F.lit(1.0 - lam) * tf.cast("double")
                    / doclen.cast("double")) / (F.lit(lam) * p_c))
