"""Pluggable similarity family (search/similarities/Similarity.java).

Every scorer exposes the same four hooks the engines consume, so a
similarity swap is one constructor argument on IndexSearcher /
OracleIndex (the Lucene IndexSearcher.setSimilarity role):

  idf(df)                      float32 per-term idf
  weight(df, boost)            float32 query weight for one term
  weight_from_idf_sum(s, b)    float32 weight from a summed idf
                               (phrase/multi-phrase, idfExplain over
                               termStats[])
  partial(freq, norm, w)       vectorized float32 per-(term,doc) score

``BM25Scorer`` (search/bm25.py) is the default; ``ClassicScorer``
reimplements ClassicSimilarity / TFIDFSimilarity with the same float
discipline:

  idf  = (float)(ln((docCount + 1) / (df + 1)) + 1)
         (ClassicSimilarity.idfExplain → TFIDFSimilarity)
  tf   = (float) sqrt(freq)                (ClassicSimilarity.tf)
  norm = (float)(1 / sqrt(length))         (lengthNorm; norms store the
         SmallFloat length byte exactly like BM25, so the same index
         serves both similarities — Lucene 8 semantics)
  score(freq, normByte) = queryWeight * tf * normTable[normByte]
         with queryWeight = (float)(boost * idf)  (TFIDFScorer.score)
"""

from __future__ import annotations

import numpy as np

from ..util.smallfloat import LENGTH_TABLE
from .bm25 import BM25Scorer  # noqa: F401  (the default family)


class ClassicScorer:
    """ClassicSimilarity (search/similarities/ClassicSimilarity.java,
    TFIDFSimilarity.java) with exact float32 discipline."""

    def __init__(self, doc_count: int, sum_total_term_freq: int = 0,
                 k1: float = 0.0, b: float = 0.0):
        self.doc_count = int(doc_count)
        self.sum_ttf = int(sum_total_term_freq)  # unused (API parity)
        # normTable[i] = (float)(1 / sqrt(LENGTH_TABLE[i])); length 0
        # never scores (no postings), keep 0 to stay finite
        lt = LENGTH_TABLE.astype(np.float64)
        with np.errstate(divide="ignore"):
            tbl = (1.0 / np.sqrt(lt)).astype(np.float32)
        tbl[lt == 0] = np.float32(0.0)
        self.cache = tbl

    def idf(self, doc_freq: int | np.ndarray) -> np.float32 | np.ndarray:
        df = np.asarray(doc_freq, dtype=np.float64)
        val = np.log((self.doc_count + 1.0) / (df + 1.0)) + 1.0
        return val.astype(np.float32)

    def weight(self, doc_freq: int, boost: float = 1.0) -> np.float32:
        return self.weight_from_idf_sum(self.idf(doc_freq), boost)

    def weight_from_idf_sum(self, idf_f32, boost: float = 1.0) -> np.float32:
        # queryWeight = boost * idf, float mult (TFIDFSimilarity.scorer)
        return (np.float32(boost) * np.asarray(idf_f32, dtype=np.float32)
                ).astype(np.float32)

    def partial(self, freq, norm_byte, weight_f32) -> np.ndarray:
        """score = (tf(freq) * queryWeight) * normTable[normByte], every
        product in float32 (TFIDFScorer.score order: raw = tf * weight,
        then * norm)."""
        f = np.asarray(freq, dtype=np.float64)
        tf = np.sqrt(f).astype(np.float32)
        w = np.asarray(weight_f32, dtype=np.float32)
        raw = (tf * w).astype(np.float32)
        n = self.cache[np.asarray(norm_byte, dtype=np.int64) & 0xFF]
        return (raw * n).astype(np.float32)


class BooleanScorer:
    """BooleanSimilarity (search/similarities/BooleanSimilarity.java):
    every matching (term, doc) scores exactly the query boost — no tf,
    no idf, no length norm (the javadoc's "simple similarity for
    matching-only scoring"). Fits the 4-hook protocol exactly: weight
    is the boost, partial broadcasts it."""

    def __init__(self, doc_count: int, sum_total_term_freq: int = 0,
                 k1: float = 0.0, b: float = 0.0):
        self.doc_count = int(doc_count)
        self.sum_ttf = int(sum_total_term_freq)
        self.cache = np.zeros(256, dtype=np.float32)  # unused (parity)

    def idf(self, doc_freq):
        return np.float32(np.ones_like(np.asarray(doc_freq, dtype=np.float32)))

    def weight(self, doc_freq: int, boost: float = 1.0) -> np.float32:
        return np.float32(boost)

    def weight_from_idf_sum(self, idf_f32, boost: float = 1.0) -> np.float32:
        return np.float32(boost)

    def partial(self, freq, norm_byte, weight_f32) -> np.ndarray:
        w = np.asarray(weight_f32, dtype=np.float32)
        return np.broadcast_to(
            w, np.asarray(freq).shape).astype(np.float32) \
            if w.ndim == 0 else w.astype(np.float32)


SIMILARITIES = {"bm25": BM25Scorer, "classic": ClassicScorer,
                "boolean": BooleanScorer}


def make_scorer(name: str, doc_count: int, sum_ttf: int):
    try:
        cls = SIMILARITIES[name]
    except KeyError:
        raise ValueError(f"unknown similarity {name!r}; "
                         f"one of {sorted(SIMILARITIES)}") from None
    return cls(doc_count, sum_ttf)
