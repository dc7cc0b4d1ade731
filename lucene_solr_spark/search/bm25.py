"""BM25 scoring with Lucene's exact float discipline.

Formulas and float32/float64 mixing follow
lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java:
  idf   = (float) ln(1 + (docCount - df + 0.5) / (df + 0.5))      (:69-72)
  avgdl = (float) (sumTotalTermFreq / (double) docCount)          (:79-82)
  cache[b] = k1 * ((1-b_) + b_ * LENGTH_TABLE[b] / avgdl)  float32 (:219)
  weight = (k1 + 1) * boost * idf                          float32 (:222)
  score(freq, normByte) = weight * (float)(freq / (freq + cache[normByte]))
      — division in float64, cast to float32, product in float32 (:223-226)
Multi-clause sums accumulate in float64 and cast to float32 once
(ConjunctionScorer.java:58-64, WANDScorer.java:445-453,
DisjunctionSumScorer / BooleanScorer Bucket.score is double).

All vectorized in numpy; used identically by the pure-Python oracle and
by the Spark pandas-UDF scoring path, which is what makes
rank-identical output testable.
"""

from __future__ import annotations

import numpy as np

from ..util.smallfloat import LENGTH_TABLE

K1_DEFAULT = np.float32(1.2)  # BM25Similarity.java:65-67
B_DEFAULT = np.float32(0.75)


def idf(doc_freq: int | np.ndarray, doc_count: int) -> np.float32 | np.ndarray:
    """(float) log(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5))."""
    df = np.asarray(doc_freq, dtype=np.float64)
    val = np.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))
    return val.astype(np.float32)


def avgdl(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """(float)(sumTotalTermFreq / (double) docCount)."""
    return np.float32(np.float64(sum_total_term_freq) / np.float64(doc_count))


def norm_cache(avg_dl: np.float32, k1: np.float32 = K1_DEFAULT, b: np.float32 = B_DEFAULT) -> np.ndarray:
    """cache[i] = k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl), float32 ops
    (BM25Similarity.java:219)."""
    k1 = np.float32(k1)
    b = np.float32(b)
    one = np.float32(1.0)
    # Java evaluates in float left-to-right: b * LENGTH_TABLE[i] / avgdl
    t = (b * LENGTH_TABLE).astype(np.float32)
    t = (t / np.float32(avg_dl)).astype(np.float32)
    t = ((one - b) + t).astype(np.float32)
    return (k1 * t).astype(np.float32)


def term_weight(idf_f32: np.float32 | np.ndarray, boost: float = 1.0,
                k1: np.float32 = K1_DEFAULT) -> np.float32 | np.ndarray:
    """weight = (k1 + 1) * boost * idf, float32 (BM25Similarity.java:222)."""
    k1p1 = (np.float32(k1) + np.float32(1.0)).astype(np.float32)
    w = (k1p1 * np.float32(boost)).astype(np.float32)
    return (w * np.asarray(idf_f32, dtype=np.float32)).astype(np.float32)


def score_terms(freq: np.ndarray, norm_byte: np.ndarray, weight_f32: np.ndarray,
                cache_f32: np.ndarray) -> np.ndarray:
    """Per-(term,doc) float32 BM25 partial scores, vectorized.

    score = weight * (float)((double) freq / ((double) freq + (double) cache[normByte]))
    (BM25Similarity.java:223-226: freq/(freq+norm) division in double,
    cast to float, multiplied by float weight).
    """
    f = np.asarray(freq, dtype=np.float64)
    n = cache_f32[np.asarray(norm_byte, dtype=np.int64) & 0xFF].astype(np.float64)
    tf_part = (f / (f + n)).astype(np.float32)
    return (np.asarray(weight_f32, dtype=np.float32) * tf_part).astype(np.float32)


def sum_scores_f32(per_clause_f32: np.ndarray, axis=None) -> np.ndarray:
    """Accumulate clause scores in float64, cast to float32 once at the
    end (BooleanScorer Bucket.score double; WANDScorer.java:445-453)."""
    return np.sum(np.asarray(per_clause_f32, dtype=np.float64), axis=axis).astype(np.float32)


class BM25Scorer:
    """Per-query scorer bound to collection stats, mirroring
    BM25Similarity.scorer(...) (BM25Similarity.java:184-226)."""

    def __init__(self, doc_count: int, sum_total_term_freq: int,
                 k1: float = 1.2, b: float = 0.75):
        self.doc_count = int(doc_count)
        self.sum_ttf = int(sum_total_term_freq)
        self.k1 = np.float32(k1)
        self.b = np.float32(b)
        self.avgdl = avgdl(self.sum_ttf, self.doc_count)
        self.cache = norm_cache(self.avgdl, self.k1, self.b)

    def weight(self, doc_freq: int, boost: float = 1.0) -> np.float32:
        return term_weight(idf(doc_freq, self.doc_count), boost, self.k1)

    # -- pluggable-similarity hooks (search/similarities.py) ------------
    def idf(self, doc_freq):
        return idf(doc_freq, self.doc_count)

    def weight_from_idf_sum(self, idf_f32, boost: float = 1.0) -> np.float32:
        return term_weight(idf_f32, boost, self.k1)

    def partial(self, freq, norm_byte, weight_f32) -> np.ndarray:
        return score_terms(freq, norm_byte,
                           np.asarray(weight_f32, dtype=np.float32), self.cache)

    def score(self, freq, norm_byte, doc_freq: int, boost: float = 1.0) -> np.ndarray:
        w = self.weight(doc_freq, boost)
        return score_terms(np.atleast_1d(freq), np.atleast_1d(norm_byte),
                           w, self.cache)
