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


class SweetSpotScorer(ClassicScorer):
    """SweetSpotSimilarity (misc/SweetSpotSimilarity.java:95-166):
    ClassicSimilarity with tunable "sweet spot" curves — a plateau
    length norm ``1/sqrt(steepness*(|len-min|+|len-max|-(max-min))+1)``
    (== 1.0 for min <= len <= max) and ``baselineTf`` ``freq <= min ?
    base : sqrt(freq + base^2 - min)``. The defaults (min=max=1,
    steepness=0.5, base=min=0) degrade exactly to ClassicSimilarity,
    per the class javadoc."""

    def __init__(self, doc_count: int, sum_total_term_freq: int = 0,
                 k1: float = 0.0, b: float = 0.0, *,
                 ln_min: int = 1, ln_max: int = 1, steepness: float = 0.5,
                 tf_base: float = 0.0, tf_min: float = 0.0):
        super().__init__(doc_count, sum_total_term_freq)
        lt = LENGTH_TABLE.astype(np.float64)
        # inner sum in float32 like the Java expression
        # (s * (float)(|x-l| + |x-h| - (h-l)) + 1.0f), sqrt in double
        inner = (np.float32(steepness)
                 * (np.abs(lt - ln_min) + np.abs(lt - ln_max)
                    - (ln_max - ln_min)).astype(np.float32)
                 + np.float32(1.0))
        tbl = (1.0 / np.sqrt(inner.astype(np.float64))).astype(np.float32)
        tbl[lt == 0] = np.float32(0.0)
        self.cache = tbl
        self.tf_base = float(tf_base)
        self.tf_min = float(tf_min)

    def partial(self, freq, norm_byte, weight_f32) -> np.ndarray:
        f = np.asarray(freq, dtype=np.float64)
        with np.errstate(invalid="ignore"):  # f <= tf_min branch masked
            tf = np.where(
                f <= self.tf_min,
                np.float32(self.tf_base),
                np.sqrt(f + self.tf_base * self.tf_base - self.tf_min)
                .astype(np.float32)).astype(np.float32)
        tf = np.where(f == 0, np.float32(0.0), tf)  # baselineTf 0-check
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


class StatsScorer:
    """Base for the SimilarityBase family
    (search/similarities/SimilarityBase.java): per-(term, doc) scores
    need the term's collection stats (df, totalTermFreq), not just a
    precomputed scalar weight, so these scorers add a 5th hook:

        stats_partial(freq, norm_byte, boost, df, ttf) -> float32[]

    fully vectorized — ``boost``/``df``/``ttf`` may be scalars or
    per-row arrays (the batched multi-term scan passes arrays). The
    ``needs_ttf`` flag routes engines to this hook; queries whose
    weight cannot be expressed per-term this way (phrase, multi-term
    rewrites) raise — use bm25/classic there. Doc length is decoded
    from the norm byte exactly like the reference
    (SimilarityBase.BasicSimScorer.getLengthValue → LENGTH_TABLE),
    and the final score is one float32 cast of the float64 formula
    (BasicSimScorer.score's ``(float)`` cast)."""

    needs_ttf = True

    def __init__(self, doc_count: int, sum_total_term_freq: int = 0,
                 k1: float = 0.0, b: float = 0.0):
        self.doc_count = max(int(doc_count), 1)
        self.sum_ttf = max(int(sum_total_term_freq), 1)
        # avgFieldLength = sumTotalTermFreq / docCount
        # (SimilarityBase.fillBasicStats)
        self.avg_dl = self.sum_ttf / self.doc_count
        self.cache = np.zeros(256, dtype=np.float32)  # protocol parity

    # float64 formula over (freq, dl) with per-row stats — subclass hook
    def _score(self, freq, dl, boost, df, ttf):  # pragma: no cover
        raise NotImplementedError

    def stats_partial(self, freq, norm_byte, boost, df, ttf) -> np.ndarray:
        f = np.asarray(freq, dtype=np.float64)
        dl = LENGTH_TABLE[np.asarray(norm_byte, dtype=np.int64) & 0xFF
                          ].astype(np.float64)
        s = self._score(f, dl, np.asarray(boost, dtype=np.float64),
                        np.asarray(df, dtype=np.float64),
                        np.asarray(ttf, dtype=np.float64))
        return s.astype(np.float32)

    # -- 4-hook protocol: only idf is meaningful (explain/plan uses) --
    def idf(self, doc_freq):
        df = np.asarray(doc_freq, dtype=np.float64)
        return np.log1p((self.doc_count - df + 0.5) / (df + 0.5)).astype(
            np.float32)

    def weight(self, doc_freq: int, boost: float = 1.0):
        raise TypeError(
            f"{type(self).__name__} scores from per-term collection stats "
            "(needs_ttf); engines must call stats_partial — this query "
            "shape is unsupported under LM/DFR similarities")

    weight_from_idf_sum = weight

    def partial(self, freq, norm_byte, weight_f32):
        raise TypeError(
            f"{type(self).__name__} needs per-term stats; use stats_partial")


class LMDirichletScorer(StatsScorer):
    """LMDirichletSimilarity (LMDirichletSimilarity.java:72-77), mu=2000
    default; collection model = DefaultCollectionModel
    (LMSimilarity.java:154-156): p_c = (ttf + 1) / (sumTotalTermFreq + 1).

    score = boost * (ln(1 + freq / (mu * p_c)) + ln(mu / (dl + mu))),
    clamped at 0 (the paper's negative scores are dropped)."""

    MU = 2000.0

    def _score(self, freq, dl, boost, df, ttf):
        p_c = (ttf + 1.0) / (self.sum_ttf + 1.0)
        s = boost * (np.log1p(freq / (self.MU * p_c))
                     + np.log(self.MU / (dl + self.MU)))
        return np.maximum(s, 0.0)


class LMJelinekMercerScorer(StatsScorer):
    """LMJelinekMercerSimilarity (LMJelinekMercerSimilarity.java:63-68),
    lambda=0.1 (short-query default per the class javadoc):
    score = boost * ln(1 + ((1-λ) * freq / dl) / (λ * p_c))."""

    LAMBDA = 0.1

    def _score(self, freq, dl, boost, df, ttf):
        p_c = (ttf + 1.0) / (self.sum_ttf + 1.0)
        lam = self.LAMBDA
        return boost * np.log1p(((1.0 - lam) * freq / dl) / (lam * p_c))


_LOG2 = np.log(2.0)


class DFRScorer(StatsScorer):
    """DFRSimilarity with BasicModelG + AfterEffectB + NormalizationH2
    (c=1) — the divergence-from-randomness composition
    (DFRSimilarity.java:109-114):

      tfn  = freq * log2(1 + c * avgFieldLength / dl)   (NormalizationH2.java:58-60)
      ae   = (F + 1) / n, F = ttf+1, n = df+1            (AfterEffectB.java:32-36)
      λ    = F / (N + F); A = log2(λ+1); B = log2((1+λ)/λ)
      base = (B - (B - A) / (1 + tfn)) * ae              (BasicModelG.java:36-50)
      score = boost * base
    """

    C = 1.0

    def _score(self, freq, dl, boost, df, ttf):
        tfn = freq * np.log1p(self.C * self.avg_dl / dl) / _LOG2
        F = ttf + 1.0
        n = df + 1.0
        ae = (F + 1.0) / n
        lam = F / (self.doc_count + F)
        A = np.log1p(lam) / _LOG2
        B = np.log((1.0 + lam) / lam) / _LOG2
        return boost * (B - (B - A) / (1.0 + tfn)) * ae


class DFRInLScorer(DFRScorer):
    """DFRSimilarity with BasicModelIn + AfterEffectL + NormalizationH2:
      ae = 1 (AfterEffectL.java:32-33)
      A  = log2((N + 1) / (n + 0.5)); base = A * (1 - 1/(1+tfn))
      (BasicModelIn.java:33-43)"""

    def _score(self, freq, dl, boost, df, ttf):
        tfn = freq * np.log1p(self.C * self.avg_dl / dl) / _LOG2
        A = np.log2((self.doc_count + 1.0) / (df + 0.5))
        return boost * A * (1.0 - 1.0 / (1.0 + tfn))


class IBSPLScorer(StatsScorer):
    """IBSimilarity with DistributionSPL + LambdaDF + NormalizationH2
    (c=1) — the information-based framework (IBSimilarity.java:99-105):

      tfn = freq * log2(1 + c * avgFieldLength / dl)  (NormalizationH2.java:58-59)
      λ   = float32((df + 1) / (N + 1)), nextDown if == 1 (LambdaDF.java:32-38)
      q   = 1 - 1/(tfn+1), nextDown if == 1
      score = boost * -ln((λ^q - λ) / (1 - λ))        (DistributionSPL.java:36-59,
              with the pow==λ nextUp/nextDown float guard)
    """

    C = 1.0

    def _lambda(self, df):
        # LambdaDF returns a float32; Distribution consumes it as float64
        lam = np.asarray((df + 1.0) / (self.doc_count + 1.0),
                         dtype=np.float32)
        one = np.float32(1.0)
        lam = np.where(lam == one, np.nextafter(one, np.float32(0.0)), lam)
        return lam.astype(np.float64)

    def _distribution(self, tfn, lam):
        q = 1.0 - 1.0 / (tfn + 1.0)
        q = np.where(q == 1.0, np.nextafter(1.0, 0.0), q)
        pw = np.power(lam, q)
        # float-rounding guard: pow must differ from lambda or the log
        # below returns -inf (DistributionSPL.java:46-56)
        bump = np.where(lam < 1.0, np.nextafter(lam, np.inf),
                        np.nextafter(lam, -np.inf))
        pw = np.where(pw == lam, bump, pw)
        return -np.log((pw - lam) / (1.0 - lam))

    def _score(self, freq, dl, boost, df, ttf):
        tfn = freq * np.log1p(self.C * self.avg_dl / dl) / _LOG2
        return boost * self._distribution(tfn, self._lambda(df))


class IBLLScorer(IBSPLScorer):
    """IBSimilarity with DistributionLL + LambdaDF + NormalizationH2:
    score = boost * -ln(λ / (tfn + λ))  (DistributionLL.java:33-34)."""

    def _distribution(self, tfn, lam):
        return -np.log(lam / (tfn + lam))


class AxiomaticF2EXPScorer(StatsScorer):
    """AxiomaticF2EXP (Axiomatic.java:103-113, AxiomaticF2EXP.java:61-94),
    defaults s=0.25, k=0.35 (Axiomatic.java:99-101):

      tfln  = freq / (freq + s + s * dl / avgFieldLength)
      idf   = ((N + 1) / df) ^ k
      score = max(0, boost * tfln * idf)   (tf=ln=1, gamma=0 for F2EXP)
    """

    S = 0.25
    K = 0.35

    def _idf(self, df):
        return np.power((self.doc_count + 1.0) / df, self.K)

    def _score(self, freq, dl, boost, df, ttf):
        tfln = freq / (freq + self.S + self.S * dl / self.avg_dl)
        return np.maximum(boost * tfln * self._idf(df), 0.0)


class AxiomaticF2LOGScorer(AxiomaticF2EXPScorer):
    """AxiomaticF2LOG: idf = ln((N + 1) / df)
    (AxiomaticF2LOG.java:77-79); same tfln/gamma as F2EXP."""

    def _idf(self, df):
        return np.log((self.doc_count + 1.0) / df)


class DFIStandardizedScorer(StatsScorer):
    """DFISimilarity with IndependenceStandardized — divergence from
    independence (DFISimilarity.java:59-70):

      expected = (ttf + 1) * dl / (sumTotalTermFreq + 1)
      0 when freq <= expected (the "less frequent than by chance" cut)
      measure  = (freq - expected) / sqrt(expected)
                 (IndependenceStandardized.java:28-30)
      score    = boost * log2(measure + 1)
    """

    def _measure(self, freq, expected):
        return (freq - expected) / np.sqrt(expected)

    def _score(self, freq, dl, boost, df, ttf):
        expected = (ttf + 1.0) * dl / (self.sum_ttf + 1.0)
        # measure+1 can be <= 0 exactly where the freq<=expected cut
        # discards the value anyway — mask instead of warning
        with np.errstate(invalid="ignore", divide="ignore"):
            s = boost * np.log2(self._measure(freq, expected) + 1.0)
        return np.where(freq <= expected, 0.0, s)


class DFIChiSquaredScorer(DFIStandardizedScorer):
    """DFISimilarity with IndependenceChiSquared:
    measure = (freq - expected)^2 / expected
    (IndependenceChiSquared.java:28-30)."""

    def _measure(self, freq, expected):
        d = freq - expected
        return d * d / expected


class DFISaturatedScorer(DFIStandardizedScorer):
    """DFISimilarity with IndependenceSaturated:
    measure = (freq - expected) / expected
    (IndependenceSaturated.java:27-29)."""

    def _measure(self, freq, expected):
        return (freq - expected) / expected


SIMILARITIES = {"bm25": BM25Scorer, "classic": ClassicScorer,
                "boolean": BooleanScorer,
                "lm_dirichlet": LMDirichletScorer,
                "lm_jelinek_mercer": LMJelinekMercerScorer,
                "dfr": DFRScorer, "dfr_in_l_h2": DFRInLScorer,
                "ib_spl_df_h2": IBSPLScorer, "ib_ll_df_h2": IBLLScorer,
                "axiomatic_f2exp": AxiomaticF2EXPScorer,
                "axiomatic_f2log": AxiomaticF2LOGScorer,
                "dfi_standardized": DFIStandardizedScorer,
                "dfi_chi_squared": DFIChiSquaredScorer,
                "dfi_saturated": DFISaturatedScorer,
                "sweet_spot": SweetSpotScorer}


def resolve_field_similarity(similarity, field: str):
    """PerFieldSimilarityWrapper (search/similarities/
    PerFieldSimilarityWrapper.java: ``get(String field)`` dispatch, the
    Solr schema's per-fieldType similarity model): a dict similarity
    spec maps field → similarity, with ``"*"`` as the default (bm25 —
    IndexSearcher.java:116 — when absent). Non-dict specs apply to
    every field."""
    if isinstance(similarity, dict):
        return similarity.get(field, similarity.get("*", "bm25"))
    return similarity


def make_scorer(name, doc_count: int, sum_ttf: int):
    """Resolve a similarity: a registry name, or a callable
    ``(doc_count, sum_ttf) -> scorer`` for CONFIGURED similarities
    (e.g. ``lambda dc, st: SweetSpotScorer(dc, st, ln_min=3,
    ln_max=10)`` — the setLengthNormFactors/setBaselineTfFactors
    role)."""
    if callable(name) and not isinstance(name, str):
        return name(doc_count, sum_ttf)
    try:
        cls = SIMILARITIES[name]
    except KeyError:
        raise ValueError(f"unknown similarity {name!r}; "
                         f"one of {sorted(SIMILARITIES)}") from None
    return cls(doc_count, sum_ttf)
