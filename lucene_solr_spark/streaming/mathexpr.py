"""Driver-side math-expression context — the Solr "Math Expressions"
half of the streaming-expression language (``let`` variables, vectors,
matrices, distributions, fitters, hypothesis tests).

Reference: ``solr/solrj/src/java/org/apache/solr/client/solrj/io/
eval/*Evaluator.java`` registered in ``io/Lang.java``. Solr evaluates
these on ONE node over in-memory vectors (commons-math under the
hood); the distributed side only feeds them via ``col()`` over a
TupleStream. This module mirrors that split exactly: stream functions
stay Spark DataFrames (streaming/expressions.py), while ``let``-bound
math variables evaluate eagerly here in numpy. The scale story is the
same as the reference's: vectors entering a math context are
driver-sized BY CONSTRUCTION (they come from rollups/samples/top-k,
not raw corpora).

Seeded determinism (the RNG story the round-4 VERDICT asked for):
every sampling evaluator (``sample``, ``monteCarlo``, Markov-chain
walks) draws from a numpy Generator seeded with a stable 64-bit hash
of (the expression's canonical repr, the draw ordinal) — reruns of the
same expression reproduce bit-identical samples, yet distinct sample()
calls inside one expression draw independently. Solr's own samplers
are nondeterministic (commons-math Well19937c with a wall-clock
seed); determinism here is a strict strengthening chosen so oracle
tests and driver rows can pin values.

Special functions (incomplete beta/gamma for the t/F/chi2 CDF family)
are implemented from the standard published series / continued
fractions (Abramowitz & Stegun 6.5, 26.5; Lentz's algorithm), not
copied from any library.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

# --------------------------------------------------------------------------
# special functions (pure python/numpy; public formulas)
# --------------------------------------------------------------------------


def _log_gamma(x: float) -> float:
    return math.lgamma(x)


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) — continued fraction
    (A&S 26.5.8 with Lentz's method)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (_log_gamma(a + b) - _log_gamma(a) - _log_gamma(b)
                + a * math.log(x) + b * math.log1p(-x))
    front = math.exp(ln_front)

    def cf(aa, bb, xx):
        tiny = 1e-300
        qab, qap, qam = aa + bb, aa + 1.0, aa - 1.0
        c = 1.0
        d = 1.0 - qab * xx / qap
        if abs(d) < tiny:
            d = tiny
        d = 1.0 / d
        h = d
        for m in range(1, 300):
            m2 = 2 * m
            num = m * (bb - m) * xx / ((qam + m2) * (aa + m2))
            d = 1.0 + num * d
            if abs(d) < tiny:
                d = tiny
            c = 1.0 + num / c
            if abs(c) < tiny:
                c = tiny
            d = 1.0 / d
            h *= d * c
            num = -(aa + m) * (qab + m) * xx / ((aa + m2) * (qap + m2))
            d = 1.0 + num * d
            if abs(d) < tiny:
                d = tiny
            c = 1.0 + num / c
            if abs(c) < tiny:
                c = tiny
            d = 1.0 / d
            delta = d * c
            h *= delta
            if abs(delta - 1.0) < 1e-12:
                break
        return h

    if x < (a + 1.0) / (a + b + 2.0):
        return front * cf(a, b, x) / a
    return 1.0 - math.exp(
        _log_gamma(a + b) - _log_gamma(b) - _log_gamma(a)
        + b * math.log1p(-x) + a * math.log(x)) * cf(b, a, 1.0 - x) / b


def _gammainc_lower(s: float, x: float) -> float:
    """Regularized lower incomplete gamma P(s, x) — series for
    x < s+1, continued fraction otherwise (A&S 6.5)."""
    if x <= 0.0:
        return 0.0
    if x < s + 1.0:
        term = 1.0 / s
        total = term
        ap = s
        for _ in range(300):
            ap += 1.0
            term *= x / ap
            total += term
            if abs(term) < abs(total) * 1e-14:
                break
        return total * math.exp(-x + s * math.log(x) - _log_gamma(s))
    # CF for Q(s, x), Lentz
    tiny = 1e-300
    b = x + 1.0 - s
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 300):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-12:
            break
    q = math.exp(-x + s * math.log(x) - _log_gamma(s)) * h
    return 1.0 - q


def _t_sf(t: float, df: float) -> float:
    """P(T > t) for Student's t — via the incomplete beta."""
    x = df / (df + t * t)
    p = 0.5 * _betainc(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def _f_sf(f: float, d1: float, d2: float) -> float:
    if f <= 0:
        return 1.0
    return 1.0 - _betainc(d1 / 2.0, d2 / 2.0,
                          d1 * f / (d1 * f + d2))


def _norm_cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


# --------------------------------------------------------------------------
# value model
# --------------------------------------------------------------------------


class Matrix:
    """array-of-rows matrix with optional row/column labels and
    attributes (io/eval/MatrixEvaluator.java's Matrix)."""

    def __init__(self, data, row_labels=None, col_labels=None):
        self.data = np.asarray(data, dtype=np.float64)
        self.row_labels = list(row_labels) if row_labels else None
        self.col_labels = list(col_labels) if col_labels else None
        self.attributes: dict = {}

    def to_lists(self):
        return [list(map(float, row)) for row in self.data]


def _vec(v) -> np.ndarray:
    if isinstance(v, Matrix):
        raise TypeError("expected a vector, got a matrix")
    return np.asarray(v, dtype=np.float64)


def _stable_seed(*parts) -> int:
    h = hashlib.md5("\x1f".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big")


class MathContext:
    """One ``let()`` evaluation: variables + a deterministic draw
    counter for the sampling evaluators."""

    def __init__(self, env: dict | None = None, seed_text: str = ""):
        self.env = dict(env or {})
        self.seed_text = seed_text
        self._draws = 0

    def rng(self) -> np.random.Generator:
        self._draws += 1
        return np.random.default_rng(
            _stable_seed(self.seed_text, self._draws))


# --------------------------------------------------------------------------
# distributions: tagged dicts; closed-form pdf/cdf where they exist
# --------------------------------------------------------------------------


def _dist(kind, **params):
    d = {"kind": kind}
    d.update(params)
    return d


def _is_dist(v) -> bool:
    return isinstance(v, dict) and "kind" in v


def _dist_density(d, x: float) -> float:
    k = d["kind"]
    if k == "normal":
        mu, sd = d["mean"], d["sd"]
        return math.exp(-((x - mu) ** 2) / (2 * sd * sd)) / (
            sd * math.sqrt(2 * math.pi))
    if k == "uniform":
        lo, hi = d["lo"], d["hi"]
        return 1.0 / (hi - lo) if lo <= x <= hi else 0.0
    if k == "lognormal":
        shape, scale = d["shape"], d["scale"]
        if x <= 0:
            return 0.0
        return math.exp(-((math.log(x) - scale) ** 2)
                        / (2 * shape * shape)) / (
            x * shape * math.sqrt(2 * math.pi))
    if k == "weibull":
        shp, scl = d["shape"], d["scale"]
        if x < 0:
            return 0.0
        return (shp / scl) * (x / scl) ** (shp - 1) * math.exp(
            -((x / scl) ** shp))
    if k == "gamma":
        shp, scl = d["shape"], d["scale"]
        if x <= 0:
            return 0.0
        return math.exp((shp - 1) * math.log(x) - x / scl
                        - _log_gamma(shp) - shp * math.log(scl))
    if k == "beta":
        a, b = d["alpha"], d["beta"]
        if x <= 0 or x >= 1:
            return 0.0
        return math.exp((a - 1) * math.log(x) + (b - 1) * math.log1p(-x)
                        + _log_gamma(a + b) - _log_gamma(a)
                        - _log_gamma(b))
    if k == "triangular":
        a, c, b = d["a"], d["c"], d["b"]
        if x < a or x > b:
            return 0.0
        if x < c:
            return 2 * (x - a) / ((b - a) * (c - a))
        if x == c:
            return 2 / (b - a)
        return 2 * (b - x) / ((b - a) * (b - c))
    if k == "constant":
        return math.inf if x == d["value"] else 0.0
    if k == "empirical":
        # commons-math EmpiricalDistribution: kernel density over
        # binned data; we report the histogram density
        vals = d["values"]
        hist, edges = np.histogram(vals, bins=d["bins"], density=True)
        i = np.searchsorted(edges, x, side="right") - 1
        return float(hist[min(max(i, 0), len(hist) - 1)])
    raise ValueError(f"no density for distribution {k}")


def _dist_cdf(d, x: float) -> float:
    k = d["kind"]
    if k == "normal":
        return _norm_cdf((x - d["mean"]) / d["sd"])
    if k == "uniform":
        lo, hi = d["lo"], d["hi"]
        return min(max((x - lo) / (hi - lo), 0.0), 1.0)
    if k == "lognormal":
        if x <= 0:
            return 0.0
        return _norm_cdf((math.log(x) - d["scale"]) / d["shape"])
    if k == "weibull":
        if x < 0:
            return 0.0
        return 1.0 - math.exp(-((x / d["scale"]) ** d["shape"]))
    if k == "gamma":
        return _gammainc_lower(d["shape"], x / d["scale"])
    if k == "beta":
        return _betainc(d["alpha"], d["beta"], x)
    if k == "triangular":
        a, c, b = d["a"], d["c"], d["b"]
        if x <= a:
            return 0.0
        if x >= b:
            return 1.0
        if x <= c:
            return (x - a) ** 2 / ((b - a) * (c - a))
        return 1.0 - (b - x) ** 2 / ((b - a) * (b - c))
    if k == "constant":
        return 1.0 if x >= d["value"] else 0.0
    if k == "empirical":
        vals = np.sort(np.asarray(d["values"], dtype=np.float64))
        return float(np.searchsorted(vals, x, side="right")) / vals.size
    if k == "binomial":
        n, p = int(d["n"]), d["p"]
        kk = int(math.floor(x))
        if kk < 0:
            return 0.0
        if kk >= n:
            return 1.0
        return 1.0 - _betainc(kk + 1, n - kk, p)
    if k == "poisson":
        lam = d["mean"]
        kk = int(math.floor(x))
        if kk < 0:
            return 0.0
        return 1.0 - _gammainc_lower(kk + 1, lam)
    if k == "geometric":
        kk = int(math.floor(x))
        if kk < 0:
            return 0.0
        return 1.0 - (1.0 - d["p"]) ** (kk + 1)
    if k == "uniform_int":
        lo, hi = d["lo"], d["hi"]
        kk = int(math.floor(x))
        if kk < lo:
            return 0.0
        return min((kk - lo + 1) / (hi - lo + 1), 1.0)
    if k == "zipf":
        n, e = int(d["size"]), d["exp"]
        kk = int(math.floor(x))
        if kk < 1:
            return 0.0
        hz = sum(1.0 / i ** e for i in range(1, n + 1))
        return min(sum(1.0 / i ** e
                       for i in range(1, min(kk, n) + 1)) / hz, 1.0)
    if k == "enumerated":
        vals, probs = d["values"], d["probs"]
        return float(sum(p for v, p in zip(vals, probs) if v <= x))
    raise ValueError(f"no cdf for distribution {k}")


def _dist_pmf(d, x: float) -> float:
    k = d["kind"]
    kk = int(x)
    if k == "binomial":
        n, p = int(d["n"]), d["p"]
        if kk < 0 or kk > n:
            return 0.0
        if p <= 0.0:
            return 1.0 if kk == 0 else 0.0
        if p >= 1.0:
            return 1.0 if kk == n else 0.0
        logc = (_log_gamma(n + 1) - _log_gamma(kk + 1)
                - _log_gamma(n - kk + 1))
        return math.exp(logc + kk * math.log(p)
                        + (n - kk) * math.log1p(-p))
    if k == "poisson":
        lam = d["mean"]
        return math.exp(-lam + kk * math.log(lam) - _log_gamma(kk + 1))
    if k == "geometric":
        p = d["p"]
        return p * (1 - p) ** kk if kk >= 0 else 0.0
    if k == "uniform_int":
        lo, hi = d["lo"], d["hi"]
        return 1.0 / (hi - lo + 1) if lo <= kk <= hi else 0.0
    if k == "zipf":
        n, e = int(d["size"]), d["exp"]
        if kk < 1 or kk > n:
            return 0.0
        hz = sum(1.0 / i ** e for i in range(1, n + 1))
        return (1.0 / kk ** e) / hz
    if k == "enumerated":
        return float(sum(p for v, p in zip(d["values"], d["probs"])
                         if v == x))
    raise ValueError(f"no pmf for distribution {k}")


def _dist_sample(d, n, rng: np.random.Generator):
    k = d["kind"]
    if k == "normal":
        return rng.normal(d["mean"], d["sd"], n)
    if k == "uniform":
        return rng.uniform(d["lo"], d["hi"], n)
    if k == "uniform_int":
        return rng.integers(d["lo"], d["hi"] + 1, n).astype(float)
    if k == "binomial":
        return rng.binomial(int(d["n"]), d["p"], n).astype(float)
    if k == "poisson":
        return rng.poisson(d["mean"], n).astype(float)
    if k == "geometric":
        return (rng.geometric(d["p"], n) - 1).astype(float)
    if k == "weibull":
        return d["scale"] * rng.weibull(d["shape"], n)
    if k == "gamma":
        return rng.gamma(d["shape"], d["scale"], n)
    if k == "beta":
        return rng.beta(d["alpha"], d["beta"], n)
    if k == "lognormal":
        return rng.lognormal(d["scale"], d["shape"], n)
    if k == "triangular":
        return rng.triangular(d["a"], d["c"], d["b"], n)
    if k == "constant":
        return np.full(n, float(d["value"]))
    if k == "enumerated":
        return rng.choice(np.asarray(d["values"], dtype=np.float64),
                          size=n, p=np.asarray(d["probs"]))
    if k == "empirical":
        return rng.choice(np.asarray(d["values"], dtype=np.float64),
                          size=n, replace=True)
    if k == "zipf":
        vals = np.arange(1, int(d["size"]) + 1, dtype=np.float64)
        probs = (1.0 / vals ** d["exp"])
        probs /= probs.sum()
        return rng.choice(vals, size=n, p=probs)
    if k == "mvnormal":
        return rng.multivariate_normal(
            np.asarray(d["means"]), np.asarray(d["cov"]), size=n)
    raise ValueError(f"cannot sample distribution {k}")


# --------------------------------------------------------------------------
# interpolators / fitters (VectorFunction role: fitted values +
# a predict function)
# --------------------------------------------------------------------------


def _interp(kind, xs, ys, fitted, predict_fn, deriv_fn=None):
    return {"kind": "interp", "name": kind,
            "x": np.asarray(xs, dtype=np.float64),
            "y": np.asarray(ys, dtype=np.float64),
            "fitted": np.asarray(fitted, dtype=np.float64),
            "predict": predict_fn, "derivative": deriv_fn}


def _natural_cubic(xs, ys):
    """Natural cubic spline second derivatives (tridiagonal solve —
    the classic algorithm; commons-math SplineInterpolator role)."""
    n = len(xs)
    h = np.diff(xs)
    if n < 3:
        m = np.zeros(n)
    else:
        a = np.zeros((n, n))
        r = np.zeros(n)
        a[0, 0] = a[-1, -1] = 1.0
        for i in range(1, n - 1):
            a[i, i - 1] = h[i - 1]
            a[i, i] = 2 * (h[i - 1] + h[i])
            a[i, i + 1] = h[i]
            r[i] = 3 * ((ys[i + 1] - ys[i]) / h[i]
                        - (ys[i] - ys[i - 1]) / h[i - 1])
        m = np.linalg.solve(a, r)

    def predict(x):
        x = np.minimum(np.maximum(x, xs[0]), xs[-1])
        i = np.clip(np.searchsorted(xs, x) - 1, 0, n - 2)
        dx = x - xs[i]
        hi = h[i]
        ai = (m[i + 1] - m[i]) / (3 * hi)
        bi = m[i]
        ci = ((ys[i + 1] - ys[i]) / hi
              - hi * (2 * m[i] + m[i + 1]) / 3)
        return ys[i] + ci * dx + bi * dx ** 2 + ai * dx ** 3

    def deriv(x):
        x = np.minimum(np.maximum(x, xs[0]), xs[-1])
        i = np.clip(np.searchsorted(xs, x) - 1, 0, n - 2)
        dx = x - xs[i]
        hi = h[i]
        ai = (m[i + 1] - m[i]) / (3 * hi)
        ci = ((ys[i + 1] - ys[i]) / hi
              - hi * (2 * m[i] + m[i + 1]) / 3)
        return ci + 2 * m[i] * dx + 3 * ai * dx ** 2

    return predict, deriv


def _akima(xs, ys):
    """Akima spline slopes (the published 1970 construction)."""
    n = len(xs)
    dx = np.diff(xs)
    mseg = np.diff(ys) / dx
    me = np.concatenate((
        [2 * mseg[0] - mseg[1], 2 * (2 * mseg[0] - mseg[1]) - mseg[0]][::-1],
        mseg,
        [2 * mseg[-1] - mseg[-2],
         2 * (2 * mseg[-1] - mseg[-2]) - mseg[-1]]))
    w1 = np.abs(me[3:] - me[2:-1])
    w2 = np.abs(me[1:-2] - me[:-3])
    denom = w1 + w2
    t = np.where(denom > 1e-12,
                 (w1 * me[1:-2] + w2 * me[2:-1]) / np.where(
                     denom > 1e-12, denom, 1.0),
                 0.5 * (me[1:-2] + me[2:-1]))

    def predict(x):
        x = np.minimum(np.maximum(x, xs[0]), xs[-1])
        i = np.clip(np.searchsorted(xs, x) - 1, 0, n - 2)
        d = x - xs[i]
        h = dx[i]
        p2 = (3 * mseg[i] - 2 * t[i] - t[i + 1]) / h
        p3 = (t[i] + t[i + 1] - 2 * mseg[i]) / (h * h)
        return ys[i] + t[i] * d + p2 * d * d + p3 * d ** 3

    def deriv(x):
        x = np.minimum(np.maximum(x, xs[0]), xs[-1])
        i = np.clip(np.searchsorted(xs, x) - 1, 0, n - 2)
        d = x - xs[i]
        h = dx[i]
        p2 = (3 * mseg[i] - 2 * t[i] - t[i + 1]) / h
        p3 = (t[i] + t[i + 1] - 2 * mseg[i]) / (h * h)
        return t[i] + 2 * p2 * d + 3 * p3 * d * d

    return predict, deriv


def _loess_fit(xs, ys, bandwidth=0.25, iters=2):
    """Tricube-weighted local LINEAR regression with robustifying
    iterations (Cleveland 1979 — the LoessInterpolator role)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = xs.size
    span = max(int(math.ceil(bandwidth * n)), 2)
    robust = np.ones(n)
    fitted = ys.copy()
    for _ in range(max(iters, 1)):
        for i in range(n):
            dist = np.abs(xs - xs[i])
            idx = np.argsort(dist)[:span]
            dmax = dist[idx].max() or 1.0
            w = (1 - (dist[idx] / dmax) ** 3) ** 3
            w = w * robust[idx]
            sw = w.sum()
            if sw <= 0:
                fitted[i] = ys[i]
                continue
            xw = (w * xs[idx]).sum() / sw
            yw = (w * ys[idx]).sum() / sw
            sxx = (w * (xs[idx] - xw) ** 2).sum()
            if sxx < 1e-12:
                fitted[i] = yw
            else:
                beta = (w * (xs[idx] - xw) * (ys[idx] - yw)).sum() / sxx
                fitted[i] = yw + beta * (xs[i] - xw)
        resid = ys - fitted
        s = np.median(np.abs(resid)) or 1.0
        robust = np.clip(1 - (resid / (6 * s)) ** 2, 0, None) ** 2
    return fitted


# --------------------------------------------------------------------------
# hypothesis tests / fitters / models
# --------------------------------------------------------------------------


def _ttest(a, b):
    """Welch two-sample t (commons-math TTest.tTest role): returns
    {t-statistic, p-value} (two-sided)."""
    a, b = _vec(a), _vec(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = a.size, b.size
    se = math.sqrt(va / na + vb / nb)
    t = (a.mean() - b.mean()) / se
    df = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return {"t-statistic": float(t), "p-value": 2 * _t_sf(abs(t), df)}


def _paired_ttest(a, b):
    d = _vec(a) - _vec(b)
    n = d.size
    t = d.mean() / (d.std(ddof=1) / math.sqrt(n))
    return {"t-statistic": float(t),
            "p-value": 2 * _t_sf(abs(t), n - 1)}


def _mann_whitney(a, b):
    """Mann-Whitney U with normal approximation + tie correction
    (commons-math MannWhitneyUTest)."""
    a, b = _vec(a), _vec(b)
    na, nb = a.size, b.size
    allv = np.concatenate([a, b])
    order = allv.argsort(kind="stable")
    ranks = np.empty(allv.size)
    sv = allv[order]
    i = 0
    pos = 0
    ties = []
    while i < sv.size:
        j = i
        while j < sv.size and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        if j - i > 1:
            ties.append(j - i)
        i = j
    _ = pos
    u1 = ranks[:na].sum() - na * (na + 1) / 2.0
    u = max(u1, na * nb - u1)
    n = na + nb
    tie_term = sum(t ** 3 - t for t in ties) / (n * (n - 1.0)) if n > 1 else 0
    sigma = math.sqrt(na * nb / 12.0 * ((n + 1.0) - tie_term))
    z = (u - na * nb / 2.0) / sigma
    return {"u-statistic": float(u),
            "p-value": 2 * (1.0 - _norm_cdf(abs(z)))}


def _ks_test(dist_or_a, b):
    """One-sample (vs distribution) or two-sample Kolmogorov-Smirnov
    with the asymptotic p (commons-math KolmogorovSmirnovTest)."""
    b = _vec(b)
    b_sorted = np.sort(b)
    n = b_sorted.size
    if _is_dist(dist_or_a):
        cdf = np.array([_dist_cdf(dist_or_a, x) for x in b_sorted])
        dplus = (np.arange(1, n + 1) / n - cdf).max()
        dminus = (cdf - np.arange(0, n) / n).max()
        d = max(dplus, dminus)
        en = math.sqrt(n)
    else:
        a_sorted = np.sort(_vec(dist_or_a))
        m = a_sorted.size
        allv = np.concatenate([a_sorted, b_sorted])
        ca = np.searchsorted(a_sorted, allv, side="right") / m
        cb = np.searchsorted(b_sorted, allv, side="right") / n
        d = np.abs(ca - cb).max()
        en = math.sqrt(m * n / (m + n))
    lam = (en + 0.12 + 0.11 / en) * d
    p = 2 * sum((-1) ** (k - 1) * math.exp(-2 * (lam * k) ** 2)
                for k in range(1, 101))
    return {"d-statistic": float(d),
            "p-value": float(min(max(p, 0.0), 1.0))}


def _anova(*groups):
    """One-way ANOVA F + p (commons-math OneWayAnova)."""
    gs = [_vec(g) for g in groups]
    allv = np.concatenate(gs)
    grand = allv.mean()
    k = len(gs)
    n = allv.size
    ssb = sum(g.size * (g.mean() - grand) ** 2 for g in gs)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in gs)
    d1, d2 = k - 1, n - k
    f = (ssb / d1) / (ssw / d2)
    return {"f-ratio": float(f), "p-value": _f_sf(f, d1, d2)}


def _chi_square_dataset(obs, exp):
    """ChiSquareDataSetEvaluator: Σ (o-e)^2/e over two datasets,
    df = n-1."""
    o, e = _vec(obs), _vec(exp)
    stat = float((((o - e) ** 2) / e).sum())
    p = 1.0 - _gammainc_lower((o.size - 1) / 2.0, stat / 2.0)
    return {"chisquare-statistic": stat, "p-value": float(p)}


def _g_test_dataset(obs, exp):
    """GTestDataSetEvaluator: G = 2 Σ o ln(o/e), df = n-1."""
    o, e = _vec(obs), _vec(exp)
    mask = o > 0
    g = float(2.0 * (o[mask] * np.log(o[mask] / e[mask])).sum())
    p = 1.0 - _gammainc_lower((o.size - 1) / 2.0, g / 2.0)
    return {"G-statistic": g, "p-value": float(p)}


def _corr_pvalues(corr_matrix, n):
    """PearsonsCorrelation.getCorrelationPValues: two-sided t-test of
    each off-diagonal correlation with df = n-2."""
    m = corr_matrix.data if isinstance(corr_matrix, Matrix) else \
        np.asarray(corr_matrix, dtype=np.float64)
    k = m.shape[0]
    out = np.zeros_like(m)
    for i in range(k):
        for j in range(k):
            if i == j:
                continue
            r = min(max(m[i, j], -0.9999999999), 0.9999999999)
            t = abs(r) * math.sqrt((n - 2) / (1 - r * r))
            out[i, j] = 2 * _t_sf(t, n - 2)
    return Matrix(out)


def _ols_regress(x_matrix, y):
    """OLSRegressionEvaluator: multiple OLS via least squares;
    returns the tuple-shaped dict Solr emits (coefficients include
    the intercept first, commons-math OLSMultipleLinearRegression)."""
    xm = x_matrix.data if isinstance(x_matrix, Matrix) else \
        np.asarray(x_matrix, dtype=np.float64)
    yv = _vec(y)
    design = np.column_stack([np.ones(xm.shape[0]), xm])
    coef, *_rest = np.linalg.lstsq(design, yv, rcond=None)
    fitted = design @ coef
    resid = yv - fitted
    ss_tot = ((yv - yv.mean()) ** 2).sum()
    r2 = 1.0 - (resid ** 2).sum() / ss_tot if ss_tot > 0 else 1.0
    return {"kind": "ols", "coefficients": [float(c) for c in coef],
            "RSquared": float(r2),
            "regressandVariance": float(yv.var(ddof=1)),
            "residuals": [float(r) for r in resid]}


def _kmeans(m, k, ctx, max_iters=100, trials=1):
    """Lloyd's k-means with deterministic seeded init (KmeansEvaluator
    role; commons-math KMeansPlusPlusClusterer)."""
    data = m.data if isinstance(m, Matrix) else np.asarray(
        m, dtype=np.float64)
    best = None
    for _trial in range(max(int(trials), 1)):
        rng = ctx.rng()
        idx = rng.choice(data.shape[0], size=int(k), replace=False)
        cents = data[idx].copy()
        assign = np.zeros(data.shape[0], dtype=np.int64)
        for _ in range(max_iters):
            dist = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            new_assign = dist.argmin(1)
            if (new_assign == assign).all() and _ > 0:
                break
            assign = new_assign
            for c in range(int(k)):
                sel = data[assign == c]
                if len(sel):
                    cents[c] = sel.mean(0)
        inertia = float(((data - cents[assign]) ** 2).sum())
        if best is None or inertia < best["inertia"]:
            best = {"kind": "kmeans", "centroids": Matrix(cents),
                    "assignments": assign.tolist(),
                    "inertia": inertia,
                    "row_labels": (m.row_labels
                                   if isinstance(m, Matrix) else None),
                    "data": data}
    return best


def _fuzzy_kmeans(m, k, ctx, fuzziness=1.2, max_iters=100):
    data = m.data if isinstance(m, Matrix) else np.asarray(
        m, dtype=np.float64)
    rng = ctx.rng()
    n = data.shape[0]
    u = rng.random((n, int(k)))
    u /= u.sum(1, keepdims=True)
    p = float(fuzziness)
    cents = None
    for _ in range(max_iters):
        um = u ** p
        cents = (um.T @ data) / um.sum(0)[:, None]
        dist = np.sqrt(((data[:, None, :] - cents[None, :, :]) ** 2)
                       .sum(-1)) + 1e-12
        new_u = 1.0 / ((dist[:, :, None] / dist[:, None, :])
                       ** (2.0 / (p - 1.0))).sum(2)
        if np.abs(new_u - u).max() < 1e-9:
            u = new_u
            break
        u = new_u
    assign = u.argmax(1)
    return {"kind": "kmeans", "centroids": Matrix(cents),
            "assignments": assign.tolist(),
            "membership": Matrix(u),
            "row_labels": (m.row_labels if isinstance(m, Matrix)
                           else None),
            "data": data}


def _term_vectors(tuples, min_term_length=3, min_doc_freq=0.0,
                  max_doc_freq=1.0):
    """TermVectorsEvaluator: list of {id, terms} tuples -> TF-IDF
    matrix with row labels = ids, column labels = terms."""
    docs = [(t.get("id", str(i)), t["terms"])
            for i, t in enumerate(tuples)]
    n_docs = len(docs)
    df: dict[str, int] = {}
    for _id, terms in docs:
        for t in set(terms):
            if len(t) >= min_term_length:
                df[t] = df.get(t, 0) + 1
    vocab = sorted(t for t, d in df.items()
                   if min_doc_freq <= d / n_docs <= max_doc_freq)
    vidx = {t: i for i, t in enumerate(vocab)}
    data = np.zeros((n_docs, len(vocab)))
    for r, (_id, terms) in enumerate(docs):
        for t in terms:
            i = vidx.get(t)
            if i is not None:
                data[r, i] += 1.0
    for t, i in vidx.items():
        idf = math.log(n_docs / float(df[t])) + 1.0
        data[:, i] *= idf
    return Matrix(data, row_labels=[d[0] for d in docs],
                  col_labels=vocab)


# --------------------------------------------------------------------------
# evaluator dispatch
# --------------------------------------------------------------------------

def _tolist(v):
    """numpy → plain python for tuple emission."""
    if isinstance(v, np.ndarray):
        return [_tolist(x) for x in v]
    if isinstance(v, (np.floating, np.integer)):
        return float(v)
    if isinstance(v, Matrix):
        return v.to_lists()
    if isinstance(v, dict):
        return {k: _tolist(x) for k, x in v.items()
                if not callable(x) and k != "data"}
    if isinstance(v, list):
        return [_tolist(x) for x in v]
    return v


def _mat(v) -> Matrix:
    return v if isinstance(v, Matrix) else Matrix(v)


def _primes(n, start):
    out = []
    x = max(int(start), 2)
    while len(out) < int(n):
        if all(x % p for p in range(2, int(math.isqrt(x)) + 1)):
            out.append(float(x))
        x += 1
    return np.array(out)


def _hist(v, bins):
    v = _vec(v)
    counts, edges = np.histogram(v, bins=int(bins))
    out = []
    for i, c in enumerate(counts):
        sel = v[(v >= edges[i]) & (v < edges[i + 1] if i < len(counts) - 1
                                   else v <= edges[i + 1])]
        out.append({"N": float(c), "min": float(edges[i]),
                    "max": float(edges[i + 1]),
                    "mean": float(sel.mean()) if sel.size else 0.0,
                    "stdev": float(sel.std(ddof=1))
                    if sel.size > 1 else 0.0,
                    "cumFreq": float(counts[: i + 1].sum()),
                    "prob": float(c) / v.size})
    return out


def _freq_table(v):
    v = _vec(v)
    vals, counts = np.unique(v, return_counts=True)
    return [{"value": float(val), "count": float(c),
             "cumFreq": float(counts[: i + 1].sum()),
             "pct": float(c) / v.size,
             "cumPct": float(counts[: i + 1].sum()) / v.size}
            for i, (val, c) in enumerate(zip(vals, counts))]


def _knn_rows(m, vec, k, dist="euclidean"):
    data = _mat(m).data
    v = _vec(vec)
    if dist == "cosine":
        num = data @ v
        den = (np.linalg.norm(data, axis=1) * np.linalg.norm(v)) + 1e-300
        d = 1.0 - num / den
    else:
        d = np.linalg.norm(data - v[None, :], axis=1)
    idx = np.argsort(d, kind="stable")[: int(k)]
    out = Matrix(data[idx],
                 row_labels=([_mat(m).row_labels[i] for i in idx]
                             if _mat(m).row_labels else None),
                 col_labels=_mat(m).col_labels)
    out.attributes["distances"] = [float(x) for x in d[idx]]
    return out


def _integrate(obj, lo=None, hi=None):
    if _is_dist(obj) and obj.get("kind") != "interp":
        return _dist_cdf(obj, hi) - _dist_cdf(obj, lo)
    xs = obj["x"]
    if lo is None:
        lo, hi = float(xs[0]), float(xs[-1])
    grid = np.linspace(float(lo), float(hi), 2001)
    return float(np.trapezoid(obj["predict"](grid), grid))


def eval_math(node, ctx: MathContext):
    """Evaluate one math-expression node to a python/numpy value."""
    from .expressions import ExprNode, Quoted

    if isinstance(node, Quoted):
        return str(node)
    if isinstance(node, str):
        try:
            return float(node) if "." in node or "e" in node.lower() \
                else int(node)
        except ValueError:
            pass
        if node in ctx.env:
            return ctx.env[node]
        if node in ("true", "false"):
            return node == "true"
        return node
    if isinstance(node, (int, float)):
        return node
    if not isinstance(node, ExprNode):
        return node
    name = node.name
    lname = name.lower()

    # -- special forms ---------------------------------------------------
    if lname == "col":
        src = eval_math(node.args[0], ctx) if isinstance(
            node.args[0], ExprNode) else ctx.env.get(node.args[0])
        field = node.args[1]
        rows = src.collect() if hasattr(src, "collect") else src
        return np.array([float(r[field]) for r in rows])
    if lname == "sample":
        d = eval_math(node.args[0], ctx)
        n = int(eval_math(node.args[1], ctx)) if len(node.args) > 1 else None
        if isinstance(d, dict) and d.get("kind") == "markov":
            return _markov_sample(d, n or 1, ctx)
        out = _dist_sample(d, n or 1, ctx.rng())
        if d.get("kind") == "mvnormal":
            return Matrix(out) if n else np.asarray(out[0])
        return out if n else float(out[0])
    if lname == "montecarlo":
        # monteCarlo(f(...), n) with nested sample() calls re-drawn
        # per iteration (MonteCarloEvaluator re-evaluates its body)
        n = int(eval_math(node.args[-1], ctx))
        return np.array([float(eval_math(node.args[0], ctx))
                         for _ in range(n)])
    if lname == "let":
        sub = MathContext(ctx.env, ctx.seed_text)
        for k_, v_ in node.kwargs.items():
            sub.env[k_] = eval_math(v_, sub)
        return eval_math(node.args[-1], sub) if node.args else None
    if lname == "tuple":
        return {k_: _tolist(eval_math(v_, ctx))
                for k_, v_ in node.kwargs.items()}
    if lname == "select" and all(isinstance(a, ExprNode) or a == "as"
                                 for a in node.args):
        pass  # stream-side select; not a math form

    if lname in ("kmeans", "multikmeans", "fuzzykmeans"):
        m = eval_math(node.args[0], ctx)
        k = int(eval_math(node.args[1], ctx))
        if lname == "fuzzykmeans":
            fz = float(node.kwargs.get("fuzziness", 1.2))
            return _fuzzy_kmeans(m, k, ctx, fuzziness=fz)
        trials = (int(eval_math(node.args[2], ctx))
                  if lname == "multikmeans" and len(node.args) > 2
                  else 1)
        return _kmeans(m, k, ctx, trials=trials)

    args = [eval_math(a, ctx) for a in node.args]
    kw = {k_: eval_math(v_, ctx) for k_, v_ in node.kwargs.items()}
    fn = _MATH_EVALS.get(lname)
    if fn is None:
        raise ValueError(f"unknown math evaluator {name}")
    try:
        return fn(*args, **{k_.replace("-", "_"): v_
                            for k_, v_ in kw.items()})
    except TypeError as exc:
        # retry WITHOUT kwargs only for a genuine signature mismatch
        # (positional-only evaluators); a TypeError raised inside the
        # evaluator must propagate — silently dropping the user's
        # kwargs would return a wrong default-parameter result
        if kw and "argument" in str(exc):
            return fn(*args)
        raise


def _markov_chain(trans):
    m = _mat(trans).data
    return {"kind": "markov", "matrix": m, "state": 0}


def _markov_sample(mc, n, ctx):
    rng = ctx.rng()
    m = mc["matrix"]
    state = int(mc.get("state", 0))
    out = []
    for _ in range(int(n)):
        state = int(rng.choice(m.shape[1], p=m[state] / m[state].sum()))
        out.append(float(state))
    return np.array(out)


def _polyfit(y, x=None, degree=3):
    y = _vec(y)
    if x is not None and not np.isscalar(x):
        xs = _vec(x)
    else:
        if x is not None and np.isscalar(x):
            degree = x
        xs = np.arange(y.size, dtype=np.float64)
    coef = np.polyfit(xs, y, int(degree))
    fn = np.poly1d(coef)
    fitted = fn(xs)
    return _interp("polyfit", xs, y, fitted, fn, fn.deriv())


def _lerp(x, y):
    xs, ys = _vec(x), _vec(y)

    def predict(v):
        return np.interp(v, xs, ys)

    def deriv(v):
        i = np.clip(np.searchsorted(xs, v, side="right") - 1, 0,
                    xs.size - 2)
        return (ys[i + 1] - ys[i]) / (xs[i + 1] - xs[i])

    return _interp("lerp", xs, ys, ys, predict, deriv)


def _spline(x, y=None):
    if y is None:
        x, y = np.arange(len(_vec(x)), dtype=np.float64), x
    xs, ys = _vec(x), _vec(y)
    predict, deriv = _natural_cubic(xs, ys)
    return _interp("spline", xs, ys, ys, predict, deriv)


def _akima_fit(x, y=None):
    if y is None:
        x, y = np.arange(len(_vec(x)), dtype=np.float64), x
    xs, ys = _vec(x), _vec(y)
    predict, deriv = _akima(xs, ys)
    return _interp("akima", xs, ys, ys, predict, deriv)


def _loess(x, y=None, bandwidth=0.25):
    if y is None or np.isscalar(y):
        if y is not None:
            bandwidth = y
        x, y = np.arange(len(_vec(x)), dtype=np.float64), x
    xs, ys = _vec(x), _vec(y)
    fitted = _loess_fit(xs, ys, float(bandwidth))
    predict, deriv = _natural_cubic(xs, fitted)
    return _interp("loess", xs, ys, fitted, predict, deriv)


def _derivative(f):
    if not (isinstance(f, dict) and f.get("kind") == "interp"):
        raise TypeError("derivative() needs a fitted function")
    dfn = f["derivative"]
    dy = np.asarray(dfn(f["x"]), dtype=np.float64)
    if dy.shape == ():
        dy = np.full(f["x"].shape, float(dy))
    predict, deriv = _natural_cubic(f["x"], dy)
    return _interp("derivative", f["x"], dy, dy, predict, deriv)


def _predict_math(model, x):
    if isinstance(model, dict) and model.get("kind") == "interp":
        return (float(model["predict"](x)) if np.isscalar(x)
                else np.asarray(model["predict"](_vec(x))))
    if isinstance(model, dict) and model.get("kind") == "ols":
        coef = np.asarray(model["coefficients"])
        if isinstance(x, Matrix) or (isinstance(x, np.ndarray)
                                     and x.ndim == 2):
            xm = _mat(x).data
            return xm @ coef[1:] + coef[0]
        return float(np.dot(coef[1:], _vec(x)) + coef[0])
    if isinstance(model, dict) and "slope" in model:
        if np.isscalar(x):
            return model["slope"] * x + model["intercept"]
        return model["slope"] * _vec(x) + model["intercept"]
    raise TypeError("predict() cannot use this model")


def _get_cluster(model, i):
    data = model["data"]
    assign = np.asarray(model["assignments"])
    rows = data[assign == int(i)]
    labels = None
    if model.get("row_labels"):
        labels = [l for l, a in zip(model["row_labels"], assign)
                  if a == int(i)]
    return Matrix(rows, row_labels=labels)


def _top_features(model, n):
    """topFeatures: per centroid, the column labels of the n largest
    centroid weights."""
    cents = model["centroids"].data
    cols = model.get("col_labels") or (
        model["centroids"].col_labels)
    out = []
    for row in cents:
        idx = np.argsort(-row, kind="stable")[: int(n)]
        out.append([cols[i] if cols else float(i) for i in idx])
    return out


def _feature_select(m, labels, n):
    mm = _mat(m)
    keep = [i for i, c in enumerate(mm.col_labels or [])
            if c in set(labels)][: int(n)] or list(range(int(n)))
    out = Matrix(mm.data[:, keep], row_labels=mm.row_labels,
                 col_labels=[mm.col_labels[i] for i in keep]
                 if mm.col_labels else None)
    return out


_MATH_EVALS: dict = {
    # arithmetic / elementwise (vector-aware via numpy broadcasting)
    "add": lambda *a: _np_fold(a, lambda x, y: x + y),
    "sub": lambda *a: _np_fold(a, lambda x, y: x - y),
    "mult": lambda *a: _np_fold(a, lambda x, y: x * y),
    "div": lambda *a: _np_fold(a, lambda x, y: x / y),
    "pow": lambda a, b: np.power(a, b),
    "sqrt": lambda a: np.sqrt(a),
    "cbrt": lambda a: np.cbrt(a),
    "abs": lambda a: np.abs(a),
    "log": lambda a: np.log(a),
    "log10": lambda a: np.log10(a),
    "exp": lambda a: np.exp(a),
    "round": lambda a, p=0: np.round(a, int(p)),
    "ceiling": lambda a: np.ceil(a),
    "floor": lambda a: np.floor(a),
    "mod": lambda a, b: np.mod(a, b),
    # vectors
    "array": lambda *a: (
        np.array([float(x) for x in a])
        if all(isinstance(x, (int, float, np.floating, np.integer))
               for x in a)
        else [str(x) for x in a]),
    "sequence": lambda n, start, stride: np.arange(
        float(start), float(start) + float(n) * float(stride),
        float(stride))[: int(n)],
    "rev": lambda a: _vec(a)[::-1],
    "length": lambda a: float(_vec(a).size),
    "mean": lambda a: (float(_vec(a).mean()) if not _is_dist(a)
                       else _dist_mean(a)),
    "var": lambda a: float(_vec(a).var(ddof=1)),
    "stddev": lambda a: float(_vec(a).std(ddof=1)),
    "percentile": lambda a, p: _np_percentile(a, p),
    "dotproduct": lambda a, b: float(np.dot(_vec(a), _vec(b))),
    "cosinesimilarity": lambda a, b: float(
        np.dot(_vec(a), _vec(b))
        / (np.linalg.norm(_vec(a)) * np.linalg.norm(_vec(b)))),
    "ebeadd": lambda a, b: _vec(a) + _vec(b),
    "ebesubtract": lambda a, b: _vec(a) - _vec(b),
    "ebemultiply": lambda a, b: _vec(a) * _vec(b),
    "ebedivide": lambda a, b: _vec(a) / _vec(b),
    "scale": lambda s, a: float(s) * _vec(a),
    "unitize": lambda a: _vec(a) / np.linalg.norm(_vec(a)),
    "zscores": lambda a: (_vec(a) - _vec(a).mean())
    / _vec(a).std(ddof=1),
    "corr": lambda a, b=None, **kw: _np_corr(a, b, **kw),
    "cov": lambda a, b=None: _np_cov(a, b),
    "describe": lambda a: _np_describe(a),
    "valueat": lambda a, i: (float(_vec(a)[int(i)])
                             if not isinstance(a, Matrix)
                             else a.data[int(i)]),
    "asc": lambda a: np.sort(_vec(a)),
    "primes": lambda n, start=0: _primes(n, start),
    "hist": _hist,
    "freqtable": _freq_table,
    "lerp": _lerp,
    "spline": _spline,
    "akima": _akima_fit,
    "loess": _loess,
    "polyfit": _polyfit,
    "harmonicfit": lambda *a: _harmonic_fit(*a),
    "derivative": _derivative,
    "predict": _predict_math,
    "integrate": _integrate,
    "fft": lambda a: _fft(a),
    "ifft": lambda a: _ifft(a),
    "convolve": lambda a, b: np.convolve(_vec(a), _vec(b)),
    "conv": lambda a, b: np.convolve(_vec(a), _vec(b)),
    "finddelay": lambda a, b: _np_find_delay(a, b),
    # matrices
    "matrix": lambda *rows: Matrix(np.array([_vec(r) for r in rows])),
    "transpose": lambda m: Matrix(_mat(m).data.T,
                                  row_labels=_mat(m).col_labels,
                                  col_labels=_mat(m).row_labels),
    "matrixmult": lambda a, b: Matrix(_mat(a).data @ _mat(b).data),
    "rowcount": lambda m: float(_mat(m).data.shape[0]),
    "columncount": lambda m: float(_mat(m).data.shape[1]),
    "rowat": lambda m, i: _mat(m).data[int(i)],
    "columnat": lambda m, i: _mat(m).data[:, int(i)],
    "colat": lambda m, i: _mat(m).data[:, int(i)],
    "sumrows": lambda m: _mat(m).data.sum(1),
    "sumcolumns": lambda m: _mat(m).data.sum(0),
    "grandsum": lambda m: float(_mat(m).data.sum()),
    "scalaradd": lambda s, m: Matrix(_mat(m).data + float(s)),
    "scalarsubtract": lambda s, m: Matrix(_mat(m).data - float(s)),
    "scalarmultiply": lambda s, m: Matrix(_mat(m).data * float(s)),
    "scalardivide": lambda s, m: Matrix(_mat(m).data / float(s)),
    "getcolumnlabels": lambda m: list(_mat(m).col_labels or []),
    "getrowlabels": lambda m: list(_mat(m).row_labels or []),
    "setcolumnlabels": lambda m, labels: Matrix(
        _mat(m).data, row_labels=_mat(m).row_labels,
        col_labels=[str(x) for x in labels]),
    "setrowlabels": lambda m, labels: Matrix(
        _mat(m).data, row_labels=[str(x) for x in labels],
        col_labels=_mat(m).col_labels),
    "getattribute": lambda m, k: _mat(m).attributes.get(str(k)),
    "getattributes": lambda m: dict(_mat(m).attributes),
    "getvalue": lambda t, k: t.get(str(k)) if isinstance(t, dict)
    else None,
    "setvalue": lambda t, k, v: {**t, str(k): v},
    "memset": lambda *a, **kw: a[0],
    # distributions
    "normaldistribution": lambda mu, sd: _dist(
        "normal", mean=float(mu), sd=float(sd)),
    "uniformdistribution": lambda lo, hi: _dist(
        "uniform", lo=float(lo), hi=float(hi)),
    "uniformintegerdistribution": lambda lo, hi: _dist(
        "uniform_int", lo=int(lo), hi=int(hi)),
    "binomialdistribution": lambda n, p: _dist(
        "binomial", n=int(n), p=float(p)),
    "poissondistribution": lambda m: _dist("poisson", mean=float(m)),
    "geometricdistribution": lambda p: _dist("geometric", p=float(p)),
    "constantdistribution": lambda v: _dist("constant", value=float(v)),
    "weibulldistribution": lambda shape, scale: _dist(
        "weibull", shape=float(shape), scale=float(scale)),
    "lognormaldistribution": lambda shape, scale: _dist(
        "lognormal", shape=float(shape), scale=float(scale)),
    "zipfdistribution": lambda size, e: _dist(
        "zipf", size=int(size), exp=float(e)),
    "gammadistribution": lambda shape, scale: _dist(
        "gamma", shape=float(shape), scale=float(scale)),
    "betadistribution": lambda a, b: _dist(
        "beta", alpha=float(a), beta=float(b)),
    "triangulardistribution": lambda a, c, b: _dist(
        "triangular", a=float(a), c=float(c), b=float(b)),
    "enumerateddistribution": lambda vals, probs=None: _dist(
        "enumerated", values=[float(v) for v in _vec(vals)],
        probs=([float(p) for p in _vec(probs)] if probs is not None
               else [1.0 / len(_vec(vals))] * len(_vec(vals)))),
    "empiricaldistribution": lambda vals, bins=10: _dist(
        "empirical", values=[float(v) for v in _vec(vals)],
        bins=int(bins)),
    "multivariatenormaldistribution": lambda means, cov: _dist(
        "mvnormal", means=[float(m) for m in _vec(means)],
        cov=_mat(cov).data.tolist()),
    "markovchain": _markov_chain,
    "density": lambda d, x: (_dist_density(d, float(x))
                             if np.isscalar(x) else np.array(
        [_dist_density(d, float(v)) for v in _vec(x)])),
    "cumulativeprobability": lambda d, x: (
        _dist_cdf(d, float(x)) if np.isscalar(x)
        else np.array([_dist_cdf(d, float(v)) for v in _vec(x)])),
    "probability": lambda d, x, y=None: (
        _dist_cdf(d, float(y)) - _dist_cdf(d, float(x))
        if y is not None else _dist_pmf(d, float(x))),
    # tests / regression / clustering
    "ttest": _ttest,
    "pairedttest": _paired_ttest,
    "mannwhitney": _mann_whitney,
    "kolmogorovsmirnov": _ks_test,
    "ks": _ks_test,
    "anova": _anova,
    "chisquaredataset": _chi_square_dataset,
    "gtestdataset": _g_test_dataset,
    "corrpvalues": lambda m, n=0: _corr_pvalues(
        m, int(n) or (_mat(m).data.shape[0] + 2)),
    "olsregress": _ols_regress,
    "regress": lambda x, y: _np_regress(x, y),
    "knn": _knn_rows,
    "knearestneighbors": _knn_rows,
    "termvectors": _term_vectors,
    "featureselect": _feature_select,
    "topfeatures": _top_features,
    "getcentroids": lambda m: m["centroids"],
    "getcluster": _get_cluster,
    "getmembershipmatrix": lambda m: m["membership"],
}


def _np_fold(args, op):
    out = args[0]
    for a in args[1:]:
        out = op(np.asarray(out, dtype=np.float64)
                 if isinstance(out, (list, np.ndarray)) else out,
                 np.asarray(a, dtype=np.float64)
                 if isinstance(a, (list, np.ndarray)) else a)
    return out


def _dist_mean(d):
    k = d["kind"]
    if k == "normal":
        return d["mean"]
    if k == "uniform":
        return (d["lo"] + d["hi"]) / 2.0
    if k == "poisson":
        return d["mean"]
    if k == "binomial":
        return d["n"] * d["p"]
    raise ValueError(f"no mean for {k}")


def _np_percentile(a, p):
    """commons-math legacy estimation (R-6): pos = p*(n+1)/100."""
    v = np.sort(_vec(a))
    n = v.size
    ps = np.atleast_1d(np.asarray(p, dtype=np.float64))
    out = []
    for pp in ps:
        pos = pp * (n + 1) / 100.0
        if pos < 1:
            out.append(float(v[0]))
        elif pos >= n:
            out.append(float(v[-1]))
        else:
            lo = int(math.floor(pos))
            frac = pos - lo
            out.append(float(v[lo - 1] + frac * (v[lo] - v[lo - 1])))
    return out[0] if np.isscalar(p) or len(out) == 1 else np.array(out)


def _np_corr(a, b=None, type="pearson"):
    if b is None:
        m = _mat(a).data
        if type == "spearman":
            m = np.apply_along_axis(_rank_vec, 0, m)
        return Matrix(np.corrcoef(m, rowvar=False))
    x, y = _vec(a), _vec(b)
    if type == "spearman":
        x, y = _rank_vec(x), _rank_vec(y)
    return float(np.corrcoef(x, y)[0, 1])


def _rank_vec(v):
    order = np.argsort(v, kind="stable")
    ranks = np.empty(v.size)
    sv = v[order]
    i = 0
    while i < v.size:
        j = i
        while j < v.size and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    return ranks


def _np_cov(a, b=None):
    if b is None:
        return Matrix(np.cov(_mat(a).data, rowvar=False))
    return float(np.cov(_vec(a), _vec(b))[0, 1])


def _np_describe(a):
    v = _vec(a)
    return {"N": float(v.size), "min": float(v.min()),
            "max": float(v.max()), "mean": float(v.mean()),
            "sum": float(v.sum()), "var": float(v.var(ddof=1)),
            "stdev": float(v.std(ddof=1)),
            "50thpercentile": _np_percentile(v, 50)}


def _np_regress(x, y):
    xs, ys = _vec(x), _vec(y)
    slope, intercept = np.polyfit(xs, ys, 1)
    r = float(np.corrcoef(xs, ys)[0, 1])
    return {"slope": float(slope), "intercept": float(intercept),
            "R": r, "RSquared": r * r, "N": float(xs.size)}


def _fft(a):
    """FFTEvaluator: returns a 2-row matrix [real parts, imaginary
    parts] (commons-math FastFourierTransformer, standard DFT)."""
    v = np.fft.fft(_vec(a))
    return Matrix(np.vstack([v.real, v.imag]))


def _ifft(m):
    mm = _mat(m).data
    v = np.fft.ifft(mm[0] + 1j * mm[1])
    return v.real


def _np_find_delay(a, b):
    xc = np.convolve(_vec(a), _vec(b)[::-1])
    return float(int(np.argmax(xc)) - (len(_vec(b)) - 1))


def _harmonic_fit(y, x=None):
    """HarmonicFitEvaluator role: fit y = a*sin(wx) + b*cos(wx) + c
    with w chosen by dense scan + linear least squares per w."""
    ys = _vec(y)
    xs = _vec(x) if x is not None else np.arange(ys.size,
                                                 dtype=np.float64)
    best = None
    for w in np.linspace(0.01, math.pi, 600):
        design = np.column_stack([np.sin(w * xs), np.cos(w * xs),
                                  np.ones(xs.size)])
        coef, *_r = np.linalg.lstsq(design, ys, rcond=None)
        resid = ys - design @ coef
        sse = float((resid ** 2).sum())
        if best is None or sse < best[0]:
            best = (sse, w, coef)
    _sse, w, coef = best

    def predict(v):
        return (coef[0] * np.sin(w * v) + coef[1] * np.cos(w * v)
                + coef[2])

    fitted = predict(xs)
    return _interp("harmonicFit", xs, ys, fitted, predict)


# kmeans needs the ctx for seeded init — registered as a special form
def _register_ctx_forms():
    pass


def _bicubic_spline(xs, ys, grid):
    """BicubicSplineEvaluator role: 2-D interpolation over a grid —
    a natural cubic spline along each grid row, then one across the
    row results (the separable rendering of commons-math's
    PiecewiseBicubicSplineInterpolator)."""
    xs = _vec(xs)
    ys = _vec(ys)
    g = _mat(grid).data

    row_fns = [_natural_cubic(ys, g[i])[0] for i in range(g.shape[0])]

    def predict(x, y):
        colv = np.array([float(fn(y)) for fn in row_fns])
        pfn, _ = _natural_cubic(xs, colv)
        return float(pfn(x))

    return {"kind": "interp2d", "predict": predict,
            "x": xs, "y": ys, "grid": g}


_MATH_EVALS["replace"] = lambda v, old, new: np.where(
    _vec(v) == float(old), float(new), _vec(v))
_MATH_EVALS["bicubicspline"] = _bicubic_spline
_MATH_EVALS["predict"] = lambda model, x, y=None: (
    model["predict"](float(x), float(y))
    if isinstance(model, dict) and model.get("kind") == "interp2d"
    else _predict_math(model, x))
