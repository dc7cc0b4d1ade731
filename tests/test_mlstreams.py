"""featuresSelection (IGain) + textLogit vs a pure-Python oracle.

Oracle ports:
- IGain score: IGainTermsQParserPlugin.java:144-208 (binary entropy
  decomposition with the reference's +1 denominator on the
  not-containing branch).
- textLogit: full-batch gradient step per iteration with error and
  confusion measured at the iteration's STARTING weights
  (TextLogitRegressionQParserPlugin.java:203-205), x_j = idf_j *
  (1 + ln tf_j), idf_j = ln(N / (df_j + 1)).
"""
import math

import pytest

from lucene_solr_spark.streaming.mlstreams import (
    features_selection,
    text_logit,
)

DOCS = [
    # (doc_id, outcome, text)
    (0, 1, "spark query engine spark"),
    (1, 1, "spark data frame"),
    (2, 1, "query plan spark"),
    (3, 0, "window sill paint"),
    (4, 0, "paint brush window"),
    (5, 0, "data window frame"),
    (6, 1, "spark window query"),
    (7, 0, "brush sill paint paint"),
]


def _toks():
    return [(d, t) for d, o, text in DOCS for t in text.split()]


def _h(p):
    if p <= 0.0 or p >= 1.0:
        return 0.0
    return -p * math.log(p) - (1 - p) * math.log(1 - p)


def _igain_oracle(k):
    n = len(DOCS)
    pos = sum(o for _, o, _ in DOCS)
    terms = sorted({t for _, t in _toks()})
    rows = []
    for t in terms:
        hits = [(d, o) for d, o, text in DOCS if t in text.split()]
        df = len(hits)
        xc = sum(o for _, o in hits)
        score = _h(pos / n) - (
            (df / n) * _h(xc / df)
            + (1 - df / n) * _h((pos - xc) / (n - df + 1))
        )
        rows.append((round(score, 6), t, df,
                     round(math.log(n / (df + 1.0)), 6)))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return rows[:k]


@pytest.fixture(scope="module")
def frames(spark):
    tokens = spark.createDataFrame(_toks(), "doc_id long, term string")
    labels = spark.createDataFrame(
        [(d, o) for d, o, _ in DOCS], "doc_id long, outcome int")
    return tokens, labels


def test_igain_matches_oracle(frames):
    tokens, labels = frames
    got = features_selection(tokens, labels, 5).collect()
    want = _igain_oracle(5)
    assert [(r["score_f"], r["term"], r["docfreq"], r["idf_d"])
            for r in got] == [pytest.approx(w) for w in want]
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]


def test_igain_discriminative_terms_on_top(frames):
    tokens, labels = frames
    got = features_selection(tokens, labels, 3).collect()
    # 'spark' occurs only in positive docs, 'paint' only in negative —
    # both must beat any mixed term.
    top = {r["term"] for r in got}
    assert "spark" in top and "paint" in top


def _logit_oracle(terms, iters, alpha):
    n = len(DOCS)
    tf = {}
    for d, t in _toks():
        if t in terms:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    dfs = {t: sum(1 for (d, tt) in tf if tt == t) for t in terms}
    idf = [math.log(n / (dfs.get(t, 0) + 1.0)) for t in terms]
    docs = sorted({d for d, _ in tf})
    X, Y = [], []
    for d in docs:
        X.append([idf[j] * (1 + math.log(tf[(d, t)]))
                  if (d, t) in tf else 0.0
                  for j, t in enumerate(terms)])
        Y.append(float(DOCS[d][1]))
    w = [0.0] * (len(terms) + 1)
    out = []
    for it in range(1, iters + 1):
        g = [0.0] * len(w)
        err = 0.0
        tp = fp = tn = fn = 0
        for x, y in zip(X, Y):
            z = w[0] + sum(wj * xj for wj, xj in zip(w[1:], x))
            p = 1.0 / (1.0 + math.exp(-z))
            e = p - y
            err += abs(e)
            g[0] += e
            for j, xj in enumerate(x):
                g[j + 1] += e * xj
            pred = 1 if p >= 0.5 else 0
            if y == 1 and pred == 1:
                tp += 1
            elif y == 0 and pred == 1:
                fp += 1
            elif y == 0 and pred == 0:
                tn += 1
            else:
                fn += 1
        w = [wi - alpha * gi for wi, gi in zip(w, g)]
        out.append((list(w), err, tp, fp, tn, fn))
    return out


def test_text_logit_matches_oracle(frames):
    tokens, labels = frames
    terms = ("spark", "paint", "window")
    got = text_logit(tokens, labels, terms, iterations=4, alpha=0.05)
    want = _logit_oracle(terms, 4, 0.05)
    assert len(got) == 4
    for rec, (w, err, tp, fp, tn, fn) in zip(got, want):
        assert rec["weights"] == pytest.approx(w, rel=1e-9)
        assert rec["error"] == pytest.approx(err, rel=1e-9)
        assert (rec["tp"], rec["fp"], rec["tn"], rec["fn"]) == (
            tp, fp, tn, fn)


def test_text_logit_error_decreases(frames):
    tokens, labels = frames
    terms = ("spark", "paint")
    recs = text_logit(tokens, labels, terms, iterations=8, alpha=0.3)
    assert recs[-1]["error"] < recs[0]["error"]
    # the two perfectly-discriminative features should classify the
    # participating docs perfectly by the last iteration
    last = recs[-1]
    assert last["fp"] == 0 and last["fn"] == 0


def test_text_logit_row_parallelism_invariant(spark, sf_dir):
    """The driver row's emitted values must be invariant across input
    partition layouts and spark.sql.shuffle.partitions — guards the
    double-summation rounding-boundary flake class: partition-order
    noise in the float64 gradient sums (~1e-13 relative) must never
    survive the double-round (9 then 6 decimals) output contract."""
    from lucene_solr_spark.streaming.mlstreams import (
        _TLOGIT_ALPHA,
        _TLOGIT_ITERS,
        _TLOGIT_TERMS,
        _emit_logit_rows,
    )
    from lucene_solr_spark.relational.suite import _tokens, load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    labels = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("outcome"))
    toks = _tokens(spark, sf_dir)

    outs = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n_parts, shuffle in [(2, "2"), (8, "8"), (17, "37")]:
            spark.conf.set("spark.sql.shuffle.partitions", shuffle)
            recs = text_logit(
                toks.repartition(n_parts), labels, _TLOGIT_TERMS,
                iterations=_TLOGIT_ITERS, alpha=_TLOGIT_ALPHA)
            rows = [tuple(r) for r in _emit_logit_rows(
                spark, recs, len(_TLOGIT_TERMS)).collect()]
            outs.append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert outs[0] == outs[1] == outs[2]
