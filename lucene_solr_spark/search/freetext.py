"""FreeTextSuggester: n-gram language model with stupid backoff.

Reference: lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/FreeTextSuggester.java — builds token n-grams (ShingleFilter,
:228-238) into one weighted FST and predicts the next token from the
last grams-1 tokens with "stupid backoff" scoring (Brants et al. 2007;
ALPHA = 0.4, :133): score(w | context) = count(context·w) /
count(context), falling back to the (order-1) model scaled by ALPHA per
step down (:546-549, :663 — the backoff multiplier advances once per
order regardless of whether the order contributed), deduping a
candidate already predicted by a higher order (:611-654 `seen`).

Spark shape: the model IS three count tables (1/2/3-gram), built with
one scan — shingles are computed row-locally from the token array
(slice+zip, the ShingleFilter role, no self-join) and reduced by one
groupBy each (map-side combined). A lookup is a sargable filter on the
context columns of the n-gram tables (partition/sort keys at scale)
joined against the broadcast context counts — no driver-side model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ALPHA = 0.4  # FreeTextSuggester.java:133


def _token_arrays(docs: DataFrame, text_col: str):
    """Whitespace tokens, empties dropped row-locally (keeps shingle
    adjacency without a positions re-rank)."""
    return docs.select(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("l"))


def _grams(tok: DataFrame, n: int) -> DataFrame:
    """Row-local shingles of order n -> global counts (w1..wn, n)."""
    size = F.size("l")
    tok = tok.where(size >= n)  # too-short docs emit no n-shingles
    # greatest() guard: Catalyst may collapse the filter+project into
    # one stage where slice evaluates on filtered-out rows' buffers
    length = F.greatest(size - (n - 1), F.lit(0))
    cols = [F.slice("l", i + 1, length).alias(f"_s{i}") for i in range(n)]
    zipped = tok.select(F.arrays_zip(*[c for c in cols]).alias("z"))
    g = zipped.select(F.explode("z").alias("g")).select(
        *[F.col(f"g._s{i}").alias(f"w{i + 1}") for i in range(n)])
    return g.groupBy(*[f"w{i + 1}" for i in range(n)]).agg(
        F.count("*").alias("n"))


class FreeTextSuggester:
    """grams=3 model over a corpus DataFrame; lookup(context) returns a
    (cand, score, ord) DataFrame for a trailing-space query (the
    "lastTokenEnded" upgrade path, FreeTextSuggester.java:480-497:
    predict whole next tokens, no unigram predictions)."""

    def __init__(self, docs: DataFrame, text_col: str = "text", grams: int = 3):
        if grams != 3:
            raise ValueError("this implementation fixes grams=3")
        tok = _token_arrays(docs, text_col)
        self.g1 = _grams(tok, 1).persist()
        self.g2 = _grams(tok, 2).persist()
        self.g3 = _grams(tok, 3).persist()

    def lookup(self, context: tuple[str, str], num: int = 10) -> DataFrame:
        """All predictions for `<w1> <w2> ` (trailing space): trigram
        candidates at backoff 1.0, bigram candidates (not already
        predicted) at ALPHA; global top-`num` by score desc, term asc
        (the reference's LookupResult comparator, :672-683)."""
        w1, w2 = context
        tri_ctx = (self.g2.where((F.col("w1") == w1) & (F.col("w2") == w2))
                   .select(F.col("n").alias("ctx_n")))
        tri = (self.g3.where((F.col("w1") == w1) & (F.col("w2") == w2))
               .crossJoin(F.broadcast(tri_ctx))
               .select(F.col("w3").alias("cand"),
                       (F.col("n") / F.col("ctx_n")).alias("score"),
                       F.lit(3).alias("ord")))
        bi_ctx = (self.g1.where(F.col("w1") == w2)
                  .select(F.col("n").alias("ctx_n")))
        bi = (self.g2.where(F.col("w1") == w2)
              .crossJoin(F.broadcast(bi_ctx))
              .select(F.col("w2").alias("cand"),
                      (F.lit(ALPHA) * F.col("n") / F.col("ctx_n")).alias("score"),
                      F.lit(2).alias("ord")))
        bi = bi.join(tri.select("cand"), "cand", "left_anti")
        return (tri.unionByName(bi)
                .select("cand", F.round("score", 6).alias("score"),
                        F.col("ord").cast("int"))
                .orderBy(F.desc("score"), F.asc("cand"))
                .limit(num))
