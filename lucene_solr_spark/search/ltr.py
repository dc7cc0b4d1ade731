"""Learning-to-rank rerank (solr/contrib/ltr role:
org.apache.solr.ltr — LTRScoringQuery / feature.SolrFeature /
model.LinearModel / model.MultipleAdditiveTreesModel).

The reference's LTR plugin extracts per-document feature vectors for
the top-N of a first-pass query, scores them with a trained model,
and reranks. Here:

  * features are named Query objects (SolrFeature role — each
    feature's value is the engine score of that query on the doc, 0
    where it doesn't match) plus optional doc-column features
    (FieldValueFeature role);
  * LinearModel — dot(weights, features) (model/LinearModel.java:
    score = Σ w_i · f_i);
  * MultipleAdditiveTreesModel — an ensemble of regression trees,
    compiled to nested Catalyst ``when`` expressions (one Column per
    tree, summed) — the whole model evaluates JVM-side in
    whole-stage codegen, no UDF;
  * rerank applies the model to the first-pass top-N only
    (LTRQParserPlugin's reRankDocs), exactly like rescore().

Scale notes: feature extraction is one engine search per feature
query, each SEMI-JOINED to the N candidates before any scoring work
is materialized — the model never sees the corpus, only N rows; the
model itself is a broadcast-free pure Column expression.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .executor import IndexSearcher
from .queries import Query


def extract_features(searcher: IndexSearcher, candidates: DataFrame,
                     features: dict[str, Query],
                     doc_features: tuple[str, ...] = ()) -> DataFrame:
    """Feature matrix for the candidate docids: one column per named
    feature query (engine score; 0.0 where the feature query does not
    match the doc — feature.Feature.FeatureWeight's defaultValue) plus
    optional doc-table columns (FieldValueFeature)."""
    out = candidates.select("docid")
    for name, fq in features.items():
        scored = searcher.search_df(fq, None).select(
            "docid", F.col("score").alias(name))
        out = out.join(scored, "docid", "left")
    if doc_features:
        out = out.join(
            searcher.docs.select("docid", *doc_features), "docid", "left")
    fill = {n: 0.0 for n in features}
    fill.update({c: 0.0 for c in doc_features})
    return out.fillna(fill)


@dataclass(frozen=True)
class TreeNode:
    """One regression-tree node (model/MultipleAdditiveTreesModel's
    RegressionTreeNode): a leaf carries ``value``; an interior node
    splits on feature < threshold."""
    feature: str | None = None
    threshold: float = 0.0
    left: "TreeNode | None" = None
    right: "TreeNode | None" = None
    value: float = 0.0

    def to_column(self):
        if self.feature is None:
            return F.lit(float(self.value))
        return F.when(F.col(self.feature) < F.lit(float(self.threshold)),
                      self.left.to_column()).otherwise(
                          self.right.to_column())


def linear_score_column(weights: dict[str, float]):
    """LinearModel.java: score = Σ w_i · f_i as one Column."""
    col = F.lit(0.0)
    for name, w in sorted(weights.items()):
        col = col + F.lit(float(w)) * F.col(name)
    return col


def trees_score_column(trees: list[tuple[float, TreeNode]]):
    """MultipleAdditiveTreesModel.java: Σ tree_weight · tree(features),
    each tree a nested when-chain — pure codegen, no UDF."""
    col = F.lit(0.0)
    for w, root in trees:
        col = col + F.lit(float(w)) * root.to_column()
    return col


def ltr_rerank(searcher: IndexSearcher, q: Query,
               features: dict[str, Query],
               model_col, rescore_n: int = 100, k: int = 10,
               doc_features: tuple[str, ...] = (),
               keep_features: bool = False) -> DataFrame:
    """LTRQParserPlugin role: first-pass top-N by ``q``, feature
    extraction, model scoring (``model_col`` from
    :func:`linear_score_column` / :func:`trees_score_column` — any
    Column over the feature names works), rerank to top-k. The
    first-pass score is always available to the model as feature
    ``originalScore`` (feature.OriginalScoreFeature)."""
    first = (searcher.search_df(q, None)
             .orderBy(F.desc("score"), F.asc("docid"))
             .limit(rescore_n)
             .select("docid", F.col("score").alias("originalScore")))
    fm = extract_features(searcher, first, features, doc_features)
    fm = fm.join(first, "docid")
    out = fm.withColumn("ltr_score", model_col.cast("double"))
    cols = (["docid", "ltr_score", "originalScore"]
            + (list(features) + list(doc_features) if keep_features else []))
    return (out.select(*cols)
            .orderBy(F.desc("ltr_score"), F.asc("docid")).limit(k))
