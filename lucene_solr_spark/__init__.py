"""lucene_solr_spark — a PySpark-native full-text analytics engine.

A from-scratch reimplementation of the *capabilities* of Apache
Lucene/Solr (reference: nknize/lucene-solr @ 8.0.0-SNAPSHOT) on top of
the Spark DataFrame API: inverted-index build as DataFrame
aggregations, BM25 top-k querying rank-identical to Lucene's
``BM25Similarity`` + ``TopScoreDocCollector`` semantics, plus the
Solr streaming-expression relational surface (joins, rollups, facets,
top-k, set ops) expressed as Catalyst-optimizable plans.

Nothing here is a port of the reference's Java execution engine; the
reference defines WHAT to compute (formulas, tie-breaks, tokenizer
semantics), Spark decides HOW.
"""

__version__ = "0.1.0"
