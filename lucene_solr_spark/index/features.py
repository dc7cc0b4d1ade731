"""Feature-postings ingestion (FeatureField write path).

Reference: FeatureField.java:145-156 — a feature is indexed as a
single token (the feature name) whose TERM FREQUENCY carries the
encoded float value (``floatToIntBits(v) >>> 15``), in a dedicated
field with norms omitted (FIELD_TYPE at :108-113, omitNorms +
DOCS_AND_FREQS).

Spark rendering: feature rows append to the SAME postings/dict tables
the text build wrote — (field, term, docid, tf, positions=NULL,
norm=0, bucket) — so FeatureQuery leaves are plain bucket-pruned
postings scans and the dictionary supplies df/ttf for the default
saturation pivot (computePivotFeatureValue, FeatureField.java:508-520).
The encode is one Arrow-batched numpy bit-shift; everything else stays
JVM-side. At 100 TB the append is an Iceberg fast-append of
feature-only files into the bucket partitioning — no rewrite of text
postings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

from ..search.feature import encode_feature_values_np
from .builder import IndexTables, term_bucket_expr


@F.pandas_udf(LongType())
def _encode_udf(v: pd.Series) -> pd.Series:
    return pd.Series(encode_feature_values_np(v.to_numpy(dtype=np.float32)))


def add_features(tables: IndexTables, features: DataFrame,
                 field: str = "features") -> None:
    """Append feature postings to an existing index.

    ``features``: DataFrame(docid long, feature string, value float) —
    one row per (doc, feature), value a positive normal float
    (setFeatureValue validation runs inside the encoder UDF).
    """
    man = tables.manifest()
    n_buckets = int(man["n_buckets"])
    enc = (features
           .select(F.lit(field).alias("field"),
                   F.col("feature").alias("term"),
                   F.col("docid").cast("long").alias("docid"),
                   _encode_udf(F.col("value").cast("float"))
                   .cast("int").alias("tf"))
           .withColumn("positions",
                       F.lit(None).cast("array<int>"))
           .withColumn("norm", F.lit(0))
           .withColumn("bucket", term_bucket_expr(F.col("term"), n_buckets)))
    enc = enc.repartition("bucket").sortWithinPartitions("term", "docid")
    enc.write.mode("append").partitionBy("bucket").parquet(
        tables.postings_path)

    # dictionary rows: df/ttf feed the default saturation pivot
    dict_rows = (enc.groupBy("field", "term")
                 .agg(F.count("*").alias("df"), F.sum("tf").alias("ttf"))
                 .withColumn("bucket",
                             term_bucket_expr(F.col("term"), n_buckets)))
    existing = tables.dict()
    if "field" not in existing.columns:
        raise ValueError(
            "add_features requires a field-aware index (dict table has "
            "no 'field' column); rebuild with the current builder")
    dict_rows.select(*existing.columns).write.mode("append").parquet(
        tables.dict_path)
