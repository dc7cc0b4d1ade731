"""Per-phase v2-build timing at one parallelism level (fresh JVM).
Usage: python scripts/diag_phases.py <cpus> [docs]"""
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cpus = int(sys.argv[1])
docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

from pyspark.sql import SparkSession, functions as F  # noqa: E402
from pyspark import StorageLevel  # noqa: E402

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from lucene_solr_spark.corpus import corpus_df  # noqa: E402
from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS  # noqa: E402
from lucene_solr_spark.analysis.jvm import analyzed_columns  # noqa: E402
from lucene_solr_spark.index.builder import PK, assign_docids  # noqa: E402
from lucene_solr_spark.index.segments import (  # noqa: E402
    BLOCKS_SCHEMA, SegmentIndex, _segment_builder)

corpus = corpus_df(spark, docs, partitions=cpus * 2)
corpus.persist().count()
dps = max(docs // (cpus * 2), 512)
out_root = tempfile.mkdtemp()
idx = SegmentIndex(out_root, spark)

t0 = time.time()
base = assign_docids(corpus)
parent = getattr(base, "_lss_persisted_parent", None)
with_ids = base.withColumn("segment", (F.col("docid") / dps).cast("int"))
analyzed = analyzed_columns(with_ids, max_token_length=255).drop("content")
analyzed.persist(StorageLevel.MEMORY_AND_DISK)
analyzed.count()
print(f"RES cpus={cpus} stage0 {round(time.time()-t0,2)}", flush=True)
if parent is not None:
    parent.unpersist()
t0 = time.time()
analyzed.drop("tokens", "content_sha256").write.mode("overwrite").parquet(
    idx.docmap_path)
print(f"RES cpus={cpus} docmap {round(time.time()-t0,2)}", flush=True)
t0 = time.time()
builder = _segment_builder(dps, frozenset(ENGLISH_STOP_WORDS))
out = analyzed.groupBy("segment").applyInPandas(builder, BLOCKS_SCHEMA)
out.write.mode("append").partitionBy("segment").parquet(idx.blocks_path)
print(f"RES cpus={cpus} blocks {round(time.time()-t0,2)}", flush=True)
t0 = time.time()
idx.summaries().select(
    F.col("first_docid").alias("docid"), *PK, "lang", "segment",
    F.col("n").alias("dl"),
    F.conv(F.hex(F.col("norms")), 16, 10).cast("int").alias("norm"),
    F.col("term").alias("content_sha256"),
).write.mode("overwrite").parquet(os.path.join(out_root, "docs"))
idx.blocks().groupBy("term").agg(
    F.sum("n").alias("df"), F.sum("sum_tf").alias("ttf")).write.mode(
    "overwrite").parquet(os.path.join(out_root, "dict"))
print(f"RES cpus={cpus} derived {round(time.time()-t0,2)}", flush=True)
import shutil  # noqa: E402
shutil.rmtree(out_root, ignore_errors=True)
spark.stop()
