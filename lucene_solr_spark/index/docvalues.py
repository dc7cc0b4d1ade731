"""Numeric DocValues updates: patch a per-document numeric field
in place, WITHOUT reindexing the document.

Lucene's ``IndexWriter.updateNumericDocValue(Term, String, long)``
resolves the term to docs and writes a new docvalues *generation*
file next to the segment — the segment's postings are untouched
(``index/NumericDocValuesFieldUpdates.java``,
``ReadersAndUpdates.java::writeFieldUpdates`` — each update batch gets
a fresh dvGen; readers overlay the highest generation per doc;
merges fold the updates into the merged segment's base docvalues).
Solr exposes this as "in-place updates" on docValues-only fields —
the cheap path for counters/boosts/timestamps that change often while
text never does.

Spark rendering — the base column and its patches are ordinary
parquet relations:

* base table   ``dv/<field>/base/``          (docid, value)
* patch files  ``dv/<field>/updates/gen=N/`` (docid, value) — one
  append-only directory per update batch, never rewritten (write-once,
  same discipline as Lucene's per-gen ``.dvd`` files);
* a reader overlays "highest gen wins, else base"
  (:func:`read_docvalues`) — merge-on-read;
* :func:`fold_docvalues` = the merge policy folding updates into a
  new base and dropping the patch files (ReadersAndUpdates role).

Scale shape: patches are usually tiny relative to the base (a day's
counter bumps vs the corpus), so the overlay is a broadcast
left-join; the fold is one exchange on docid. Readers never block
writers: gen directories are complete-before-visible (tmp + rename)
and the manifest names the live generations.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "write_docvalues",
    "update_numeric_docvalue",
    "read_docvalues",
    "fold_docvalues",
    "docvalues_info",
]

_META = "dv_meta.json"


def _field_root(root: str, field: str) -> str:
    return os.path.join(root, "dv", field)


def _load_meta(froot: str) -> dict:
    p = os.path.join(froot, _META)
    if not os.path.exists(p):
        return {"gens": []}
    with open(p) as f:
        return json.load(f)


def _store_meta(froot: str, meta: dict) -> None:
    tmp = os.path.join(froot, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(froot, _META))


def write_docvalues(values: DataFrame, root: str, field: str) -> None:
    """Write the base docvalues column for ``field``.

    ``values`` must have (docid, value). This is the index-build-time
    docvalues file; updates never touch it again until a fold."""
    froot = _field_root(root, field)
    values.select("docid", "value").write.mode("overwrite").parquet(
        os.path.join(froot, "base"))
    _store_meta(froot, {"gens": []})


def update_numeric_docvalue(spark: SparkSession, root: str, field: str,
                            updates: DataFrame) -> int:
    """Apply one update batch (docid, value) as a new generation.

    Returns the generation number. The batch directory is written
    complete-before-visible (tmp + rename), then the manifest is
    updated — a reader either sees the whole gen or none of it
    (IndexWriter.updateNumericDocValue → dvGen assignment in
    ReadersAndUpdates.java::writeFieldUpdates)."""
    froot = _field_root(root, field)
    meta = _load_meta(froot)
    gen = (max(meta["gens"]) + 1) if meta["gens"] else 1
    final = os.path.join(froot, "updates", f"gen={gen}")
    tmp = final + ".tmp"
    updates.select("docid", "value").write.mode("overwrite").parquet(tmp)
    os.replace(tmp, final)
    meta["gens"].append(gen)
    _store_meta(froot, meta)
    return gen


def read_docvalues(spark: SparkSession, root: str, field: str,
                   include_new_docs: bool = True) -> DataFrame:
    """Merge-on-read view (docid, value): highest generation wins,
    else the base value.

    The overlay is a broadcast LEFT join (patches ≪ base — a full
    outer join here would silently refuse the broadcast and
    sort-merge the whole base). ``include_new_docs`` additionally
    unions docs first seen in an update (no base row): Lucene requires
    the field to exist at index time, but Solr's in-place path allows
    absent-then-set; the union costs one extra column-pruned pass over
    the base's docid column, so pass ``False`` on the strict contract
    when reads dominate."""
    froot = _field_root(root, field)
    base = spark.read.parquet(os.path.join(froot, "base"))
    meta = _load_meta(froot)
    if not meta["gens"]:
        return base
    patches = [
        spark.read.parquet(os.path.join(froot, "updates", f"gen={g}"))
        .select("docid", "value", F.lit(g).alias("gen"))
        for g in meta["gens"]
    ]
    allp = patches[0]
    for p in patches[1:]:
        allp = allp.unionByName(p)
    latest = (
        allp.groupBy("docid")
        .agg(F.max_by("value", "gen").alias("pvalue"))
    )
    out = (
        base.join(F.broadcast(latest), "docid", "left")
        .select("docid",
                F.coalesce("pvalue", "value").alias("value"))
    )
    if include_new_docs:
        fresh = latest.join(base.select("docid"), "docid", "left_anti") \
            .select("docid", F.col("pvalue").alias("value"))
        out = out.unionByName(fresh)
    return out


def fold_docvalues(spark: SparkSession, root: str, field: str) -> None:
    """Fold all update generations into a new base and drop them —
    the merge applying pending DV updates. Readers opened after the
    fold see identical values through the plain base path."""
    froot = _field_root(root, field)
    folded = read_docvalues(spark, root, field)
    new_base = os.path.join(froot, "base.tmp")
    folded.write.mode("overwrite").parquet(new_base)
    old = os.path.join(froot, "base")
    trash = os.path.join(froot, "base.old")
    os.rename(old, trash)
    os.rename(new_base, old)
    # Crash between the base swap and the meta reset is safe: the new
    # base already holds the folded values and re-overlaying the same
    # generations is idempotent (latest-gen values equal the fold).
    _store_meta(froot, {"gens": []})
    shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(os.path.join(froot, "updates"), ignore_errors=True)


def docvalues_info(root: str, field: str) -> dict:
    """Live generations + base presence (Luke-style introspection)."""
    froot = _field_root(root, field)
    return {
        "field": field,
        "has_base": os.path.exists(os.path.join(froot, "base")),
        "gens": _load_meta(froot)["gens"],
    }
