"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()`` twin on
DuckDB over the same parquet, compare row count / schema (sorted column
names) / value hash. Usage: python scripts/correctness_sweep.py [names...]
"""
import hashlib
import json
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    qs, osql = entry.queries(), entry.oracle_sql()
    only = set(sys.argv[1:])
    out = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {}
        try:
            sdf = fn(spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            if name in osql:
                res = con.execute(osql[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                rec["hash_match"] = (value_hash(srows, scols)
                                     == value_hash(orows, ocols))
                rec["spark_rows"], rec["oracle_rows"] = (len(srows),
                                                         len(orows))
            else:
                rec["rows_only"] = len(srows)
            rec["err"] = None
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        rec["sec"] = round(time.time() - t0, 2)
        out[name] = rec
        ok = rec.get("err") or (
            "OK" if rec.get("hash_match",
                            rec.get("rows_only") is not None)
            else "MISMATCH")
        print(f"{name}: {ok} ({rec['sec']}s)", flush=True)
    bad = [n for n, r in out.items()
           if r.get("err") or (("hash_match" in r) and not (
               r["rows_match"] and r["schema_match"] and r["hash_match"]))]
    print(json.dumps({"bad": bad, "n": len(out)}))
    with open("/tmp/sweep_result.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
