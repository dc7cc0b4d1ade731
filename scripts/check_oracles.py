"""Driver-replica correctness sweep: every queries() entry vs its
DuckDB oracle at sf0.01 (sorted-tuple comparison; the driver's
value-hash gate is order-insensitive, so tuple equality is strictly
stronger). Usage: python scripts/check_oracles.py [sf_dir] [names...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")
    qs, osql = e.queries(), e.oracle_sql()
    bad = []
    for i, (name, fn) in enumerate(qs.items(), 1):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sr = sorted(map(tuple, fn(spark, SF).collect()))
            dr = sorted(map(tuple, con.execute(osql[name]).fetchall()))
            ok = sr == dr
            print(f"[{i:02d}] {name}: {'OK' if ok else 'MISMATCH'} "
                  f"({len(sr)}/{len(dr)} rows, {time.time()-t0:.1f}s)",
                  flush=True)
            if not ok:
                bad.append(name)
                ss, ds = set(sr), set(dr)
                print("   only-spark:", sorted(ss - ds)[:3], flush=True)
                print("   only-duck :", sorted(ds - ss)[:3], flush=True)
        except Exception as ex:  # noqa: BLE001 - report and continue
            bad.append(name)
            print(f"[{i:02d}] {name}: ERROR {ex}", flush=True)
    print("FAILED:" if bad else "ALL GREEN:", bad, flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
