"""Driver-style check of the engine_* DuckDB oracles.

Runs every ``engine_*`` entry of ``__spark_entry__.queries()`` on Spark
and its ``oracle_sql()`` twin on DuckDB over the same parquet tables,
comparing row count, schema (column names) and exact values after
sorting rows — a strictly harsher version of the driver's
order-insensitive value hash (we require bit-equality of doubles).

Usage: python scripts/validate_engine_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    ok = True
    if len(spark_df) != len(oracle_df):
        print(f"  ROWS MISMATCH: spark={len(spark_df)} oracle={len(oracle_df)}")
        ok = False
    scols, ocols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if scols != ocols:
        print(f"  SCHEMA MISMATCH: spark={scols} oracle={ocols}")
        return False
    s = spark_df[scols].sort_values(scols).reset_index(drop=True)
    o = oracle_df[ocols].sort_values(ocols).reset_index(drop=True)
    if ok:
        for c in scols:
            sv, ov = s[c].to_numpy(), o[c].to_numpy()
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                eq = np.array_equal(sv.astype(np.float64), ov.astype(np.float64))
            else:
                eq = list(sv) == list(ov)
            if not eq:
                print(f"  VALUE MISMATCH in column {c}")
                mism = [(i, sv[i], ov[i]) for i in range(min(len(sv), len(ov)))
                        if (sv[i] != ov[i])][:8]
                for i, a, b in mism:
                    print(f"    row {i}: spark={a!r} oracle={b!r}")
                ok = False
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("validate-oracles").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duck_con(sf_dir)

    names = sorted(only) if only else [n for n in qs if n.startswith("engine_")]
    failures = []
    for name in names:
        print(f"== {name}")
        if name not in oracles:
            print("  (no oracle)")
            failures.append(name)
            continue
        sdf = qs[name](spark, sf_dir).toPandas()
        odf = con.execute(oracles[name]).df()
        if compare(name, sdf, odf):
            print(f"  OK ({len(sdf)} rows)")
        else:
            failures.append(name)
    print("\nFAILED:" if failures else "\nALL GREEN", failures if failures else "")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
