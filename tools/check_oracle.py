"""Mirror of the driver's correctness harness: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
counterpart on DuckDB over the same parquet, compare row count, schema
(column names) and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append("\x1f".join(_norm(v) for v in tup))
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def _norm(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) "
                  f"[spark {spark_t:.1f}s]")
            if len(sdf) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_schema and value_hash(sdf) == value_hash(odf)
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows {len(sdf)}/{len(odf)} "
              f"schema={'=' if ok_schema else sorted(sdf.columns)}"
              f"{'' if ok_schema else sorted(odf.columns)} "
              f"hash={'=' if ok_hash else '≠'} [spark {spark_t:.1f}s]")
        if not ok_hash and ok_schema and len(sdf) and len(odf):
            cols = sorted(sdf.columns)
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].sort_values(cols).reset_index(drop=True)
            if len(a) == len(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                if bad.any():
                    i = bad.idxmax()
                    print(f"  first diff row {i}:\n   spark {a.loc[i].to_dict()}"
                          f"\n   duck  {b.loc[i].to_dict()}")
            else:
                merged = a.merge(b, how="outer", indicator=True)
                extra = merged[merged["_merge"] != "both"].head(4)
                print(extra.to_string())
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
