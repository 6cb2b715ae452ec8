"""Mirror of the driver's correctness harness: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
counterpart on DuckDB over the same parquet, compare row count, schema
(column names) and an order-insensitive value hash.

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json OUT.json`` additionally writes one record per query —
match flags, row counts, and the Spark/DuckDB wall seconds — so the
full-sweep artifact checked into BENCH/ makes round-over-round
per-query correctness AND perf deltas auditable for the queries the
driver's 50-row CORRECTNESS file never sweeps.
"""

from __future__ import annotations

import hashlib
import json
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
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}

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
            records[name] = {"err": f"spark: {e}"[:500]}
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) "
                  f"[spark {spark_t:.1f}s]")
            if len(sdf) == 0:
                print(f"  WARN {name}: zero rows")
            records[name] = {"rows_match": len(sdf) > 0,
                             "schema_match": None, "hash_match": None,
                             "spark_rows": len(sdf), "oracle_rows": None,
                             "spark_sec": round(spark_t, 3),
                             "oracle_sec": None,
                             "err": None, "note": "no_oracle"}
            continue
        t1 = time.time()
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            records[name] = {"err": f"duckdb: {e}"[:500]}
            continue
        oracle_t = time.time() - t1
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_schema and value_hash(sdf) == value_hash(odf)
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        records[name] = {"rows_match": ok_rows, "schema_match": ok_schema,
                         "hash_match": ok_hash, "spark_rows": len(sdf),
                         "oracle_rows": len(odf),
                         "spark_sec": round(spark_t, 3),
                         "oracle_sec": round(oracle_t, 3), "err": None}
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
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(records),
                       "failures": failures, "queries": records},
                      f, indent=1, sort_keys=True)
        print("wrote", json_out)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
