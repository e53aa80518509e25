"""Local simulation of the verification driver: run queries() vs oracle_sql()
at sf0.01 and compare rows/schema/values after pandas canonicalization
(sorted columns by name, rows lexicographically — list cells would crash,
exactly like the real driver).

Usage: driver_sim.py [--bare] [query ...]

--bare runs a DRIVER-PARITY session: a plain
SparkSession.builder.master("local[8]").getOrCreate() with none of the
repo's tuning (no Arrow, no AQE overrides, default page size). The real
driver uses such a session, so config-dependent failures (e.g. the r5
events_stream_hourly nullable-bigint toPandas pin, which only the
non-Arrow createDataFrame verifier rejects) must be certified in BOTH
modes before shipping."""
import json
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry
from code_graph_rag_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(names):
    bare = "--bare" in names
    names = [n for n in names if n != "--bare"]
    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("driver_sim_bare")
            .getOrCreate()
        )
    else:
        spark = get_spark(cores=8, shuffle_partitions=8, app_name="driver_sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    results = {}
    for name in names or qs:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:
            results[name] = f"SPARK ERR {type(e).__name__}: {str(e)[:200]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only: {len(sdf)} rows"
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERR {type(e).__name__}: {str(e)[:300]}"
            continue
        try:
            a, b = canon(sdf), canon(odf)
        except Exception as e:
            results[name] = f"CANON ERR {type(e).__name__}: {str(e)[:200]}"
            continue
        rows = len(a) == len(b)
        schema = list(a.columns) == list(b.columns)
        vals = rows and schema and a.astype(str).equals(b.astype(str))
        results[name] = f"rows={rows}({len(a)}/{len(b)}) schema={schema} vals={vals}"
        if not vals and rows and schema:
            neq = (a.astype(str) != b.astype(str)).any(axis=1)
            print(name, "first diffs:")
            print(a[neq].head(3))
            print(b[neq].head(3))
    for k, v in results.items():
        print(f"{k:28s} {v}")


if __name__ == "__main__":
    main(sys.argv[1:])
