"""Repro: run merge_upsert Spark vs DuckDB oracle at sf0.01, diff values."""
import sys

sys.path.insert(0, "/root/repo")
import duckdb

import __spark_entry__ as e
from pinterest_data_pipeline6_spark.session import get_spark

SF = "/root/testdata/sf0.01"
spark = get_spark("dbg")
name = "merge_upsert"
sdf = e.queries()[name](spark, SF).toPandas().sort_values("status").reset_index(drop=True)

con = duckdb.connect()
for t in ["orders"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
odf = con.execute(e.oracle_sql()[name]).fetchdf().sort_values("status").reset_index(drop=True)

print("SPARK:\n", sdf)
print("ORACLE:\n", odf)
for c in sdf.columns:
    if not (sdf[c] == odf[c]).all():
        print("MISMATCH col", c)
        print(sdf[c].tolist())
        print(odf[c].tolist())
spark.stop()
