"""Ad-hoc differential for a subset of registry entries (dev loop).

Usage: python scripts/diff_new_entries.py name1 name2 ... [--sf DIR]
Mirrors tests/test_entry_oracle.py's canonicalization.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pinterest_data_pipeline6_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _canon(value):
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.6g}"
    return str(value)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    spark = get_spark("diff-new")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = []
    for name in names:
        sdf = qs[name](spark, SF_DIR)
        s_cols, s_rows = _canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        rel = con.execute(os_[name])
        d_cols = [d[0] for d in rel.description]
        d_rows = rel.fetchall()
        # driver-unsafe type probe
        types = [str(t) for t in con.sql(os_[name]).types]
        bad_types = [t for t in types if t in ("HUGEINT", "UHUGEINT") or "DECIMAL(38" in t]
        d_cols, d_rows = _canon_rows(d_cols, d_rows)
        ok = s_cols == d_cols and s_rows == d_rows and not bad_types
        print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(s_rows)}/{len(d_rows)}"
              + (f" badtypes={bad_types}" if bad_types else ""))
        if not ok:
            failed.append(name)
            if s_cols != d_cols:
                print("  cols:", s_cols, "vs", d_cols)
            for a, b in list(zip(s_rows, d_rows))[:200]:
                if a != b:
                    print("  ", a, "vs", b)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
