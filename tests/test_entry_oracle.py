"""Driver-contract differential: every ``__spark_entry__.queries()``
entry must hash-match its ``oracle_sql()`` twin on DuckDB at sf0.01
(row-count + schema column set + order-insensitive value hash) —
a local mirror of the harness gate described in BASELINE.md.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(value):
    """Canonical string for one cell (float tolerance via rounding)."""
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


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


# genuinely non-SQL-expressible ops would be listed here; since r4
# every registry entry carries an oracle (kmeans: unrolled Lloyd CTEs;
# media rollup: the deterministic stand-in extractor is arithmetic)
NO_ORACLE_OK: set[str] = set()


def test_every_query_has_oracle():
    missing = [k for k in QUERIES if k not in ORACLES and k not in NO_ORACLE_OK]
    assert not missing, f"queries without oracle_sql: {missing}"


def test_every_oracle_has_query():
    extra = [k for k in ORACLES if k not in QUERIES]
    assert not extra, f"oracle_sql without queries entry: {extra}"


# oracles whose SQL addresses raw files by absolute path (DuckDB has no
# view-relative file access); they only line up at the driver's gate SF
PATH_PINNED_SF001 = {"binary_file_inventory"}


# DuckDB result types the driver's pandas-based hash canonicalization
# mangles: HUGEINT/UHUGEINT become float64 (precision loss → hash
# mismatch even when values are identical).  Bare SUM(<int>) is the
# usual culprit — oracles must CAST(... AS BIGINT).
_DRIVER_UNSAFE_TYPES = {"HUGEINT", "UHUGEINT"}


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLES))
def test_oracle_result_types_survive_driver_hash(duck, name):
    """The driver canonicalizes oracle results through pandas, where
    DuckDB's int128 types degrade to float64 and break the value hash
    (CORRECTNESS_r03: 4 false-red rows).  Probe each oracle's result
    schema so the local mirror predicts the driver."""
    if name in PATH_PINNED_SF001 and not SF_DIR.rstrip("/").endswith("sf0.01"):
        pytest.skip("oracle path pinned to sf0.01")
    rel = duck.sql(ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        # ANY decimal is unsafe, not just DECIMAL(38,*): DuckDB's .df()
        # renders decimals as float64 while Spark's toPandas keeps
        # Decimal objects, so the two sides repr-diverge even when the
        # values agree — route money through ROUND(CAST(... AS DOUBLE));
        # nested types (LIST/STRUCT/MAP) are equally unsafe: pandas
        # renders them as numpy arrays on one side and python lists on
        # the other — serialize to a canonical string instead (see
        # inverted_index_sample's comma-joined postings)
        if str(t) in _DRIVER_UNSAFE_TYPES
        or str(t).startswith(("DECIMAL", "STRUCT", "MAP"))
        or str(t).endswith("[]")
    ]
    assert not bad, (
        f"{name}: oracle columns {bad} have driver-unsafe DuckDB types; "
        "wrap in CAST(... AS BIGINT) (see hof_exists_forall)"
    )


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLES))
def test_query_matches_oracle(spark, duck, name):
    if name in PATH_PINNED_SF001 and not SF_DIR.rstrip("/").endswith("sf0.01"):
        pytest.skip("oracle path pinned to sf0.01 (read_blob needs a literal path)")
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    rel = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    s_cols, s_rows = _canon_rows(spark_cols, spark_rows)
    d_cols, d_rows = _canon_rows(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"
