"""Second-corpus differential: every registry query must hash-match
its DuckDB oracle on a DIFFERENT corpus than the fixed testdata — a
deterministic keyed subset (drop every row whose table key ≡ 2 mod 7)
of the sf0.001 tables, written once and read by BOTH engines.

Why: the primary mirror (tests/test_entry_oracle.py) compares on the
same fixed corpus every run, so an operator could agree with its oracle
by data coincidence (a CASE branch never taken, a tie never hit, an
empty group never formed). Perturbing membership — including breaking
referential integrity on purpose (some nations lose their region, some
orders lose line items) — re-derives both answers from changed inputs
and catches semantics that only looked aligned.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

pytestmark = pytest.mark.sweep

SRC_SF = "/root/testdata/sf0.001"

# table -> key column the subset filter runs on
KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# reads raw files at a literal sf0.01 path — meaningless on the subset
SKIP = {"binary_file_inventory"}


@pytest.fixture(scope="module")
def subset_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("subset_sf")
    from pyspark.sql import functions as F

    for t, key in KEYS.items():
        (
            spark.read.parquet(f"{SRC_SF}/{t}.parquet")
            .filter(F.pmod(F.col(key), F.lit(7)) != 2)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


@pytest.fixture(scope="module")
def subset_duck(subset_sf):
    con = duckdb.connect()
    for t in KEYS:
        # Spark writes each table as a DIRECTORY of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{subset_sf}/{t}.parquet/*.parquet')"
        )
    return con


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


@pytest.fixture(scope="module")
def dup_sf(spark, tmp_path_factory):
    """Duplicate-HEAVY corpus: documents and embeddings doubled with a
    key-shifted identical copy (every doc/vector gains one exact twin),
    other tables copied through. The fixed corpus has few real
    duplicates, so this is the variant that actually exercises cluster
    formation, survivorship argmax ties, exact-dup collapse, and
    identical-vector similarity ties in BOTH engines."""
    from pyspark.sql import functions as F

    out = tmp_path_factory.mktemp("dup_sf")
    for t, key in KEYS.items():
        src = spark.read.parquet(f"{SRC_SF}/{t}.parquet")
        if t in ("documents", "embeddings"):
            shift = src.agg(F.max(key)).first()[0] + 1
            twin = src.withColumn(key, F.col(key) + F.lit(shift))
            src = src.unionByName(twin)
        src.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def dup_duck(dup_sf):
    con = duckdb.connect()
    for t in KEYS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{dup_sf}/{t}.parquet/*.parquet')"
        )
    return con


# the dedup + similarity families read documents/embeddings — the
# tables the dup variant doubles
def _dup_entries():
    from pinterest_data_pipeline6_spark.operators import dedup, similarity

    names = set(dedup.ORACLE) | set(similarity.ORACLE)
    return sorted(n for n in names if n in QUERIES and n in ORACLES)


@pytest.mark.parametrize("name", _dup_entries())
def test_dedup_family_matches_oracle_on_dup_heavy(spark, dup_sf, dup_duck, name):
    sdf = QUERIES[name](spark, dup_sf)
    s_cols, s_rows = _canon_rows(
        list(sdf.columns), [tuple(r) for r in sdf.collect()]
    )
    rel = dup_duck.execute(ORACLES[name])
    d_cols, d_rows = _canon_rows(
        [d[0] for d in rel.description], rel.fetchall()
    )
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"


@pytest.fixture(scope="module")
def unicode_sf(spark, tmp_path_factory):
    """Multibyte corpus: every document's text gains a UTF-8 suffix
    with 2- and 3-byte code points. The fixed corpus is pure ASCII, so
    without this the engines' agreement on utf-8 hashing (md5/xxhash
    over multibyte), tokenization, regex classes, and char-vs-byte
    length semantics is untested."""
    from pyspark.sql import functions as F

    out = tmp_path_factory.mktemp("unicode_sf")
    for t in KEYS:
        src = spark.read.parquet(f"{SRC_SF}/{t}.parquet")
        if t == "documents":
            src = src.withColumn("text", F.concat(F.col("text"), F.lit(" héllo 漢字")))
        src.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def unicode_duck(unicode_sf):
    con = duckdb.connect()
    for t in KEYS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{unicode_sf}/{t}.parquet/*.parquet')"
        )
    return con


def _text_entries():
    from pinterest_data_pipeline6_spark.operators import dedup, privacy, textops

    names = set(dedup.ORACLE) | set(textops.ORACLE) | set(privacy.ORACLE)
    return sorted(n for n in names if n in QUERIES and n in ORACLES)


@pytest.mark.parametrize("name", _text_entries())
def test_text_family_matches_oracle_on_multibyte(
    spark, unicode_sf, unicode_duck, name
):
    sdf = QUERIES[name](spark, unicode_sf)
    s_cols, s_rows = _canon_rows(
        list(sdf.columns), [tuple(r) for r in sdf.collect()]
    )
    rel = unicode_duck.execute(ORACLES[name])
    d_cols, d_rows = _canon_rows(
        [d[0] for d in rel.description], rel.fetchall()
    )
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"


@pytest.mark.parametrize(
    "name", sorted(k for k in QUERIES if k in ORACLES and k not in SKIP)
)
def test_query_matches_oracle_on_subset(spark, subset_sf, subset_duck, name):
    sdf = QUERIES[name](spark, subset_sf)
    s_cols, s_rows = _canon_rows(
        list(sdf.columns), [tuple(r) for r in sdf.collect()]
    )

    rel = subset_duck.execute(ORACLES[name])
    d_cols, d_rows = _canon_rows(
        [d[0] for d in rel.description], rel.fetchall()
    )

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"
