"""Degenerate-input robustness: every registry query must execute —
not necessarily return rows — against an EMPTY corpus (all ten tables
present with their real schemas but zero rows).

Why this matters at 100 TB: partition pruning, date filters, and
per-tenant slices routinely hand an operator zero rows, and Spark 4's
ANSI mode turns sloppy empty-input handling (divide on an empty
aggregate coerced to 0, ``first()``-derived literals, min/max fed into
``sequence()``) into runtime exceptions rather than quiet nulls. A
query that throws on empty input would take down a whole scheduled
pipeline run, so "runs to completion on empty" is a correctness
contract, not a nicety.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

pytestmark = pytest.mark.sweep

SRC_SF = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        (
            spark.read.parquet(f"{SRC_SF}/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_corpus(spark, empty_sf, name):
    df = QUERIES[name](spark, empty_sf)
    df.count()  # executing must not raise; zero rows is a valid answer


@pytest.fixture(scope="module")
def singleton_sf(spark, tmp_path_factory):
    """One row per table — the other degenerate shape: single-sample
    stddev/variance (null under sample semantics), n-1 divisors,
    windows over one row, self-joins with no partner row."""
    out = tmp_path_factory.mktemp("singleton_sf")
    for t in TABLES:
        (
            spark.read.parquet(f"{SRC_SF}/{t}.parquet")
            .limit(1)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_singleton_corpus(spark, singleton_sf, name):
    df = QUERIES[name](spark, singleton_sf)
    df.count()  # executing must not raise


def _is_key(col: str) -> bool:
    return col.endswith(("_id", "key")) or col in ("copy",)


@pytest.fixture(scope="module")
def nulls_sf(spark, tmp_path_factory):
    """Every NON-KEY column nulled (keys kept so joins/groupings still
    have something to chew on) — the shape a half-ingested or
    schema-drifted upstream delivers. Queries must tolerate null text,
    null dates, null arrays, null metrics without throwing; null/empty
    RESULTS are fine."""
    from pyspark.sql import functions as F

    out = tmp_path_factory.mktemp("nulls_sf")
    for t in TABLES:
        src = spark.read.parquet(f"{SRC_SF}/{t}.parquet")
        cols = [
            F.col(c) if _is_key(c) else F.lit(None).cast(dt).alias(c)
            for c, dt in src.dtypes
        ]
        src.select(*cols).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_all_null_values(spark, nulls_sf, name):
    df = QUERIES[name](spark, nulls_sf)
    df.count()  # executing must not raise
