"""Registry-wide smoke: every queries() entry runs at sf0.001 and
returns a stable, non-degenerate schema. Catches a broken registry
entry even when it has no oracle (rows-only ops)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
QUERIES = entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["country", "category", "category_count"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registry_entry_runs(spark, name):
    df = QUERIES[name](spark, SF)
    assert len(df.columns) > 0
    assert len(set(df.columns)) == len(df.columns), "duplicate column names"
    df.limit(5).collect()  # executes the plan end-to-end
