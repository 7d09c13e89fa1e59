from __future__ import annotations

import pytest

from pinterest_data_pipeline6_spark import fixtures
from pinterest_data_pipeline6_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="pdp6-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_dirty")
    fixtures.write_fixtures(d, n_rows=1000, seed=42, dedup_safe=False)
    return d


@pytest.fixture(scope="session")
def fixture_dir_safe(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_safe")
    fixtures.write_fixtures(d, n_rows=1000, seed=43, dedup_safe=True)
    return d


def df_to_sorted_rows(df):
    """Order-insensitive canonical form: sorted list of value tuples with
    columns sorted by name (mirrors the driver's compare)."""
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))
