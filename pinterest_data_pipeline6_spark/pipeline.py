"""Batch pipeline entry point — the unit a daily scheduler invokes.

``run_batch`` is the engine-side equivalent of the reference's
orchestrated notebook run (DAG:27-41 fires "(Clone) Pinterest Data
Cleaning and Queries" daily; retries belong to the scheduler, not the
engine): read raw → clean → persist the three tables → run the 8-query
workload → persist ``followers_table`` (Q3a's output is itself a saved
table, BATCH:174).

Everything is lazily planned and executed per-table by Catalyst; the
only actions are the table writes and whatever the caller does with the
returned query DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pinterest_data_pipeline6_spark.operators import analytics as A
from pinterest_data_pipeline6_spark.sources.io import save_table
from pinterest_data_pipeline6_spark.sources.readers import read_raw_json, read_raw_parquet


def run_batch(
    spark: SparkSession,
    pin_path: str,
    geo_path: str,
    user_path: str,
    fmt: str = "parquet",
    deterministic: bool = True,
    persist_tables: bool = True,
    quality_report: dict | None = None,
    analyze_stats: bool = True,
) -> dict[str, DataFrame]:
    """Read → clean → persist → ANALYZE → query. Returns the 9 workload
    results (q1..q8 + q3b over the persisted followers_table).

    ``analyze_stats`` (default on) ships ``ANALYZE TABLE ... FOR
    COLUMNS`` with each persisted table so the cost-based optimizer
    has real row counts and column NDVs when planning the workload
    joins — docs/SCALE.md §"Stats-driven planning (CBO)" shows the
    broadcast-vs-sort-merge flip this enables. Opt out for throwaway
    runs where the extra stats scan isn't worth it.

    Pass ``quality_report={}`` to collect per-table ``observe()``
    metrics (row counts + key-null counts) during the persist actions —
    the production replacement for the reference's display()-after-
    every-step verification (SURVEY.md §5.1), at zero extra scans.
    Metrics appear in the dict only when ``persist_tables`` runs the
    write actions."""
    from pinterest_data_pipeline6_spark.functions.cleaning import (
        clean_geo,
        clean_pin,
        clean_user,
    )
    from pinterest_data_pipeline6_spark.functions.quality import observe_quality
    from pinterest_data_pipeline6_spark.sources.readers import analyze_table

    reader = read_raw_parquet if fmt == "parquet" else read_raw_json
    pin = clean_pin(reader(spark, "pin", pin_path), deterministic=deterministic)
    geo = clean_geo(reader(spark, "geo", geo_path), deterministic=deterministic)
    user = clean_user(reader(spark, "user", user_path), deterministic=deterministic)

    observations = {}
    if quality_report is not None and persist_tables:
        pin, observations["pin_table"] = observe_quality(pin, "pin_q", not_null=("ind",))
        geo, observations["geo_table"] = observe_quality(geo, "geo_q", not_null=("ind",))
        user, observations["user_table"] = observe_quality(user, "user_q", not_null=("ind",))

    if persist_tables:
        # S5 sinks (BATCH:108-109,190): queries then read the persisted
        # parquet (scan-time pruning/pushdown) instead of re-cleaning.
        # Drop any same-named TEMP views first: a leftover
        # register_cleaned_views session would otherwise SHADOW the
        # managed tables for both the reads below and ANALYZE (which
        # refuses uncached temp views outright).
        for tbl in ("pin_table", "geo_table", "user_table",
                    "followers_table"):
            spark.catalog.dropTempView(tbl)
        save_table(pin, "pin_table")
        save_table(geo, "geo_table")
        save_table(user, "user_table")
        if analyze_stats:
            for tbl in ("pin_table", "geo_table", "user_table"):
                analyze_table(spark, tbl)
        pin = spark.table("pin_table")
        geo = spark.table("geo_table")
        user = spark.table("user_table")
    else:
        pin.createOrReplaceTempView("pin_table")
        geo.createOrReplaceTempView("geo_table")
        user.createOrReplaceTempView("user_table")

    if quality_report is not None and persist_tables:
        # the writes above were the actions; metrics are ready now
        for tbl, obs in observations.items():
            quality_report[tbl] = obs.get

    followers = A.q3a_most_followers_per_country(pin, geo)
    if persist_tables:
        save_table(followers, "followers_table")  # BATCH:174
        if analyze_stats:
            analyze_table(spark, "followers_table")
        followers = spark.table("followers_table")
    else:
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
