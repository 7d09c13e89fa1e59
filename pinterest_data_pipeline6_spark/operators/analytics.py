"""The 8-query analytics workload over cleaned pin/geo/user tables.

Each query exists twice, by design (the reference's API surface is
exactly {DataFrame API for cleaning, SQL for analytics} — SURVEY.md
§2.12): a DataFrame-API function here, and the equivalent SQL text in
``ANALYTICS_SQL`` (runnable via ``spark.sql`` over the registered
``pin_table``/``geo_table``/``user_table`` views). Tests assert the two
forms agree row-for-row.

Scale notes (apply per-query, verified via .explain):
- joins are single-key equi-joins on ``ind``; at 100 TB pin is the fact
  side and geo/user are ~same cardinality, so these are shuffle
  hash/sort-merge joins — AQE handles skewed countries;
- every GROUP BY is a partial+final hash aggregate (map-side combine),
  so the shuffle carries pre-aggregated rows, not raw events;
- the window top-1 (Q3a) shuffles once on ``country``;
- ``ORDER BY ... LIMIT 1`` (Q3b) compiles to TakeOrderedAndProject —
  no global sort;
- medians use ``percentile_approx`` (Greenwald-Khanna sketch) exactly
  like the reference — mergeable, single-pass, cluster-safe (an exact
  median at 100 TB would need a full sort per group).

Reference parity: "(Clone) Pinterest Data Cleaning and Queries.py"
(BATCH) lines cited per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def age_group_expr():
    """CASE-bucketing of age (A6; BATCH:196-201). <18 falls into '+50' —
    the reference's ELSE branch — reproduced on purpose (observable
    behavior). A function because Column construction needs an active
    SparkContext."""
    return (
        F.when(F.col("age").between(18, 24), "18-24")
        .when(F.col("age").between(25, 35), "25-35")
        .when(F.col("age").between(36, 50), "36-50")
        .otherwise("+50")
    )

AGE_GROUP_SQL = """CASE
        WHEN age BETWEEN 18 AND 24 THEN '18-24'
        WHEN age BETWEEN 25 AND 35 THEN '25-35'
        WHEN age BETWEEN 36 AND 50 THEN '36-50'
        ELSE '+50'
    END"""


def q1_most_pop_category_per_country(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Q1: pin count per (country, category). BATCH:111-123 (J1+A1+A5)."""
    return (
        geo.join(pin, "ind", "inner")
        .groupBy("country", "category")
        .agg(F.count("category").alias("category_count"))
        .distinct()  # reference's SELECT DISTINCT (a no-op post-GROUP BY; kept for parity)
    )


def q2_post_count_per_year(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Q2: count per (post_year, category), years 2018-2022. BATCH:130-145."""
    return (
        geo.join(pin, "ind", "inner")
        .withColumn("post_year", F.year("timestamp"))
        .filter((F.col("post_year") >= 2018) & (F.col("post_year") <= 2022))
        .groupBy("post_year", "category")
        .agg(F.count("category").alias("category_count"))
        .orderBy("post_year")
    )


def q3a_most_followers_per_country(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Q3a: per-country poster with max follower_count. BATCH:151-174.

    Window row_number desc + filter ==1; ties broken by poster_name so
    the result is deterministic (the reference leaves ties arbitrary —
    SURVEY.md §2.13)."""
    w = Window.partitionBy("country").orderBy(
        F.desc("follower_count"), F.asc_nulls_last("poster_name")
    )
    return (
        geo.join(pin, "ind", "inner")
        .select("country", "poster_name", "follower_count")
        .withColumn("row_num", F.row_number().over(w))
        .filter(F.col("row_num") == 1)
        .drop("row_num")
    )


def q3b_user_with_most_followers(followers: DataFrame) -> DataFrame:
    """Q3b: global max-follower row from Q3a's output. BATCH:176-185.
    Compiles to TakeOrderedAndProject (top-k, no full sort)."""
    return (
        followers.select("country", "follower_count")
        .orderBy(F.desc("follower_count"))
        .limit(1)
    )


def q4_most_popular_category(pin: DataFrame, user: DataFrame) -> DataFrame:
    """Q4: distinct (user, category) pairs per (age_group, category).
    BATCH:192-222 (A6+J2+A2+O2)."""
    age_groups = user.select("ind", age_group_expr().alias("age_group"))
    return (
        age_groups.join(pin, "ind", "inner")
        .groupBy("age_group", "category")
        .agg(F.count_distinct("ind", "category").alias("category_count"))
        .orderBy(F.asc("age_group"), F.desc("category_count"))
    )


def q5_median_follower_count(pin: DataFrame, user: DataFrame) -> DataFrame:
    """Q5: approx-median follower_count per age_group. BATCH:228-254."""
    age_groups = user.select("ind", age_group_expr().alias("age_group"))
    return (
        age_groups.join(pin, "ind", "inner")
        .groupBy("age_group")
        .agg(F.percentile_approx("follower_count", 0.5).alias("median_follower_count"))
        .orderBy(F.desc("median_follower_count"))
    )


def q6_users_joined(user: DataFrame) -> DataFrame:
    """Q6: distinct users joined per year(date_joined). BATCH:259-270."""
    return (
        user.withColumn("post_year", F.year("date_joined"))
        .groupBy("post_year")
        .agg(F.count_distinct("ind").alias("number_users_joined"))
        .orderBy(F.desc("post_year"))
    )


def q7_med_users_per_join_year(pin: DataFrame, user: DataFrame) -> DataFrame:
    """Q7: approx-median follower_count per join-year. BATCH:275-288.
    (The reference's variable name mentions 2015-2020 but applies no
    filter — semantics kept, SURVEY.md §2.13.)"""
    return (
        user.join(pin, "ind", "inner")
        .withColumn("post_year", F.year("date_joined"))
        .groupBy("post_year")
        .agg(F.percentile_approx("follower_count", 0.5).alias("median_follower_count"))
        .orderBy(F.asc("post_year"))
    )


def q8_med_follower_join_age(pin: DataFrame, user: DataFrame) -> DataFrame:
    """Q8: approx-median follower_count per (age_group, join-year);
    3-way join user x pin x age_group CTE. BATCH:293-322 (J4)."""
    age_groups = user.select(F.col("ind").alias("ag_ind"), age_group_expr().alias("age_group"))
    return (
        user.join(pin, "ind", "inner")
        .join(age_groups, F.col("ind") == F.col("ag_ind"), "inner")
        .withColumn("post_year", F.year("date_joined"))
        .groupBy("age_group", "post_year")
        .agg(F.percentile_approx("follower_count", 0.5).alias("median_follower_count"))
        .orderBy(F.desc("age_group"), F.desc("post_year"))
    )


# ---------------------------------------------------------------------------
# SQL twins (runnable over pin_table / geo_table / user_table views)
# ---------------------------------------------------------------------------

ANALYTICS_SQL: dict[str, str] = {
    "q1": """
        SELECT DISTINCT geo_table.country, pin_table.category,
               COUNT(pin_table.category) AS category_count
        FROM geo_table
        INNER JOIN pin_table ON geo_table.ind = pin_table.ind
        GROUP BY geo_table.country, pin_table.category
    """,
    "q2": """
        SELECT DISTINCT YEAR(geo_table.timestamp) AS post_year, pin_table.category,
               COUNT(pin_table.category) AS category_count
        FROM geo_table
        INNER JOIN pin_table ON geo_table.ind = pin_table.ind
        WHERE YEAR(geo_table.timestamp) >= 2018 AND YEAR(geo_table.timestamp) <= 2022
        GROUP BY post_year, pin_table.category
        ORDER BY post_year ASC
    """,
    "q3a": """
        WITH RankedResults AS (
            SELECT geo_table.country AS country,
                   pin_table.poster_name AS poster_name,
                   pin_table.follower_count AS follower_count,
                   ROW_NUMBER() OVER (
                       PARTITION BY geo_table.country
                       ORDER BY pin_table.follower_count DESC, pin_table.poster_name ASC NULLS LAST
                   ) AS row_num
            FROM geo_table
            INNER JOIN pin_table ON geo_table.ind = pin_table.ind
        )
        SELECT country, poster_name, follower_count
        FROM RankedResults WHERE row_num = 1
    """,
    "q3b": """
        SELECT country, follower_count FROM followers_table
        ORDER BY follower_count DESC LIMIT 1
    """,
    "q4": f"""
        WITH age_group_table AS (
            SELECT ind, {AGE_GROUP_SQL} AS age_group FROM user_table
        )
        SELECT age_group_table.age_group, pin_table.category,
               COUNT(DISTINCT age_group_table.ind, pin_table.category) AS category_count
        FROM age_group_table
        JOIN pin_table ON age_group_table.ind = pin_table.ind
        GROUP BY age_group_table.age_group, pin_table.category
        ORDER BY age_group_table.age_group, category_count DESC
    """,
    "q5": f"""
        WITH age_group_table AS (
            SELECT ind, {AGE_GROUP_SQL} AS age_group FROM user_table
        )
        SELECT age_group_table.age_group,
               percentile_approx(pin_table.follower_count, 0.5) AS median_follower_count
        FROM age_group_table
        JOIN pin_table ON age_group_table.ind = pin_table.ind
        GROUP BY age_group_table.age_group
        ORDER BY median_follower_count DESC
    """,
    "q6": """
        SELECT YEAR(user_table.date_joined) AS post_year,
               COUNT(DISTINCT(ind)) AS number_users_joined
        FROM user_table
        GROUP BY post_year
        ORDER BY post_year DESC
    """,
    "q7": """
        SELECT YEAR(user_table.date_joined) AS post_year,
               percentile_approx(pin_table.follower_count, 0.5) AS median_follower_count
        FROM user_table
        JOIN pin_table ON user_table.ind = pin_table.ind
        GROUP BY post_year
        ORDER BY post_year ASC
    """,
    "q8": f"""
        WITH age_group_table AS (
            SELECT ind, {AGE_GROUP_SQL} AS age_group FROM user_table
        )
        SELECT age_group_table.age_group AS age_group,
               YEAR(user_table.date_joined) AS post_year,
               percentile_approx(pin_table.follower_count, 0.5) AS median_follower_count
        FROM user_table
        JOIN pin_table ON user_table.ind = pin_table.ind
        JOIN age_group_table ON user_table.ind = age_group_table.ind
        GROUP BY age_group, post_year
        ORDER BY age_group DESC, post_year DESC
    """,
}
