"""Catalyst-native cleaning operators for the three pipeline entities.

Pure ``DataFrame -> DataFrame`` functions composed from built-in
``pyspark.sql.functions`` only — no Python UDFs, so every rule stays
inside whole-stage codegen and is free to run on 100 TB. Semantics
reproduce the reference cleaners exactly, including their quirks
(SURVEY.md §2.13):

- sentinel->NULL applies to EVERY string column, not just the column a
  sentinel was observed in (parity with ``DataFrame.replace``;
  reference: "(Clone) Pinterest Data Cleaning and Queries.py":61-65);
- the follower-count rewrite is an unanchored global substitution
  ("k"->"000", "M"->"000000"), so "k2k" -> "0002000" (BATCH:66-67);
- ``save_location`` strips the literal prefix "Local save in", leaving
  the leading space (BATCH:69);
- keyed dedup keeps an ARBITRARY row per key (BATCH:73,87,97); a
  deterministic variant is provided for reproducible pipelines.

Each composed cleaner (`clean_pin`/`clean_geo`/`clean_user`) works
unchanged on batch AND streaming DataFrames — batch/stream parity is a
property of the reference design (STREAM:117-163 reuses the batch
cleaners verbatim) that this engine keeps by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from pinterest_data_pipeline6_spark.schemas import PIN_SENTINELS

# ---------------------------------------------------------------------------
# Reusable rules (P1-P9, F1-F8 in SURVEY.md §2)
# ---------------------------------------------------------------------------


def normalize_sentinels(df: DataFrame, sentinels: Sequence[str] = PIN_SENTINELS) -> DataFrame:
    """P5: rewrite each sentinel string to NULL in every string column.

    Expressed as a single ``select`` of ``CASE WHEN col IN (...) THEN NULL``
    over the string columns — one Catalyst projection instead of five
    sequential ``replace`` passes, same observable result (BATCH:61-65).
    """
    if not sentinels:
        return df
    sentinel_lits = [F.lit(s) for s in sentinels]
    cols: list[Column] = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, StringType):
            c = F.when(F.col(field.name).isin(*sentinel_lits), F.lit(None)).otherwise(c)
        cols.append(c.alias(field.name))
    return df.select(*cols)


def rewrite_follower_count(df: DataFrame, col: str = "follower_count") -> DataFrame:
    """F1-F3: expand "k"/"M" magnitude suffixes then cast to int.

    Unanchored global replace on purpose ("25k"->"25000", "1M"->"1000000",
    hypothetical "k2k"->"0002000"); any remaining non-numeric string casts to NULL.
    Parity: BATCH:66-68.
    """
    expanded = F.regexp_replace(F.regexp_replace(F.col(col), "k", "000"), "M", "000000")
    # try_cast: ANSI-mode-safe NULL-on-malformed (the reference ran pre-ANSI
    # Spark where plain cast returned NULL for non-numeric strings)
    return df.withColumn(col, expanded.try_cast("int"))


def strip_prefix(df: DataFrame, col: str, prefix: str) -> DataFrame:
    """F2: remove a literal prefix substring (global, unanchored — parity
    with the reference's ``regexp_replace(col, "Local save in", "")``,
    BATCH:69, which leaves the leading space)."""
    return df.withColumn(col, F.regexp_replace(F.col(col), prefix, ""))


def dedup_arbitrary(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """P9: keyed dedup keeping an arbitrary row per key (reference
    semantics, BATCH:73). One hash-shuffle on the key; AQE handles skew.
    """
    return df.dropDuplicates(list(keys))


def dedup_deterministic(df: DataFrame, keys: Sequence[str], order_by: Sequence[str]) -> DataFrame:
    """Deterministic keyed dedup: keep the first row per key under a total
    order. Same single shuffle as ``dropDuplicates`` (window partitionBy
    = one exchange on the key), but reproducible — the variant a 100 TB
    pipeline should use so reruns/retries are idempotent.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Composed entity cleaners (batch AND streaming)
# ---------------------------------------------------------------------------

_PIN_COLUMNS = (
    "ind",
    "unique_id",
    "title",
    "description",
    "follower_count",
    "poster_name",
    "tag_list",
    "is_image_or_video",
    "image_src",
    "save_location",
    "category",
)


def clean_pin(df: DataFrame, deterministic: bool = False) -> DataFrame:
    """Clean raw pin posts. Parity: BATCH:60-74 / STREAM:117-132.

    sentinel->NULL, follower-count rewrite+cast, save_location prefix
    strip, index->ind rename, drop ``downloaded``, fixed projection,
    dedup on ``description``.
    """
    out = normalize_sentinels(df)
    out = rewrite_follower_count(out)
    out = strip_prefix(out, "save_location", "Local save in")
    out = out.withColumnRenamed("index", "ind")
    out = out.drop("downloaded").select(*_PIN_COLUMNS)
    if deterministic:
        return dedup_deterministic(out, ["description"], ["ind", "unique_id"])
    return dedup_arbitrary(out, ["description"])


def clean_geo(df: DataFrame, deterministic: bool = False) -> DataFrame:
    """Clean raw geolocation rows. Parity: BATCH:82-88 / STREAM:139-146.

    Packs (latitude, longitude) into a ``coordinates`` array<float>,
    parses the ISO-8601 timestamp, dedups on ``ind``.
    """
    out = (
        df.withColumn("coordinates", F.array("latitude", "longitude"))
        .drop("latitude", "longitude")
        .select("ind", "country", "coordinates", "timestamp")
        .withColumn("timestamp", F.to_timestamp("timestamp"))
    )
    if deterministic:
        return dedup_deterministic(out, ["ind"], ["timestamp", "country"])
    return dedup_arbitrary(out, ["ind"])


def clean_user(df: DataFrame, deterministic: bool = False) -> DataFrame:
    """Clean raw user rows. Parity: BATCH:95-101 / STREAM:153-160.

    ``user_name = concat(first_name, ' ', last_name)`` (NULL-propagating,
    as ``F.concat`` is), dedup on ``ind``, parse ``date_joined``.
    """
    out = df.withColumn("user_name", F.concat("first_name", F.lit(" "), "last_name"))
    if deterministic:
        out = dedup_deterministic(out, ["ind"], ["date_joined", "user_name"])
    else:
        out = dedup_arbitrary(out, ["ind"])
    return (
        out.drop("first_name", "last_name")
        .withColumn("date_joined", F.to_timestamp("date_joined"))
        .select("ind", "user_name", "age", "date_joined")
    )
