"""Single-source-of-truth schemas for the three pipeline entities.

The reference declares explicit StructTypes only on the streaming path
("(Clone) Kinesis Data Stream.py":22-35, 59-65, 88-94) and infers on the
batch path ("(Clone) Pinterest Data Cleaning and Queries.py":44-47).
This engine declares fixed schemas for both paths (no inference pass =
one less full data scan), fixing the reference's age divergence: the
stream declares ``age`` StringType (STREAM:92) while the batch SQL
compares it numerically (BATCH:197) — here ``age`` is IntegerType.

``follower_count`` stays StringType on the RAW schema on purpose: source
values include abbreviated magnitudes ("25k", "1M"); the cleaning layer
rewrites and casts them (see functions/cleaning.py).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# RAW ingestion schemas (wire format: one JSON object per record)
# ---------------------------------------------------------------------------

#: Raw pin posts — 12 fields; cf. STREAM:22-35.
RAW_PIN_SCHEMA = StructType(
    [
        StructField("index", IntegerType()),
        StructField("unique_id", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("poster_name", StringType()),
        StructField("follower_count", StringType()),  # "25k"/"1M"/plain digits
        StructField("tag_list", StringType()),
        StructField("is_image_or_video", StringType()),
        StructField("image_src", StringType()),
        StructField("downloaded", StringType()),
        StructField("save_location", StringType()),
        StructField("category", StringType()),
    ]
)

#: Raw geolocation per post — cf. STREAM:59-65 (timestamp arrives ISO-8601).
RAW_GEO_SCHEMA = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("country", StringType()),
        StructField("latitude", FloatType()),
        StructField("longitude", FloatType()),
        StructField("timestamp", StringType()),  # parsed by cleaning (to_timestamp)
    ]
)

#: Raw user per post — cf. STREAM:88-94; ``age`` fixed to IntegerType (see module doc).
RAW_USER_SCHEMA = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("first_name", StringType()),
        StructField("last_name", StringType()),
        StructField("age", IntegerType()),
        StructField("date_joined", StringType()),  # parsed by cleaning
    ]
)

# ---------------------------------------------------------------------------
# CLEANED schemas (contract of functions/cleaning.py, cf. BATCH:60-103)
# ---------------------------------------------------------------------------

CLEAN_PIN_SCHEMA = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("unique_id", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("follower_count", IntegerType()),
        StructField("poster_name", StringType()),
        StructField("tag_list", StringType()),
        StructField("is_image_or_video", StringType()),
        StructField("image_src", StringType()),
        StructField("save_location", StringType()),
        StructField("category", StringType()),
    ]
)

CLEAN_GEO_SCHEMA = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("country", StringType()),
        StructField("coordinates", ArrayType(FloatType())),
        StructField("timestamp", TimestampType()),
    ]
)

CLEAN_USER_SCHEMA = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("user_name", StringType()),
        StructField("age", IntegerType()),
        StructField("date_joined", TimestampType()),
    ]
)

#: The five sentinel strings the source emits for missing data; cleaning
#: normalizes each to SQL NULL across ALL string columns (whole-row
#: semantics of DataFrame.replace — observable behavior, cf. BATCH:61-65).
PIN_SENTINELS = (
    "User Info Error",
    "Image src error.",
    "Untitled",
    "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e",
    "No Title Data Available",
)
