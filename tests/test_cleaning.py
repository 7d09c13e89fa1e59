"""Unit tests for each cleaning rule on tiny hand-computed inputs
(SURVEY.md §5.2.2) plus whole-fixture invariants."""

from __future__ import annotations

import pytest

from pinterest_data_pipeline6_spark.functions.cleaning import (
    clean_geo,
    clean_pin,
    clean_user,
    dedup_deterministic,
    normalize_sentinels,
    rewrite_follower_count,
)
from pinterest_data_pipeline6_spark.schemas import (
    CLEAN_GEO_SCHEMA,
    CLEAN_PIN_SCHEMA,
    CLEAN_USER_SCHEMA,
    RAW_GEO_SCHEMA,
    RAW_PIN_SCHEMA,
    RAW_USER_SCHEMA,
)


def _names_types(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def _pin_row(**over):
    base = {
        "index": 1,
        "unique_id": "u-1",
        "title": "a title",
        "description": "a description",
        "poster_name": "Ava Smith",
        "follower_count": "25",
        "tag_list": "art,food",
        "is_image_or_video": "image",
        "image_src": "https://x/y.jpg",
        "downloaded": "1",
        "save_location": "Local save in /data/art",
        "category": "art",
    }
    base.update(over)
    return base


def test_sentinels_null_in_every_string_column(spark):
    # the 'Untitled' sentinel observed in title must also null-out a
    # hypothetical 'Untitled' in poster_name (whole-row replace semantics)
    rows = [_pin_row(title="Untitled", poster_name="Untitled", description="d1")]
    df = spark.createDataFrame(rows, schema=RAW_PIN_SCHEMA)
    out = normalize_sentinels(df).first()
    assert out["title"] is None and out["poster_name"] is None
    assert out["description"] == "d1"


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("25", 25),
        ("25k", 25000),
        ("811k", 811000),
        ("1M", 1000000),
        ("2M", 2000000),
        ("942000", 942000),
        ("k2k", 2000),  # unanchored global replace -> "0002000" -> 2000
        ("User Info Error", None),  # non-numeric -> NULL after cast
        (None, None),
    ],
)
def test_follower_count_rewrite(spark, raw, expected):
    df = spark.createDataFrame([{"follower_count": raw}], "follower_count string")
    assert rewrite_follower_count(df).first()["follower_count"] == expected


def test_clean_pin_schema_and_rules(spark):
    rows = [
        _pin_row(index=1, description="d1", follower_count="811k",
                 save_location="Local save in /data/art"),
        _pin_row(index=2, description="d1", follower_count="1M"),  # dup description
        _pin_row(index=3, description="d3", title="No Title Data Available",
                 follower_count="User Info Error"),
    ]
    df = spark.createDataFrame(rows, schema=RAW_PIN_SCHEMA)
    out = clean_pin(df, deterministic=True)
    assert _names_types(out.schema) == _names_types(CLEAN_PIN_SCHEMA)
    got = {r["ind"]: r for r in out.collect()}
    assert set(got) == {1, 3}  # dedup on description kept first by (ind)
    assert got[1]["follower_count"] == 811000
    assert got[1]["save_location"] == " /data/art"  # prefix strip keeps leading space
    assert got[3]["title"] is None and got[3]["follower_count"] is None
    assert "downloaded" not in out.columns


def test_clean_geo(spark):
    rows = [
        {"ind": 1, "country": "Chile", "latitude": 10.5, "longitude": -20.25,
         "timestamp": "2020-05-17T10:53:17"},
        {"ind": 1, "country": "Peru", "latitude": 1.0, "longitude": 2.0,
         "timestamp": "2021-01-01T00:00:00"},  # dup ind
    ]
    df = spark.createDataFrame(rows, schema=RAW_GEO_SCHEMA)
    out = clean_geo(df, deterministic=True)
    assert _names_types(out.schema) == _names_types(CLEAN_GEO_SCHEMA)
    r = out.first()
    assert out.count() == 1
    assert r["coordinates"] == [10.5, -20.25]
    assert r["timestamp"].year == 2020 and r["timestamp"].minute == 53


def test_clean_user_null_propagating_concat(spark):
    rows = [
        {"ind": 1, "first_name": "Ava", "last_name": "Smith", "age": 22,
         "date_joined": "2019-03-04T12:00:00"},
        {"ind": 2, "first_name": None, "last_name": "Kim", "age": 40,
         "date_joined": "2020-03-04T12:00:00"},
    ]
    df = spark.createDataFrame(rows, schema=RAW_USER_SCHEMA)
    out = clean_user(df, deterministic=True)
    assert _names_types(out.schema) == _names_types(CLEAN_USER_SCHEMA)
    got = {r["ind"]: r for r in out.collect()}
    assert got[1]["user_name"] == "Ava Smith"
    assert got[2]["user_name"] is None  # concat propagates NULL
    assert got[1]["date_joined"].year == 2019


def test_dedup_deterministic_keeps_min(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("b", 2)], "k string, v int"
    )
    out = dedup_deterministic(df, ["k"], ["v"])
    assert {(r["k"], r["v"]) for r in out.collect()} == {("a", 1), ("b", 2)}


def test_fixture_cleaning_invariants(spark, fixture_dir):
    from pinterest_data_pipeline6_spark.sources.readers import register_cleaned_views

    views = register_cleaned_views(
        spark,
        str(fixture_dir / "raw_pin.parquet"),
        str(fixture_dir / "raw_geo.parquet"),
        str(fixture_dir / "raw_user.parquet"),
    )
    pin, geo, user = views["pin_table"], views["geo_table"], views["user_table"]
    # dedup keys unique after cleaning
    assert pin.groupBy("description").count().filter("count > 1").count() == 0
    assert geo.groupBy("ind").count().filter("count > 1").count() == 0
    assert user.groupBy("ind").count().filter("count > 1").count() == 0
    # no sentinel strings survive anywhere
    from pinterest_data_pipeline6_spark.schemas import PIN_SENTINELS

    for c in ("title", "description", "poster_name", "tag_list", "image_src"):
        assert pin.filter(pin[c].isin(*PIN_SENTINELS)).count() == 0
    # follower_count fully numeric (int type)
    assert dict(pin.dtypes)["follower_count"] == "int"
