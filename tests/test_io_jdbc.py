"""S7 JDBC source: real round-trips against Derby embedded (the JDBC
engine Spark already ships for the Hive metastore — no extra jars), plus
the Kafka option-translation surface (no broker needed).
"""

from __future__ import annotations

import pytest

from pinterest_data_pipeline6_spark.sources.io import read_jdbc
from pinterest_data_pipeline6_spark.streaming.jobs import kafka_source_options


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("derby")
    url = f"jdbc:derby:{tmp}/db;create=true"
    (
        spark.range(0, 100)
        .selectExpr("id", "id * 2 AS twice", "CAST(id % 5 AS STRING) AS grp")
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "t1")
        .save()
    )
    return url


def test_jdbc_roundtrip(spark, derby_url):
    back = read_jdbc(spark, derby_url, table="t1")
    assert back.count() == 100
    assert sorted(back.columns) == ["grp", "id", "twice"]
    assert back.agg({"twice": "max"}).first()[0] == 198


def test_jdbc_partitioned_read_parallelizes(spark, derby_url):
    part = read_jdbc(
        spark,
        derby_url,
        table="t1",
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert part.count() == 100  # stride predicates cover, don't filter
    assert part.rdd.getNumPartitions() == 4


def test_jdbc_query_pushdown(spark, derby_url):
    # quoted identifiers: Spark writes case-sensitive lowercase names,
    # and Derby (like most engines) upper-cases unquoted identifiers.
    # The VARCHAR cast is a Derby-ism: Spark maps StringType to CLOB,
    # which Derby refuses to GROUP BY.
    rows = read_jdbc(
        spark,
        derby_url,
        query=(
            'SELECT CAST("grp" AS VARCHAR(8)) AS "g", COUNT(*) AS "n" '
            'FROM t1 GROUP BY CAST("grp" AS VARCHAR(8))'
        ),
    ).collect()
    assert len(rows) == 5
    assert all(r["n"] == 20 for r in rows)


def test_jdbc_argument_validation(spark):
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, "jdbc:derby:memory:x", table="t", query="SELECT 1")
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, "jdbc:derby:memory:x")
    with pytest.raises(ValueError, match="partitioned"):
        read_jdbc(spark, "jdbc:derby:memory:x", table="t", partition_column="id")


def test_kafka_option_translation():
    opts = kafka_source_options(
        topic="pin-events",
        bootstrap_servers="broker1:9092,broker2:9092",
        starting_offsets="earliest",
        max_offsets_per_trigger=50_000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "pin-events",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "50000",
    }
    # ST4 replay default: earliest, mirroring initialPosition='earliest'
    assert kafka_source_options("t", "b:9092")["startingOffsets"] == "earliest"


def test_kafka_source_rejects_unknown_source(spark):
    from pinterest_data_pipeline6_spark.streaming.jobs import read_payload_stream

    with pytest.raises(ValueError, match="unknown source"):
        read_payload_stream(spark, "pin", "/tmp/none", source="kinesis")
