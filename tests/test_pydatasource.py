"""Spark 4 Python DataSource (`pin_payloads`): batch partition slicing,
determinism, wire-shape compatibility with the streaming deserializer,
and offset-based micro-batch semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline6_spark.sources.pydatasource import (
    PayloadBatchReader,
    PayloadDataSource,
    PayloadStreamReader,
    _payload,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(PayloadDataSource)


def test_batch_read_counts_and_schema(spark):
    df = (
        spark.read.format("pin_payloads")
        .option("entity", "pin")
        .option("n_rows", 250)
        .option("n_partitions", 7)
        .load()
    )
    assert df.schema.simpleString() == "struct<value:string>"
    assert df.count() == 250
    assert df.rdd.getNumPartitions() == 7


def test_partitions_cover_exactly_once():
    """Slices must tile [1, n_rows] with no gap/overlap for any
    (n_rows, n_partitions) — including non-divisible and n_rows <
    n_partitions shapes."""
    for n_rows, n_parts in ((100, 8), (7, 32), (1, 1), (33, 5)):
        r = PayloadBatchReader(
            {"n_rows": str(n_rows), "n_partitions": str(n_parts)}
        )
        seen = []
        for p in r.partitions():
            seen.extend(range(p.start, p.end))
        assert seen == list(range(1, n_rows + 1)), (n_rows, n_parts)


def test_batch_read_is_deterministic(spark):
    def hashes():
        return (
            spark.read.format("pin_payloads")
            .option("n_rows", 100)
            .load()
            .agg(F.sum(F.xxhash64("value").cast("decimal(38,0)")).alias("h"))
            .first()["h"]
        )

    assert hashes() == hashes()


def test_payloads_parse_through_streaming_schema(spark):
    """The wire shape must flow through the SAME from_json schema the
    Kafka/Kinesis path uses — proving a user can swap this source into
    the existing pipeline unchanged."""
    from pinterest_data_pipeline6_spark.schemas import RAW_PIN_SCHEMA

    df = (
        spark.read.format("pin_payloads")
        .option("entity", "pin")
        .option("n_rows", 200)
        .load()
        .select(F.from_json("value", RAW_PIN_SCHEMA).alias("data"))
        .select("data.*")
    )
    rows = df.collect()
    assert len(rows) == 200
    assert all(r["index"] is not None and r["category"] is not None for r in rows)


def test_all_entities_emit_valid_json():
    for entity, key in (("pin", "index"), ("geo", "ind"), ("user", "ind")):
        row = json.loads(_payload(entity, 42, 17))
        assert row[key] == 17, (entity, row)


def test_unknown_entity_rejected():
    with pytest.raises(ValueError, match="entity"):
        PayloadBatchReader({"entity": "nope"})


def test_stream_offsets_advance_and_cap():
    r = PayloadStreamReader({"rows_per_batch": "40", "max_rows": "100"})
    start = r.initialOffset()
    batches, total = 0, 0
    while True:
        it, end = r.read(start)
        n = sum(1 for _ in it)
        if n == 0:
            break
        total += n
        batches += 1
        start = end
    assert total == 100
    assert batches == 3  # 40 + 40 + 20


def test_stream_replay_is_bit_exact():
    r = PayloadStreamReader({})
    a = list(r.readBetweenOffsets({"index": 5}, {"index": 25}))
    b = list(r.readBetweenOffsets({"index": 5}, {"index": 25}))
    assert a == b and len(a) == 20


def test_readstream_incremental_drain_resumes_from_checkpoint(spark, tmp_path):
    """Each availableNow run drains the reader's prefetched batch and
    commits its offset; restarting from the same checkpoint resumes at
    the committed index (the Kinesis-consumer restart pattern, ST4).
    Three runs drain 50+50+20 = the 120-row cap; a fourth adds nothing."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once():
        q = (
            spark.readStream.format("pin_payloads")
            .option("rows_per_batch", "50")
            .option("max_rows", "120")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).count()

    counts = [run_once() for _ in range(4)]
    assert counts == [50, 100, 120, 120], counts
    # replay safety: the drained rows are exactly payloads 1..120
    vals = [
        json.loads(r["value"])["index"]
        for r in spark.read.parquet(out).collect()
    ]
    assert sorted(vals) == list(range(1, 121))
