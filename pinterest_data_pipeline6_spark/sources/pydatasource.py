"""Spark 4 Python DataSource: the reference's user-posting emulation
re-expressed as a REGISTERED SPARK SOURCE instead of a driver-side loop.

The reference feeds its pipeline with an infinite single-threaded loop —
sample one MySQL row, HTTP-POST it at the Kinesis/Kafka REST proxy
(user_posting_emulation.py:32-77) — i.e. the data producer lives OUTSIDE
the engine. Spark 4's Python DataSource API lets the same deterministic
payload feed live INSIDE the engine as a first-class format:

    spark.dataSource.register(PayloadDataSource)
    spark.read.format("pin_payloads")
         .option("entity", "pin").option("n_rows", 10_000)
         .option("n_partitions", 32).load()          # batch
    spark.readStream.format("pin_payloads")
         .option("rows_per_batch", 500).load()       # micro-batched

Both emit the SAME wire shape the streaming jobs deserialize
(``value: string`` of one JSON object per record — the Kafka/Kinesis
value column), so the existing `from_json` → clean → sink pipeline
consumes this source unchanged.

Scale design: every row is INDEX-ADDRESSABLE — field values derive from
``Random(seed ⊕ row_index)``, never from a shared sequential RNG — so a
batch partition generates exactly its ``[start, end)`` slice with zero
coordination, N partitions scale the feed linearly, and a retried task
regenerates bit-identical payloads (the same property that makes the
streaming offsets replay-safe: ``readBetweenOffsets`` re-produces any
committed batch exactly). The stream reader tracks a single integer
offset (the next row index) — the moral equivalent of a Kinesis
sequence number — and is capped by ``max_rows`` so `availableNow`
drains terminate.

The sentinel/duplicate quirks mirror fixtures.generate_raw_tables so
every cleaning rule (§2.13) sees exercise from this source too.
"""

from __future__ import annotations

import json
import random
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

from pinterest_data_pipeline6_spark.fixtures import (
    CATEGORIES,
    COUNTRIES,
    FIRST_NAMES,
    LAST_NAMES,
)

SOURCE_NAME = "pin_payloads"
WIRE_SCHEMA = StructType([StructField("value", StringType(), True)])


def _row_rng(seed: int, entity: str, i: int) -> random.Random:
    """Independent per-row RNG — index-addressable, partition-order-free."""
    return random.Random(f"{seed}:{entity}:{i}")


def _payload(entity: str, seed: int, i: int) -> str:
    """Deterministic JSON payload for row index ``i`` (1-based)."""
    rng = _row_rng(seed, entity, i)
    if entity == "pin":
        cat = rng.choice(CATEGORIES)
        title = f"{cat} idea #{i}"
        poster = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        fc = str(rng.randint(0, 999)) if rng.random() < 0.6 else f"{rng.randint(1, 999)}k"
        tags = ",".join(rng.sample(CATEGORIES, 3))
        r = rng.random()
        if r < 0.04:
            title = "No Title Data Available"
        elif r < 0.06:
            title = "Untitled"
        if rng.random() < 0.03:
            poster = "User Info Error"
            fc = "User Info Error"
        if rng.random() < 0.03:
            tags = "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e"
        row = {
            "index": i,
            "unique_id": str(uuid.UUID(int=rng.getrandbits(128))),
            "title": title,
            "description": f"pin description {i} about {cat}",
            "poster_name": poster,
            "follower_count": fc,
            "tag_list": tags,
            "is_image_or_video": rng.choice(
                ["image", "video", "multi-video(story page format)"]
            ),
            "image_src": f"https://i.pinimg.com/{uuid.UUID(int=rng.getrandbits(128))}.jpg",
            "downloaded": rng.choice(["0", "1"]),
            "save_location": f"Local save in /data/{cat}",
            "category": cat,
        }
    elif entity == "geo":
        row = {
            "ind": i,
            "country": rng.choice(COUNTRIES),
            "latitude": round(rng.uniform(-90, 90), 4),
            "longitude": round(rng.uniform(-180, 180), 4),
            "timestamp": (
                f"{rng.randint(2015, 2023)}-{rng.randint(1, 12):02d}-"
                f"{rng.randint(1, 28):02d}T{rng.randint(0, 23):02d}:"
                f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
            ),
        }
    elif entity == "user":
        row = {
            "ind": i,
            "first_name": None if rng.random() < 0.02 else rng.choice(FIRST_NAMES),
            "last_name": rng.choice(LAST_NAMES),
            "age": rng.randint(16, 70),
            "date_joined": (
                f"{rng.randint(2015, 2022)}-{rng.randint(1, 12):02d}-"
                f"{rng.randint(1, 28):02d}T12:00:00"
            ),
        }
    else:  # pragma: no cover — validated in reader()
        raise ValueError(f"unknown entity {entity!r}")
    return json.dumps(row)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class PayloadBatchReader(DataSourceReader):
    """Batch reader: N partitions each generate their [start, end) row
    slice independently (no driver-side materialization, no shared RNG
    cursor — the property that lets 1000 executors produce the feed)."""

    def __init__(self, options: dict):
        self.entity = options.get("entity", "pin")
        if self.entity not in ("pin", "geo", "user"):
            raise ValueError(f"entity must be pin/geo/user, got {self.entity!r}")
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = max(1, int(options.get("n_partitions", 8)))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> list[InputPartition]:
        step = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _Slice(lo + 1, min(lo + step, self.n_rows) + 1)
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (_payload(self.entity, self.seed, i),)


class PayloadStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same feed: the offset is the next
    row index (a Kinesis-sequence-number analogue). ``read`` hands out
    at most ``rows_per_batch`` rows and never past ``max_rows``, so
    ``trigger(availableNow=True)`` drains and terminates;
    ``readBetweenOffsets`` regenerates any committed range bit-exactly
    (failure-recovery replay, ST4)."""

    def __init__(self, options: dict):
        self.entity = options.get("entity", "pin")
        if self.entity not in ("pin", "geo", "user"):
            raise ValueError(f"entity must be pin/geo/user, got {self.entity!r}")
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self) -> dict:
        return {"index": 1}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["index"])
        hi = min(lo + self.rows_per_batch, self.max_rows + 1)
        end = {"index": hi}
        return self.readBetweenOffsets(start, end), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # an ITERATOR over a prebuilt list, not a generator: the harness
        # both calls next() on it and pickles the prefetched records for
        # the executors — list_iterator satisfies both, generators don't
        # pickle
        return iter(
            [
                (_payload(self.entity, self.seed, i),)
                for i in range(int(start["index"]), int(end["index"]))
            ]
        )


class PayloadDataSource(DataSource):
    """``spark.dataSource.register(PayloadDataSource)`` then read/
    readStream ``format("pin_payloads")``."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> StructType:
        return WIRE_SCHEMA

    def reader(self, schema: StructType) -> PayloadBatchReader:
        return PayloadBatchReader(dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> PayloadStreamReader:
        return PayloadStreamReader(dict(self.options))
