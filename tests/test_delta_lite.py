"""The S6 table contract, actually exercised: atomic commits, overwrite
vs append visibility, time travel, optimistic concurrency, and
exactly-once streaming appends — on the open Delta log format
(delta_lite), with no delta-spark dependency.
"""

from __future__ import annotations

import json

import pytest

from pinterest_data_pipeline6_spark.sources.delta_lite import (
    _log_dir,
    read_delta,
    table_version,
    write_delta,
    write_stream_delta_append,
)


def test_append_accumulates_and_log_grows(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.range(0, 10), t)
    write_delta(spark.range(10, 25), t)
    assert read_delta(spark, t).count() == 25
    assert table_version(t) == 1
    v0 = (_log_dir(t) / f"{0:020d}.json").read_text().splitlines()
    actions = [json.loads(x) for x in v0]
    assert any("protocol" in a for a in actions)
    assert any("metaData" in a for a in actions)


def test_overwrite_replaces_snapshot_but_not_history(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.range(0, 10), t)
    write_delta(spark.range(100, 103), t, mode="overwrite")
    latest = read_delta(spark, t)
    assert latest.count() == 3
    assert latest.agg({"id": "min"}).first()[0] == 100


def test_time_travel_reads_old_version(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.range(0, 10), t)
    write_delta(spark.range(10, 20), t)
    write_delta(spark.range(0, 1), t, mode="overwrite")
    assert read_delta(spark, t, version=0).count() == 10
    assert read_delta(spark, t, version=1).count() == 20
    assert read_delta(spark, t).count() == 1
    with pytest.raises(ValueError, match="version 9"):
        read_delta(spark, t, version=9)


def test_txn_action_makes_append_idempotent(spark, tmp_path):
    t = tmp_path / "t"
    assert write_delta(spark.range(5), t, txn_app="job", txn_version=0) is True
    # replay of the same (app, version): suppressed, no new rows
    assert write_delta(spark.range(5), t, txn_app="job", txn_version=0) is False
    assert read_delta(spark, t).count() == 5
    assert write_delta(spark.range(5), t, txn_app="job", txn_version=1) is True
    assert read_delta(spark, t).count() == 10


def test_optimistic_concurrency_retries_past_taken_version(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.range(5), t)
    # simulate a concurrent writer that already claimed version 1
    squatter = _log_dir(t) / f"{1:020d}.json"
    squatter.write_text(json.dumps({"commitInfo": {"operation": "APPEND"}}) + "\n")
    assert write_delta(spark.range(5, 8), t) is True
    assert table_version(t) == 2  # landed AFTER the squatter, not over it
    assert read_delta(spark, t).count() == 8


def test_empty_snapshot_preserves_schema(spark, tmp_path):
    t = tmp_path / "t"
    df = spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s")
    write_delta(df, t)
    write_delta(spark.createDataFrame([], df.schema), t, mode="overwrite")
    snap = read_delta(spark, t)
    assert snap.count() == 0
    # names+types survive; nullability is parquet-normalized to True
    # (Spark's parquet reader reports every column nullable)
    assert [(f.name, f.dataType) for f in snap.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]


def test_streaming_append_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(30)]
    with open(src / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    t, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = write_stream_delta_append(stream, t, ck, available_now=True)
    q.awaitTermination(120)
    assert read_delta(spark, t).count() == 30
    # crash-replay simulation: re-commit batch 0 directly (the sink's
    # txn guard, not the checkpoint, must suppress the duplicate)
    batch0 = spark.read.schema("doc_id long, text string").json(str(src))
    assert (
        write_delta(batch0, t, txn_app=f"stream-{ck}", txn_version=0) is False
    )
    assert read_delta(spark, t).count() == 30


def test_delta_gate_is_honest_and_read_table_any_routes(spark, tmp_path):
    """delta_available must do a real class load (a py4j attribute probe
    returns a JavaPackage stub and never raises — the round-1 gate was
    always-True), and read_table_any must route format('delta') to the
    delta-lite log reader when delta-spark is absent."""
    from pinterest_data_pipeline6_spark.sources.io import (
        delta_available,
        read_table_any,
    )

    assert delta_available(spark) is False  # no delta-spark in this env
    t = tmp_path / "t"
    write_delta(spark.range(7), t)
    write_delta(spark.range(7, 10), t, mode="overwrite")
    # log-aware read: overwrite means 3 rows, NOT the 10 a naive
    # parquet directory scan of all data files would return
    assert read_table_any(spark, str(t), fmt="delta").count() == 3


def test_vacuum_removes_only_unreferenced_files(spark, tmp_path):
    from pinterest_data_pipeline6_spark.sources.delta_lite import vacuum_delta

    t = tmp_path / "t"
    write_delta(spark.range(10), t)
    write_delta(spark.range(100, 105), t, mode="overwrite")
    n = vacuum_delta(t, keep_versions=1)
    assert n >= 1  # version-0 files gone
    # the retained snapshot is intact...
    assert read_delta(spark, t).count() == 5
    # ...and time travel to the vacuumed version now fails on read
    with pytest.raises(Exception):
        read_delta(spark, t, version=0).count()


def test_merge_upsert_is_atomic_and_time_travelable(spark, tmp_path):
    from pinterest_data_pipeline6_spark.sources.delta_lite import merge_delta

    t = tmp_path / "t"
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    merge_delta(base, t, key="k")
    upd = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    merge_delta(upd, t, key="k")
    rows = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert rows == {1: "a", 2: "B", 3: "c", 4: "d"}
    # the pre-merge snapshot is still reachable
    old = {r["k"]: r["v"] for r in read_delta(spark, t, version=0).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}
    # replay of the same merge batch is suppressed by the txn guard
    assert merge_delta(upd, t, key="k", txn_app="m", txn_version=0) is True
    assert merge_delta(upd, t, key="k", txn_app="m", txn_version=0) is False
