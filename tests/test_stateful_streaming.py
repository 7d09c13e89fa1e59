"""applyInPandasWithState sessionization: in-batch session closure must
match the batch sessionizer (operators/events.sessionize_events) for
every CLOSED session; the trailing open session per user stays in
state by contract.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from pinterest_data_pipeline6_spark.operators.events import sessionize_events
from pinterest_data_pipeline6_spark.sources.readers import table as read_table
from pinterest_data_pipeline6_spark.streaming.stateful import sessionize_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emitted(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sess")
    ev = read_table(spark, SF, "events").select("user_id", "ts", "value")
    pdf = ev.toPandas()
    src = tmp / "src"
    src.mkdir()
    (src / "part-0.jsonl").write_text(
        pdf.to_json(orient="records", lines=True, date_format="iso", date_unit="us")
    )
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").json(
        str(src)
    )
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("sessions_out").toPandas()


def test_closed_sessions_match_batch_twin(spark, emitted):
    """Emitted sessions == pandas reference sessionization, where a
    session emits if it closed in-batch (a later event passed the gap)
    OR its event-time timeout (last + gap) fell behind the final
    watermark (global max ts - delay)."""
    GAP_US = 30 * 60 * 1_000_000
    DELAY_US = 60 * 60 * 1_000_000
    ev = read_table(spark, SF, "events").select("user_id", "ts", "value").toPandas()
    ev["ts_us"] = ev["ts"].astype("int64") // 1000
    watermark_us = ev["ts_us"].max() - DELAY_US

    expected = []
    for user, g in ev.sort_values("ts_us").groupby("user_id"):
        sessions = []
        start = last = None
        n, sv = 0, 0.0
        for t, v in zip(g["ts_us"], g["value"]):
            if last is not None and t - last > GAP_US:
                sessions.append((user, start, last, n, sv))
                start, n, sv = None, 0, 0.0
            if start is None:
                start = t
            n += 1
            sv += float(v)
            last = t
        trailing = (user, start, last, n, sv)
        expected.extend(sessions)  # closed in-batch
        # trailing session emits only if it timed out under the watermark
        if (last + GAP_US) // 1000 * 1000 < watermark_us:
            expected.append(trailing)

    got = sorted(
        (int(r.user_id), int(r.session_start_us), int(r.session_end_us), int(r.n_events))
        for r in emitted.itertuples()
    )
    want = sorted((u, s, e, n) for u, s, e, n, _ in expected)
    assert got == want

    # and every batch-twin session count is >= the closed count per user
    batch = sessionize_events(spark, SF).toPandas().set_index("user_id")
    closed = emitted.groupby("user_id").size()
    for user, row in batch.iterrows():
        assert closed.get(user, 0) in (row["n_sessions"] - 1, row["n_sessions"]), user


def test_session_invariants(emitted):
    assert (emitted["session_end_us"] >= emitted["session_start_us"]).all()
    assert (emitted["n_events"] >= 1).all()
    # sessions of one user never overlap
    for _, g in emitted.groupby("user_id"):
        g = g.sort_values("session_start_us")
        assert (g["session_start_us"].shift(-1).dropna().values
                > g["session_end_us"].iloc[:-1].values).all()


def _protobuf_available() -> bool:
    """transformWithStateInPandas speaks protobuf to the JVM state
    server; without the protobuf package the driver worker cannot
    start (import-gated per the environment contract — the operator
    itself is fully implemented in streaming/stateful.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture(scope="module")
def tws_result(spark, tmp_path_factory):
    """Run the transformWithStateInPandas accumulator over the events
    fixture split into TWO files with maxFilesPerTrigger=1, so state
    must survive across micro-batches."""
    if not _protobuf_available():
        pytest.skip("protobuf not installed: transformWithStateInPandas needs it")
    from pinterest_data_pipeline6_spark.streaming.stateful import running_user_agg_stream

    tmp = tmp_path_factory.mktemp("tws")
    ev = read_table(spark, SF, "events").select("user_id", "ts", "value")
    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    src = tmp / "src"
    src.mkdir()
    half = len(pdf) // 2
    for i, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        (src / f"part-{i}.jsonl").write_text(
            part.to_json(orient="records", lines=True, date_format="iso", date_unit="us")
        )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema("user_id long, ts timestamp, value double") \
            .option("maxFilesPerTrigger", 1).json(str(src))
        out = running_user_agg_stream(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table("tws_out").toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_tws_final_state_matches_batch_agg(spark, tws_result):
    """The LAST update per user (state after all batches) must equal
    the batch groupBy count/max over the same events."""
    assert len(tws_result) > 0
    final = tws_result.groupby("user_id").last()
    batch = (
        read_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (final["n_events"].sort_index() == batch["n_events"]).all()
    assert (final["max_value"].sort_index() - batch["max_value"]).abs().max() < 1e-9


def test_tws_state_accumulates_across_batches(tws_result):
    """With two input files and maxFilesPerTrigger=1 there are two
    updates for users present in both halves — and counts must be
    strictly increasing (state carried, not reset)."""
    multi = tws_result.groupby("user_id")["n_events"].apply(list)
    two_updates = [v for v in multi if len(v) >= 2]
    assert two_updates, "expected at least one user updated in both micro-batches"
    assert all(a < b for v in two_updates for a, b in zip(v, v[1:]))
