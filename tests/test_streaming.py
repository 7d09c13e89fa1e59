"""Streaming-path tests: deserialization contract, batch/stream parity
(the reference reuses batch cleaners on streams — STREAM:117-163),
watermarked dedup, windowed aggregation, full 3-stream pipeline.

All tests use the file source + availableNow trigger (process all
existing input then stop) — ST4's earliest-replay contract.
"""

from __future__ import annotations

import pytest

from pinterest_data_pipeline6_spark import fixtures
from pinterest_data_pipeline6_spark.functions.cleaning import clean_geo, clean_pin, clean_user
from pinterest_data_pipeline6_spark.sources.readers import read_raw_parquet
from pinterest_data_pipeline6_spark.streaming import (
    clean_stream,
    read_payload_stream,
    run_streaming_pipeline,
    watermarked_geo_dedup,
    windowed_event_counts,
    write_append,
)
from pinterest_data_pipeline6_spark.streaming.jobs import (
    session_window_counts,
    stream_stream_join,
)
from tests.conftest import df_to_sorted_rows


@pytest.fixture(scope="module")
def stream_src(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    return fixtures.write_fixtures_jsonl(d, n_rows=400, seed=11, dedup_safe=True)


@pytest.fixture(scope="module")
def batch_src(tmp_path_factory):
    d = tmp_path_factory.mktemp("batch_src")
    return fixtures.write_fixtures(d, n_rows=400, seed=11, dedup_safe=True)


def _run_to_table(spark, df, root, name):
    q = write_append(df, path=f"{root}/{name}", checkpoint=f"{root}/_ck/{name}")
    q.awaitTermination()
    return spark.read.parquet(f"{root}/{name}")


def test_deserialization_contract(spark, stream_src):
    """Payload string -> from_json(schema) -> data.* yields the declared
    raw schema (ST1)."""
    stream = read_payload_stream(spark, "pin", stream_src["pin"])
    assert stream.isStreaming
    names = [f.name for f in stream.schema.fields]
    assert names[:3] == ["index", "unique_id", "title"]


@pytest.mark.parametrize("entity", ["pin", "geo", "user"])
def test_batch_stream_parity(spark, stream_src, batch_src, entity, tmp_path):
    """The same cleaner over the same rows gives identical results on
    the batch and streaming paths (dedup-safe fixtures so the
    arbitrary-row dedup cannot diverge)."""
    cleaner = {"pin": clean_pin, "geo": clean_geo, "user": clean_user}[entity]
    batch = cleaner(
        read_raw_parquet(spark, entity, batch_src[f"raw_{entity}"]), deterministic=False
    )
    stream = clean_stream(entity, read_payload_stream(spark, entity, stream_src[entity]))
    sunk = _run_to_table(spark, stream, str(tmp_path), f"{entity}_table")
    assert df_to_sorted_rows(sunk) == df_to_sorted_rows(batch)


def test_watermarked_geo_dedup(spark, stream_src, tmp_path):
    """Robust mode: dropDuplicatesWithinWatermark keeps one row per ind
    (single micro-batch => same keyset as reference-mode dedup)."""
    stream = read_payload_stream(spark, "geo", stream_src["geo"])
    deduped = watermarked_geo_dedup(stream)
    sunk = _run_to_table(spark, deduped, str(tmp_path), "geo_wm")
    inds = [r["ind"] for r in sunk.select("ind").collect()]
    assert len(inds) == len(set(inds)) > 0


def test_windowed_event_counts(spark, tmp_path):
    """Streaming tumbling-window agg matches the batch groupBy twin on
    the same bounded input. Complete-mode memory sink: append mode only
    emits a closed window on a LATER micro-batch, which an availableNow
    run over one file never executes."""
    from pinterest_data_pipeline6_spark.sources.readers import table as read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    src = tmp_path / "events_src"
    src.mkdir()
    pdf = ev.select("ts", "event_type", "value").toPandas()
    (src / "part-0.jsonl").write_text(
        pdf.to_json(orient="records", lines=True, date_format="iso", date_unit="us")
    )

    schema = "ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).json(str(src))
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_hourly")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sunk = spark.table("ev_hourly")

    batch = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
    )
    assert df_to_sorted_rows(sunk) == df_to_sorted_rows(batch)


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """sf0.001 events as a JSON-lines dir usable as a file-stream source."""
    from pinterest_data_pipeline6_spark.sources.readers import table as read_table

    src = tmp_path_factory.mktemp("events_stream")
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    pdf = ev.select("event_id", "ts", "user_id", "event_type", "value").toPandas()
    (src / "part-0.jsonl").write_text(
        pdf.to_json(orient="records", lines=True, date_format="iso", date_unit="us")
    )
    return str(src)


_EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def test_session_window_counts_parity(spark, events_stream_dir):
    """Native session_window streaming agg == the same function run in
    batch mode on the same bounded input (complete-mode memory sink for
    the same reason as the tumbling test)."""
    stream = spark.readStream.schema(_EV_SCHEMA).json(events_stream_dir)
    q = (
        session_window_counts(stream)
        .writeStream.format("memory")
        .queryName("ev_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sunk = spark.table("ev_sessions")
    batch = session_window_counts(spark.read.schema(_EV_SCHEMA).json(events_stream_dir))
    assert df_to_sorted_rows(sunk) == df_to_sorted_rows(batch)
    assert sunk.count() > 0


def test_stream_stream_join_parity(spark, events_stream_dir):
    """Watermarked interval stream-stream join emits exactly the pairs
    the equivalent batch join produces on the same bounded input."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(_EV_SCHEMA).json(events_stream_dir)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    q = (
        stream_stream_join(clicks, purchases)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sunk = spark.table("ss_join")

    batch_ev = spark.read.schema(_EV_SCHEMA).json(events_stream_dir)
    batch = stream_stream_join(
        batch_ev.filter(F.col("event_type") == "click"),
        batch_ev.filter(F.col("event_type") == "purchase"),
    )
    assert df_to_sorted_rows(sunk) == df_to_sorted_rows(batch)
    assert sunk.count() > 0


def test_stream_static_enrich_parity(spark, events_stream_dir):
    """Stream-static broadcast enrichment joins each micro-batch against
    a bounded dimension; result equals the same join run in batch, and
    unmatched stream rows survive (left join)."""
    from pyspark.sql import functions as F

    from pinterest_data_pipeline6_spark.streaming.jobs import enrich_with_static

    # dimension: even user_ids only, so odd-user events test the left side
    dim = (
        spark.read.schema(_EV_SCHEMA)
        .json(events_stream_dir)
        .select("user_id")
        .distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("tier", F.when(F.col("user_id") % 4 == 0, "gold").otherwise("basic"))
    )
    stream = spark.readStream.schema(_EV_SCHEMA).json(events_stream_dir)
    q = (
        enrich_with_static(stream, dim, "user_id", ("tier",))
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sunk = spark.table("enriched")
    batch = enrich_with_static(
        spark.read.schema(_EV_SCHEMA).json(events_stream_dir), dim, "user_id", ("tier",)
    )
    assert df_to_sorted_rows(sunk) == df_to_sorted_rows(batch)
    assert sunk.filter("tier IS NULL").count() > 0  # left join kept odd users
    assert sunk.count() == batch.count()


def test_foreach_batch_upsert(spark, tmp_path):
    """foreachBatch merge sink: run 1 seeds the table; run 2 (same
    checkpoint, new source file with overlapping keys) upserts — the
    final table keeps exactly one row per key with the LAST value."""
    from pinterest_data_pipeline6_spark.streaming.jobs import write_foreach_batch_upsert

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "table")
    ck = str(tmp_path / "ck")
    (src / "a.jsonl").write_text(
        '{"event_id": 1, "value": 10.0}\n{"event_id": 2, "value": 20.0}\n'
    )
    schema = "event_id long, value double"

    def run_once():
        stream = spark.readStream.schema(schema).json(str(src))
        q = write_foreach_batch_upsert(stream, sink, ck, key="event_id")
        q.awaitTermination()

    run_once()
    first = {r["event_id"]: r["value"] for r in spark.read.parquet(sink).collect()}
    assert first == {1: 10.0, 2: 20.0}

    (src / "b.jsonl").write_text(
        '{"event_id": 2, "value": 99.0}\n{"event_id": 3, "value": 30.0}\n'
    )
    run_once()
    final = {r["event_id"]: r["value"] for r in spark.read.parquet(sink).collect()}
    assert final == {1: 10.0, 2: 99.0, 3: 30.0}


def test_full_pipeline(spark, stream_src, tmp_path):
    """Three payload streams -> clean -> three append tables (the
    STREAM:174-192 notebook analog)."""
    queries = run_streaming_pipeline(spark, stream_src, str(tmp_path))
    for q in queries.values():
        q.awaitTermination()
    for entity, n_cols in (("pin", 11), ("geo", 4), ("user", 4)):
        out = spark.read.parquet(f"{tmp_path}/{entity}_table")
        assert out.count() > 0
        assert len(out.columns) == n_cols


def test_foreach_batch_incremental_dedup(spark, tmp_path):
    """Cross-batch exact dedup: two micro-batches with overlapping
    documents -> the sink holds each distinct text exactly once, and
    batch-2 rows that duplicate batch-1 content never land."""
    from pinterest_data_pipeline6_spark.streaming.jobs import write_foreach_batch_dedup

    src = tmp_path / "src"
    src.mkdir()
    rows1 = [{"doc_id": i, "text": f"doc number {i % 5}"} for i in range(10)]
    rows2 = [{"doc_id": 100 + i, "text": f"doc number {i % 8}"} for i in range(16)]
    import json as _json

    (src / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows1))
    (src / "b2.jsonl").write_text("\n".join(_json.dumps(r) for r in rows2))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = tmp_path / "sink"
    q = write_foreach_batch_dedup(
        stream, str(out), str(tmp_path / "ck"), digest_cols=("text",)
    )
    q.awaitTermination()

    sunk = spark.read.parquet(str(out))
    texts = [r.text for r in sunk.select("text").collect()]
    assert sorted(texts) == sorted(set(texts)), "duplicate content reached the sink"
    # 8 distinct texts exist across both batches ("doc number 0..7")
    assert len(texts) == 8


def test_streaming_query_listener_observes_progress(spark, tmp_path):
    """StreamingQueryListener surfaces per-batch metrics (numInputRows)
    — the streaming twin of observe()-based batch quality metrics."""
    from pyspark.sql.streaming import StreamingQueryListener

    progress = []

    class Collect(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progress.append(event.progress.numInputRows)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = Collect()
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "src"
        src.mkdir()
        (src / "a.jsonl").write_text('{"k": 1}\n{"k": 2}\n')
        stream = spark.readStream.schema("k long").json(str(src))
        q = (
            stream.groupBy("k").count()
            .writeStream.format("memory").queryName("listener_out")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        deadline = __import__("time").time() + 20
        while not progress and __import__("time").time() < deadline:
            __import__("time").sleep(0.5)
        assert sum(progress) == 2
    finally:
        spark.streams.removeListener(listener)


def test_foreach_batch_neardup_suppression(spark, tmp_path):
    """Streaming LSH near-dup sink: run 1 accepts the seed corpus;
    run 2 (same checkpoint/state, new file) must suppress near-copies
    of accepted docs (one word changed) and accept genuinely new ones."""
    import json

    from pinterest_data_pipeline6_spark.streaming.jobs import write_foreach_batch_neardup

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "accepted")
    bands = str(tmp_path / "bands")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    fresh = "completely different sentence about spark engines crunching massive parquet tables quickly"
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": base}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": fresh}) + "\n")

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = write_foreach_batch_neardup(stream, sink, ck, bands)
        q.awaitTermination()

    run()
    assert sorted(r[0] for r in spark.read.parquet(sink).select("doc_id").collect()) == [1, 2]

    near_copy = base.replace("today", "tonight")  # most shingles shared
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"doc_id": 3, "text": near_copy}) + "\n")
        f.write(json.dumps({"doc_id": 4, "text": "tiny"}) + "\n")  # bandless: accepted
        f.write(
            json.dumps(
                {
                    "doc_id": 5,
                    "text": "another unrelated paragraph mentioning gradient descent optimizers and tokenizer vocabularies",
                }
            )
            + "\n"
        )
    run()
    got = sorted(r[0] for r in spark.read.parquet(sink).select("doc_id").collect())
    assert 3 not in got, got  # near-copy of accepted doc 1 suppressed
    assert got == [1, 2, 4, 5], got


def test_run_streaming_curation(spark, tmp_path):
    """Classifier-gated streaming curation: heuristic-fail docs and
    classifier-fail docs are gated map-side (and ledgered per batch),
    exact duplicates and near-duplicates of accepted docs are
    suppressed across micro-batch runs, fresh passing docs land, and
    the gate decision matches the batch ``classifier_total_milli``
    expression exactly."""
    import json

    from pyspark.sql import functions as F

    from pinterest_data_pipeline6_spark.streaming.jobs import run_streaming_curation

    src = tmp_path / "docs_src"
    src.mkdir()
    root = str(tmp_path / "curated")

    # 17 distinct words, every one hashing to a POSITIVE classifier
    # bucket weight (total +10983 milli) — passes both gates
    pos = (
        "gold desert crane valley falcon forest wolf river glacier "
        "ocean heron stone tundra lynx canyon eagle yellow"
    )
    # 20 distinct words, classifier total -367 — passes the heuristic
    # gate but FAILS the classifier gate
    clf_fail = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    low_quality = "spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam"
    rows = [
        {"doc_id": 1, "text": pos, "lang": "en", "source": "s0", "n_chars": len(pos)},
        {"doc_id": 2, "text": low_quality, "lang": "en", "source": "s0", "n_chars": len(low_quality)},
        {"doc_id": 6, "text": clf_fail, "lang": "en", "source": "s0", "n_chars": len(clf_fail)},
    ]
    with open(src / "b1.json", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows)
    run_streaming_curation(spark, str(src), root).awaitTermination()
    got1 = sorted(r[0] for r in spark.read.parquet(f"{root}/accepted").select("doc_id").collect())
    assert got1 == [1], got1  # both gate failures dropped before any state

    # gate decisions must equal the shared batch expression
    from pinterest_data_pipeline6_spark.operators.scoring import (
        classifier_total_milli,
    )

    want_clf = {
        r["doc_id"]: r["ok"]
        for r in spark.createDataFrame(
            [(r["doc_id"], r["text"].lower().strip()) for r in rows],
            "doc_id long, norm string",
        )
        .select("doc_id", (classifier_total_milli(F.col("norm")) > 0).alias("ok"))
        .collect()
    }
    assert want_clf == {1: True, 2: False, 6: False}

    pos_reordered = " ".join(reversed(pos.split(" ")))  # fresh: no shared shingles
    rows2 = [
        {"doc_id": 3, "text": pos.upper(), "lang": "en", "source": "s1", "n_chars": len(pos)},  # exact dup after normalize
        {"doc_id": 4, "text": pos + " quartz", "lang": "en", "source": "s1", "n_chars": len(pos) + 7},  # near-dup (superset)
        {"doc_id": 5, "text": pos_reordered, "lang": "en", "source": "s1", "n_chars": len(pos_reordered)},  # fresh
    ]
    with open(src / "b2.json", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows2)
    run_streaming_curation(spark, str(src), root).awaitTermination()
    got2 = sorted(r[0] for r in spark.read.parquet(f"{root}/accepted").select("doc_id").collect())
    assert got2 == [1, 5], got2

    # the gate ledger has one row per micro-batch with exact counts
    ledger = {
        r["batch_id"]: (
            r["n_raw"], r["n_fail_heuristic"],
            r["n_fail_classifier"], r["n_gate_pass"],
        )
        for r in spark.read.parquet(f"{root}/gate_ledger").collect()
    }
    assert ledger[0] == (3, 1, 1, 1), ledger
    assert ledger[1] == (3, 0, 0, 3), ledger

    # replay idempotence: re-delivering an accepted doc (new file, same
    # content) is suppressed by the band state, and the ledger stays
    # one-row-per-batch
    with open(src / "b3.json", "w") as f:
        f.write(json.dumps({"doc_id": 7, "text": pos_reordered, "lang": "en",
                            "source": "s2", "n_chars": len(pos_reordered)}) + "\n")
    run_streaming_curation(spark, str(src), root).awaitTermination()
    got3 = sorted(r[0] for r in spark.read.parquet(f"{root}/accepted").select("doc_id").collect())
    assert got3 == [1, 5], got3
    ledger3 = spark.read.parquet(f"{root}/gate_ledger")
    assert ledger3.count() == 3
    assert ledger3.groupBy("batch_id").count().filter("count > 1").count() == 0


def test_stream_shard_router_matches_batch_layout(spark, tmp_path):
    """write_stream_shards must land every doc in the same shard dir the
    batch writer would pick (content-stable assignment), with append-mode
    exactly-once file tracking."""
    import json

    from pinterest_data_pipeline6_spark.operators.curation import (
        export_shard_histogram,
    )
    from pinterest_data_pipeline6_spark.streaming.jobs import write_stream_shards

    sf = "/root/testdata/sf0.001"
    src = tmp_path / "docs_in"
    src.mkdir()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    rows = [r.asDict() for r in docs.collect()]
    with open(src / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = spark.readStream.schema(schema).json(str(src))
    q = write_stream_shards(
        stream, str(tmp_path / "out"), str(tmp_path / "ck"), available_now=True
    )
    q.awaitTermination(120)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == len(rows)
    hist = {r["shard"]: r["n_docs"] for r in export_shard_histogram(spark, sf).collect()}
    written = {r["shard"]: r["count"] for r in back.groupBy("shard").count().collect()}
    assert written == hist


def test_dedup_sink_replay_with_fresh_checkpoint_is_idempotent(spark, tmp_path):
    """At-least-once replay simulation: processing the SAME payloads a
    second time through a FRESH checkpoint (so every batch re-fires)
    must not duplicate sink rows — the sink's digest anti-join, not the
    checkpoint, carries the exactly-once guarantee."""
    import json

    from pinterest_data_pipeline6_spark.streaming.jobs import (
        read_payload_stream,
        write_foreach_batch_dedup,
    )

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"index": i, "unique_id": f"u{i % 7}", "title": f"t{i}", "description": "d",
         "poster_name": "p", "follower_count": "10", "tag_list": "a",
         "is_image_or_video": "image", "image_src": "s", "downloaded": 1,
         "save_location": "Local save in /x", "category": "c"}
        for i in range(20)
    ]
    with open(src / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = str(tmp_path / "out")
    for ck in ("ck1", "ck2"):  # second run = full replay, fresh offsets
        df = read_payload_stream(spark, "pin", str(src))
        q = write_foreach_batch_dedup(df, out, str(tmp_path / ck), ("unique_id",))
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == 7


def test_foreach_batch_dq_gate_routes_and_accounts(spark, tmp_path):
    """Streaming DQ gate: violating rows land in quarantine tagged with
    the rules they broke, clean rows in accepted, and the metrics
    ledger carries per-batch per-rule violation counts. A replayed
    batch overwrites its own partition (no double-append)."""
    import json as _json

    from pyspark.sql import functions as F

    from pinterest_data_pipeline6_spark.streaming.jobs import (
        write_foreach_batch_dq_gate,
    )

    src = tmp_path / "src"
    src.mkdir()
    rows1 = [
        {"doc_id": 1, "text": "ok row", "score": 0.5},
        {"doc_id": 2, "text": "", "score": 0.7},          # violates nonempty
        {"doc_id": 3, "text": "bad score", "score": 1.8},  # violates range
        {"doc_id": 4, "text": "", "score": -1.0},          # violates both
    ]
    rows2 = [{"doc_id": 5, "text": "fine", "score": 0.1}]
    (src / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows1))
    (src / "b2.jsonl").write_text("\n".join(_json.dumps(r) for r in rows2))

    stream = (
        spark.readStream.schema("doc_id long, text string, score double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    rules = {
        "nonempty": F.length("text") > 0,
        "score_range": (F.col("score") >= 0) & (F.col("score") <= 1),
    }
    paths = {k: str(tmp_path / k) for k in ("acc", "quar", "metrics")}
    q = write_foreach_batch_dq_gate(
        stream, paths["acc"], paths["quar"], paths["metrics"],
        str(tmp_path / "ck"), rules,
    )
    q.awaitTermination()

    acc = spark.read.parquet(paths["acc"])
    assert sorted(r.doc_id for r in acc.collect()) == [1, 5]
    quar = {r.doc_id: r.violated for r in spark.read.parquet(paths["quar"]).collect()}
    assert quar[2] == "nonempty"
    assert quar[3] == "score_range"
    assert quar[4] == "nonempty,score_range"
    m = {r.batch_id: r for r in spark.read.parquet(paths["metrics"]).collect()}
    b1 = m[0]
    assert (b1.n_in, b1.n_accepted, b1.n_quarantined) == (4, 1, 3)
    assert (b1.v_nonempty, b1.v_score_range) == (2, 2)

    # replay batch 1's data through a fresh stream over the same sinks:
    # dynamic partition overwrite must leave one copy per batch_id
    stream2 = (
        spark.readStream.schema("doc_id long, text string, score double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q2 = write_foreach_batch_dq_gate(
        stream2, paths["acc"], paths["quar"], paths["metrics"],
        str(tmp_path / "ck2"), rules,
    )
    q2.awaitTermination()
    acc2 = spark.read.parquet(paths["acc"])
    assert sorted(r.doc_id for r in acc2.collect()) == [1, 5]


def test_foreach_batch_trending_topk(spark, tmp_path):
    """Trending sink: the snapshot holds the top-k event types per
    window with counts merged ACROSS micro-batches, and replaying the
    stream leaves the snapshot unchanged (idempotent partials)."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    base = "2024-03-01T10:{m:02d}:00"
    rows1 = (
        [{"event_id": i, "ts": base.format(m=i % 50), "event_type": "view"} for i in range(6)]
        + [{"event_id": 10 + i, "ts": base.format(m=i % 50), "event_type": "click"} for i in range(3)]
    )
    rows2 = (
        [{"event_id": 20 + i, "ts": base.format(m=i % 50), "event_type": "click"} for i in range(5)]
        + [{"event_id": 30 + i, "ts": base.format(m=i % 50), "event_type": "share"} for i in range(1)]
    )
    (src / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows1))
    (src / "b2.jsonl").write_text("\n".join(_json.dumps(r) for r in rows2))

    def run(ck: str):
        from pinterest_data_pipeline6_spark.streaming.jobs import (
            write_foreach_batch_trending,
        )

        stream = (
            spark.readStream.schema("event_id long, ts timestamp, event_type string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = write_foreach_batch_trending(
            stream,
            str(tmp_path / "counts"),
            str(tmp_path / "snapshot"),
            str(tmp_path / ck),
            k=2,
        )
        q.awaitTermination()

    run("ck1")
    snap = {
        (r.event_type): (r.n, r.rank)
        for r in spark.read.parquet(str(tmp_path / "snapshot")).collect()
    }
    # merged across batches: click 3+5=8 beats view 6; share never ranks
    assert snap["click"] == (8, 1)
    assert snap["view"] == (6, 2)
    assert "share" not in snap

    run("ck2")  # full replay over the same sinks
    snap2 = {
        (r.event_type): (r.n, r.rank)
        for r in spark.read.parquet(str(tmp_path / "snapshot")).collect()
    }
    assert snap2 == snap


def test_neardup_ledger_twin_matches_real_sink(spark, tmp_path):
    """Equivalence of the batch twin and the REAL streaming sink: feed
    the sf0.001 documents to write_foreach_batch_neardup as three
    micro-batches partitioned by doc_id % 3 (the twin's batch rule),
    then assert the sink's accepted doc set equals the twin's
    kept+bandless set per batch.  The DuckDB oracle proves the twin's
    arithmetic; THIS proves the twin replays the sink's semantics —
    together they give the foreachBatch recurrence an end-to-end
    external check."""
    import json

    from pyspark.sql import functions as F

    from pinterest_data_pipeline6_spark.operators.dedup import (
        NEARDUP_LEDGER_BATCHES,
        _neardup_batch_states,
    )
    from pinterest_data_pipeline6_spark.sources.readers import table
    from pinterest_data_pipeline6_spark.streaming.jobs import (
        write_foreach_batch_neardup,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    rows = docs.collect()

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "accepted")
    bands = str(tmp_path / "bands")
    ck = str(tmp_path / "ck")

    def run_one_batch(k: int) -> None:
        with open(src / f"b{k}.json", "w") as f:
            for r in rows:
                if r.doc_id % NEARDUP_LEDGER_BATCHES == k:
                    f.write(
                        json.dumps({"doc_id": r.doc_id, "text": r.text})
                        + "\n"
                    )
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(src)
        )
        write_foreach_batch_neardup(stream, sink, ck, bands).awaitTermination()

    for k in range(NEARDUP_LEDGER_BATCHES):
        run_one_batch(k)

    sink_accepted = {
        r.doc_id for r in spark.read.parquet(sink).select("doc_id").collect()
    }

    batched = docs.withColumn(
        "batch_id", F.pmod("doc_id", F.lit(NEARDUP_LEDGER_BATCHES))
    )
    twin_accepted = {
        r.doc_id
        for r in _neardup_batch_states(batched)
        .filter(F.col("status").isin("kept", "bandless"))
        .select("doc_id")
        .collect()
    }
    assert sink_accepted == twin_accepted


def test_neardup_sink_restart_from_checkpoint_matches_uninterrupted(
    spark, tmp_path
):
    """Crash-recovery for the near-dup accounting sink: process batch 0,
    then simulate a crash MID-BATCH-1 — after the accepted-rows append
    but BEFORE the band-state append (the exact window the sink's
    per-sink anti-join docstring claims to cover) — and restart from the
    SAME checkpoint. The replayed batch must not duplicate accepted
    rows, must complete the missing band state, and the final
    accepted + band tables must equal an uninterrupted run's."""
    import json

    from pinterest_data_pipeline6_spark.streaming.jobs import (
        write_foreach_batch_neardup,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").collect()
    b1 = [r for r in docs if r.doc_id % 2 == 0]
    b2 = [r for r in docs if r.doc_id % 2 == 1]

    def write_file(d, name, rows):
        with open(d / name, "w") as f:
            for r in rows:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")

    def run(src, sink, bands, ck):
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(src)
        )
        write_foreach_batch_neardup(
            stream, str(sink), str(ck), str(bands)
        ).awaitTermination()

    # uninterrupted control: two sequential single-file runs, one ck
    ctl = tmp_path / "ctl"
    ctl.mkdir()
    write_file(ctl, "b1.json", b1)
    run(ctl, tmp_path / "ctl_acc", tmp_path / "ctl_bands", tmp_path / "ctl_ck")
    write_file(ctl, "b2.json", b2)
    run(ctl, tmp_path / "ctl_acc", tmp_path / "ctl_bands", tmp_path / "ctl_ck")
    ctl_acc = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "ctl_acc")).collect()
    }
    ctl_bands = sorted(
        (r.doc_id, r.band_idx, r.band_key)
        for r in spark.read.parquet(str(tmp_path / "ctl_bands")).collect()
    )

    # crash run: batch 0 commits; batch 1 "crashes" between the appends
    cr = tmp_path / "cr"
    cr.mkdir()
    write_file(cr, "b1.json", b1)
    run(cr, tmp_path / "cr_acc", tmp_path / "cr_bands", tmp_path / "cr_ck")
    write_file(cr, "b2.json", b2)
    # the rows batch 1 WOULD accept (known from the control run): append
    # them to the accepted sink only — band append never happened, and
    # the checkpoint never committed batch 1
    b2_ids = {r.doc_id for r in b2}
    b2_accepted = [r for r in b2 if r.doc_id in ctl_acc and r.doc_id in b2_ids]
    spark.createDataFrame(
        [(r.doc_id, r.text) for r in b2_accepted], "doc_id long, text string"
    ).write.mode("append").parquet(str(tmp_path / "cr_acc"))
    # restart from the same checkpoint: batch 1 replays
    run(cr, tmp_path / "cr_acc", tmp_path / "cr_bands", tmp_path / "cr_ck")

    cr_acc_rows = spark.read.parquet(str(tmp_path / "cr_acc")).collect()
    assert len(cr_acc_rows) == len({r.doc_id for r in cr_acc_rows}), (
        "crash replay duplicated accepted rows"
    )
    assert {r.doc_id for r in cr_acc_rows} == ctl_acc
    cr_bands = sorted(
        (r.doc_id, r.band_idx, r.band_key)
        for r in spark.read.parquet(str(tmp_path / "cr_bands")).collect()
    )
    assert cr_bands == ctl_bands, "band state short/duplicated after crash"


def test_dq_gate_restart_from_checkpoint_matches_uninterrupted(
    spark, tmp_path
):
    """Crash-recovery for the DQ-gate ledger: stop after batch 0,
    restart from the SAME checkpoint with more input — the restarted
    query must process only the new file (no reprocessing, no
    double-appended ledger rows), and accepted/quarantine/metrics must
    equal an uninterrupted run over the full input."""
    import json as _json

    from pyspark.sql import functions as F

    from pinterest_data_pipeline6_spark.streaming.jobs import (
        write_foreach_batch_dq_gate,
    )

    rows1 = [
        {"doc_id": 1, "text": "ok row", "score": 0.5},
        {"doc_id": 2, "text": "", "score": 0.7},
    ]
    rows2 = [
        {"doc_id": 3, "text": "fine", "score": 0.1},
        {"doc_id": 4, "text": "bad", "score": 9.0},
    ]
    rules = {
        "nonempty": F.length("text") > 0,
        "score_range": (F.col("score") >= 0) & (F.col("score") <= 1),
    }

    def run(src, root, ck):
        stream = (
            spark.readStream.schema("doc_id long, text string, score double")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        write_foreach_batch_dq_gate(
            stream, f"{root}/acc", f"{root}/quar", f"{root}/metrics",
            str(ck), rules,
        ).awaitTermination()

    def ledger(root):
        acc = sorted(
            r.doc_id for r in spark.read.parquet(f"{root}/acc").collect()
        )
        quar = sorted(
            (r.doc_id, r.violated)
            for r in spark.read.parquet(f"{root}/quar").collect()
        )
        met = sorted(
            (r.batch_id, r.n_in, r.n_accepted, r.n_quarantined,
             r.v_nonempty, r.v_score_range)
            for r in spark.read.parquet(f"{root}/metrics").collect()
        )
        return acc, quar, met

    # uninterrupted control
    ctl = tmp_path / "ctl_src"
    ctl.mkdir()
    (ctl / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows1))
    (ctl / "b2.jsonl").write_text("\n".join(_json.dumps(r) for r in rows2))
    run(ctl, str(tmp_path / "ctl"), tmp_path / "ctl_ck")

    # interrupted: batch 0 only, then restart same ck with b2 present
    cr = tmp_path / "cr_src"
    cr.mkdir()
    (cr / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows1))
    run(cr, str(tmp_path / "cr"), tmp_path / "cr_ck")
    (cr / "b2.jsonl").write_text("\n".join(_json.dumps(r) for r in rows2))
    run(cr, str(tmp_path / "cr"), tmp_path / "cr_ck")

    assert ledger(str(tmp_path / "cr")) == ledger(str(tmp_path / "ctl"))


def test_trending_restart_from_checkpoint_matches_uninterrupted(
    spark, tmp_path
):
    """Crash-recovery for the trending sink: restart from the SAME
    checkpoint mid-stream; the merged partials and final snapshot must
    equal an uninterrupted run (batch_id continuity from the checkpoint
    keeps the partials partitions disjoint)."""
    import json as _json

    from pinterest_data_pipeline6_spark.streaming.jobs import (
        write_foreach_batch_trending,
    )

    base = "2024-03-01T10:{m:02d}:00"
    rows1 = [
        {"event_id": i, "ts": base.format(m=i % 50), "event_type": "view"}
        for i in range(6)
    ] + [
        {"event_id": 10 + i, "ts": base.format(m=i % 50), "event_type": "click"}
        for i in range(3)
    ]
    rows2 = [
        {"event_id": 20 + i, "ts": base.format(m=i % 50), "event_type": "click"}
        for i in range(5)
    ]

    def run(src, root, ck):
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        write_foreach_batch_trending(
            stream, f"{root}/counts", f"{root}/snapshot", str(ck), k=2
        ).awaitTermination()

    def snapshot(root):
        return sorted(
            (r.win_start, r.event_type, r.n, r.rank)
            for r in spark.read.parquet(f"{root}/snapshot").collect()
        )

    ctl = tmp_path / "ctl_src"
    ctl.mkdir()
    (ctl / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows1))
    (ctl / "b2.jsonl").write_text("\n".join(_json.dumps(r) for r in rows2))
    run(ctl, str(tmp_path / "ctl"), tmp_path / "ctl_ck")

    cr = tmp_path / "cr_src"
    cr.mkdir()
    (cr / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows1))
    run(cr, str(tmp_path / "cr"), tmp_path / "cr_ck")
    (cr / "b2.jsonl").write_text("\n".join(_json.dumps(r) for r in rows2))
    run(cr, str(tmp_path / "cr"), tmp_path / "cr_ck")

    assert snapshot(str(tmp_path / "cr")) == snapshot(str(tmp_path / "ctl"))
    ctl_partials = sorted(
        (r.batch_id, r.win_start, r.event_type, r.n)
        for r in spark.read.parquet(str(tmp_path / "ctl/counts")).collect()
    )
    cr_partials = sorted(
        (r.batch_id, r.win_start, r.event_type, r.n)
        for r in spark.read.parquet(str(tmp_path / "cr/counts")).collect()
    )
    assert cr_partials == ctl_partials
