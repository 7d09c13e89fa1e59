"""Structured Streaming path: payload deserialization, cleaning reuse,
append sinks, watermarked stateful ops.

Mirrors the reference's Kinesis notebook ("(Clone) Kinesis Data
Stream.py") with idiomatic Structured Streaming:

- **ST1 deserialization** (STREAM:49-51,79-81,108-110): payload string →
  ``from_json(schema)`` → ``data.*`` flatten. Locally the unbounded
  source is a file stream of JSON-line payloads (same downstream
  contract as Kinesis/Kafka: a string ``value`` column); on a real
  cluster swap ``readStream.format("kafka")`` in — nothing downstream
  changes.
- **Batch/stream parity** (STREAM:117-163 reuses the batch cleaners
  verbatim): ``clean_stream`` applies the SAME ``clean_pin``/
  ``clean_geo``/``clean_user`` functions from functions/cleaning.py.
- **ST2 stateful dedup**: reference mode is ``dropDuplicates`` with NO
  watermark (unbounded state — reproduced on purpose, SURVEY.md §2.9);
  ``watermarked_geo_dedup`` is the robust variant
  (``withWatermark`` + ``dropDuplicatesWithinWatermark``) whose state
  store stays bounded at 100 TB/day ingest.
- **ST3 append sink** (STREAM:174-192): ``writeStream`` append mode with
  a checkpoint dir per stream — exactly-once into the table path.
- **ST4 earliest replay**: the file source reads all existing files
  first, the same contract as ``initialPosition='earliest'``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pinterest_data_pipeline6_spark.functions.cleaning import clean_geo, clean_pin, clean_user
from pinterest_data_pipeline6_spark.schemas import RAW_GEO_SCHEMA, RAW_PIN_SCHEMA, RAW_USER_SCHEMA

_SCHEMAS = {"pin": RAW_PIN_SCHEMA, "geo": RAW_GEO_SCHEMA, "user": RAW_USER_SCHEMA}
_CLEANERS = {"pin": clean_pin, "geo": clean_geo, "user": clean_user}


def _sink_exists(spark: SparkSession, path: str) -> bool:
    """True if a previously-written parquet sink exists at ``path``.

    Explicit existence probe (Hadoop FS, so any scheme works) instead of
    a broad try/except around the read: a corrupt file, schema drift, or
    a transient FS failure must PROPAGATE and fail the micro-batch —
    silently treating those as "first batch" would disable dedup state
    for the batch and admit duplicates."""
    jvm = spark._jvm
    jconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(jconf).exists(jpath)


def kafka_source_options(
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Translate the reference's Kinesis source settings (STREAM:38-46:
    ``format('kinesis')`` + ``initialPosition='earliest'`` + one stream
    per entity) into the Kafka connector's option surface:

    - stream name → ``subscribe`` topic
    - ``initialPosition: earliest`` → ``startingOffsets: earliest``
      (ST4 replay-from-start semantics)
    - endpoint/region → ``kafka.bootstrap.servers``
    - optional throughput cap → ``maxOffsetsPerTrigger`` (the knob that
      keeps a backlogged topic from producing an unbounded first batch)

    Pure translation, unit-testable with no broker; ``read_payload_
    stream(source='kafka')`` consumes it verbatim."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_payload_stream(
    spark: SparkSession,
    entity: str,
    path: str,
    source: str = "file",
    kafka_options: dict[str, str] | None = None,
) -> DataFrame:
    """Unbounded read of JSON-line payloads + ST1 deserialization:
    string value → from_json(declared schema) → struct flatten. The
    default ``text`` source yields the same one-string-column contract
    as a Kafka/Kinesis ``CAST(data AS STRING)`` (STREAM:49).

    ``source='kafka'`` swaps in the real connector (``kafka_options``
    from :func:`kafka_source_options`; the connector jar must be on the
    classpath — not shipped in this sandbox, so only the file path is
    exercised by tests). Everything downstream of the ``value`` column
    is IDENTICAL between the two sources — that contract is the point."""
    if source == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in (kafka_options or {}).items():
            reader = reader.option(k, v)
        raw = reader.load().selectExpr("CAST(value AS STRING) AS value")
    elif source == "file":
        raw = spark.readStream.text(path)
    else:
        raise ValueError(f"unknown source {source!r} (expected 'file' or 'kafka')")
    return raw.select(
        F.from_json(F.col("value"), _SCHEMAS[entity]).alias("data")
    ).select("data.*")


def clean_stream(entity: str, df: DataFrame) -> DataFrame:
    """Apply the batch cleaner to a streaming DataFrame — parity by
    construction (STREAM:117-163). Reference semantics: arbitrary-row
    stateful dedup, no watermark."""
    return _CLEANERS[entity](df, deterministic=False)


def watermarked_geo_dedup(df: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Robust-mode geo cleaning: event-time watermark then
    ``dropDuplicatesWithinWatermark`` on ``ind`` — bounded state,
    late rows beyond ``delay`` dropped deterministically."""
    parsed = (
        df.withColumn("coordinates", F.array("latitude", "longitude"))
        .drop("latitude", "longitude")
        .select("ind", "country", "coordinates", "timestamp")
        .withColumn("timestamp", F.to_timestamp("timestamp"))
    )
    return parsed.withWatermark("timestamp", delay).dropDuplicatesWithinWatermark(["ind"])


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", delay: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregate — the streaming twin of
    operators/events.tumbling_hourly_agg (same logical result on a
    bounded input). State per (window, event_type) only; closed windows
    are emitted and evicted once the watermark passes."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n_events",
            F.round("sum_value", 4).alias("sum_value"),
        )
    )


def session_window_counts(
    events: DataFrame, gap: str = "30 minutes", delay: str = "2 hours"
) -> DataFrame:
    """Native session windows (``F.session_window``): per-user sessions
    close after ``gap`` of inactivity. The built-in operator keeps one
    merging window per (user, open session) in the state store and
    evicts on watermark — the declarative counterpart of the custom
    ``applyInPandasWithState`` sessionizer in streaming/stateful.py
    (which exists for logic session_window can't express, e.g.
    value-dependent gaps)."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("win.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            F.round("sum_value", 4).alias("sum_value"),
        )
    )


def stream_stream_join(
    clicks: DataFrame, purchases: DataFrame, within: str = "10 minutes", delay: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream interval join: each click joins
    purchases by the same user within ``within`` BEFORE the click.
    Both sides are watermarked and the join carries an equi key
    (user_id) plus a bounded time range, so the state store retains
    each side only for ``delay + within`` — the condition Structured
    Streaming needs to ever evict join state. Without the time bound
    this join would buffer both streams forever."""
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("c_ts", delay)
    p = purchases.select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    ).withWatermark("p_ts", delay)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") <= F.col("c_ts"))
        & (F.col("p_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {within}"))
    )
    return c.join(p, cond, "inner").select(
        "click_id", F.col("c_user").alias("user_id"), "c_ts", "p_ts",
        F.round("p_value", 6).alias("p_value"),
    )


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, key: str, dim_cols: tuple[str, ...]
) -> DataFrame:
    """Stream-static broadcast enrichment: join each micro-batch against
    a bounded dimension table (user profiles, geo lookup, model-version
    metadata). The static side is re-resolved per micro-batch — with a
    broadcast hint it ships to executors once per batch and the stream
    side never shuffles, the production shape for dimension lookups at
    any stream rate. Stateless: no watermark needed (unlike
    stream-stream joins, nothing is buffered between batches).

    Left join keeps unmatched stream rows (a missing dimension row must
    not drop events — flag it downstream instead)."""
    d = F.broadcast(dim.select(key, *dim_cols))
    return stream.join(d, key, "left")


def write_append(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    available_now: bool = True,
) -> StreamingQuery:
    """ST3: append-mode sink with checkpoint (STREAM:174-192 writes
    Delta on Databricks; parquet locally — the contract is identical).
    ``available_now`` processes everything present then stops — the
    batch-like trigger used by tests and backfills."""
    writer = (
        df.writeStream.format(fmt)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .option("path", path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_foreach_batch_upsert(
    df: DataFrame,
    path: str,
    checkpoint: str,
    key: str,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch upsert sink (absent from the reference's streaming
    surface — SURVEY.md §2.9 'Absent'): each micro-batch is merged into
    the parquet table at ``path`` as anti-join(existing, batch) ∪ batch,
    keeping the LAST observed row per ``key``. foreachBatch hands the
    micro-batch to arbitrary *batch* DataFrame code — the standard
    escape hatch for sinks Structured Streaming lacks natively (JDBC
    upserts, MERGE INTO, multi-table fanout). The rewrite-the-table
    form is correct at any scale where the keyed partition overwrite
    below it would be (with Delta/Iceberg this body becomes MERGE INTO;
    the streaming contract is unchanged)."""
    spark = df.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        # Idempotent under foreachBatch's at-least-once replay: the
        # rewrite is a full overwrite keyed on `key`, so re-running a
        # batch converges to the same table.
        dedup = batch.dropDuplicates([key])
        if _sink_exists(spark, path):
            existing = spark.read.parquet(path)
            merged = existing.join(dedup, key, "left_anti").unionByName(dedup)
        else:
            merged = dedup
        # materialize before overwriting the dir the plan reads from
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)

    writer = (
        df.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_foreach_batch_dedup(
    df: DataFrame,
    path: str,
    checkpoint: str,
    digest_cols: tuple[str, ...],
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental exact-dedup sink — the STREAMING form of the
    curation funnel's first dedup stage: each micro-batch keeps only
    rows whose content digest has never been appended, so the output
    table is duplicate-free across the whole stream without unbounded
    driver state (the state IS the output table's digest column).

    Contrast with streaming ``dropDuplicates`` (SURVEY.md §2.9 ST2):
    that keeps digests in the state store forever; here the anti-join
    re-reads the sink, which parquet column-prunes to the one digest
    column. At scale the digest lookup side becomes a bucketed table
    (or a Delta/Iceberg MERGE) so the anti-join is co-located rather
    than re-shuffled per batch; the streaming contract is unchanged."""
    from pyspark.sql import functions as F

    spark = df.sparkSession

    def dedup_batch(batch: DataFrame, batch_id: int) -> None:
        # Idempotent under replay: a re-run batch's digests are already
        # in the sink, so the anti-join drops every row the first
        # attempt appended.
        d = batch.withColumn(
            "digest", F.md5(F.concat_ws("\x1f", *digest_cols))
        ).dropDuplicates(["digest"])
        if _sink_exists(spark, path):
            seen = spark.read.parquet(path).select("digest").distinct()
            fresh = d.join(seen, "digest", "left_anti")
        else:
            fresh = d
        fresh.write.mode("append").parquet(path)

    writer = (
        df.writeStream.foreachBatch(dedup_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_foreach_batch_neardup(
    df: DataFrame,
    path: str,
    checkpoint: str,
    bands_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming NEAR-duplicate suppression — the MinHash/LSH stage of
    the curation funnel as a sink: a document is accepted only if none
    of its LSH band buckets is already occupied by a previously
    accepted (or same-batch smaller-id) document. The accepted docs
    land at ``path``; their band membership accumulates at
    ``bands_path`` and IS the dedup state — no driver-side state, no
    state store growth beyond the (tiny) band table.

    Per micro-batch, three joins, all on the band key:
      1. anti-join batch bands against the accumulated band table
         (docs colliding with history are dropped);
      2. within-batch domination (same band bucket → smallest doc_id
         survives), the same rule as the batch curation funnel;
      3. append survivors' rows and band memberships.

    At 100 TB/day the band table is bucketed on band_key so step 1 is
    co-located; with Delta/Iceberg steps 1+3 become one MERGE. The
    exact-dedup counterpart is ``write_foreach_batch_dedup``."""
    neardup_batch = _make_neardup_batch_fn(df.sparkSession, path, bands_path)
    writer = (
        df.writeStream.foreachBatch(neardup_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _make_neardup_batch_fn(spark: SparkSession, path: str, bands_path: str):
    """The per-micro-batch LSH suppression step of
    ``write_foreach_batch_neardup``, extracted so composed sinks (the
    classifier-gated curation funnel) can run it after their own
    per-batch work inside ONE foreachBatch."""
    from pinterest_data_pipeline6_spark.operators.dedup import band_keys_for

    def neardup_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.dropDuplicates(["doc_id"])
        bands_all = band_keys_for(batch)
        bands = bands_all
        if _sink_exists(spark, bands_path):  # first batch: no band state yet
            seen = spark.read.parquet(bands_path).select("band_idx", "band_key").distinct()
            # ANY collision with an accepted doc's bucket drops the WHOLE doc
            collided = (
                bands.join(seen, ["band_idx", "band_key"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            bands = bands.join(collided, "doc_id", "left_anti")
        # within-batch domination: min doc_id per surviving bucket wins;
        # a doc is dropped if ANY of its buckets holds a smaller id
        dominated = (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("b.doc_id") < F.col("a.doc_id")),
                "left_semi",
            )
            .select("doc_id")
            .distinct()
        )
        survivors = (
            bands.select("doc_id").distinct().join(dominated, "doc_id", "left_anti")
        )
        # docs with <3 tokens produce no shingles/bands: accept them
        # (nothing to collide on) alongside the band survivors. Checked
        # against the PRE-collision band table — a doc whose bands were
        # all removed by a history collision is suppressed, not bandless
        bandless = batch.select("doc_id").distinct().join(
            bands_all.select("doc_id").distinct(), "doc_id", "left_anti"
        )
        keep = survivors.unionByName(bandless).localCheckpoint(eager=True)
        # Idempotence under foreachBatch's at-least-once replay, with a
        # PER-SINK anti-join (one shared keep-set would be wrong: after a
        # crash between the two appends, the accepted docs must be
        # excluded from the accepted append but still get their band
        # rows appended, or the band state is permanently short):
        #   * full replay — the history-collision step above already
        #     empties `bands`, and `written` empties the accepted side;
        #   * crash between the appends — `written` suppresses the
        #     duplicate accepted rows while `bands` (absent from
        #     bands_path) is appended, completing the batch.
        # localCheckpoint materializes the anti-join before the append
        # job lists the directory it also reads.
        keep_acc = keep
        if _sink_exists(spark, path):
            written = spark.read.parquet(path).select("doc_id").distinct()
            keep_acc = keep.join(written, "doc_id", "left_anti").localCheckpoint(eager=True)
        batch.join(keep_acc, "doc_id", "left_semi").write.mode("append").parquet(path)
        bands.join(keep, "doc_id", "left_semi").write.mode("append").parquet(bands_path)

    return neardup_batch


def run_streaming_curation(
    spark: SparkSession,
    source_dir: str,
    sink_root: str,
    available_now: bool = True,
) -> StreamingQuery:
    """The streaming form of the batch curation funnel
    (operators/curation.py): an unbounded `documents` stream is
    quality-gated row-locally (map-only, rejected docs never reach a
    shuffle or the sink), then flows through the LSH near-dup
    suppression sink — which subsumes exact dedup, since identical
    normalized texts produce identical band keys. Output layout:

        {sink_root}/accepted     accepted documents (parquet, append)
        {sink_root}/bands        accumulated band state (the dedup memory)
        {sink_root}/gate_ledger  per-batch gate decision counts

    The gate is TWO row-local stages: the heuristic quality flags,
    then the hashed-feature classifier (``scoring.py`` — reused
    verbatim as the same fold expression, the batch/stream parity
    pattern of the cleaners) on the normalized text.  Gate decisions
    are ledgered per micro-batch (batch_id, raw, per-gate failures,
    passes) BEFORE filtering, so the funnel's own run produces its
    audit trail; the batch twin of the ledger is
    ``scoring.classifier_gate_stream_ledger``.

    The funnel ordering matches the batch lesson in docs/SCALE.md:
    shrink the input of each stage before the next — both gates are
    map-only projections ahead of any signature work, and signatures
    are computed only for docs that pass."""
    from pinterest_data_pipeline6_spark.operators.curation import _quality_flags
    from pinterest_data_pipeline6_spark.operators.scoring import (
        classifier_total_milli,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = spark.readStream.schema(schema).json(source_dir)
    flagged = _quality_flags(stream).select(
        "doc_id",
        F.col("norm").alias("text"),
        "lang",
        "source",
        F.coalesce("passed_quality", F.lit(False)).alias("heur_ok"),
        (
            F.coalesce(classifier_total_milli(F.col("norm")), F.lit(0)) > 0
        ).alias("clf_ok"),
    )
    neardup_batch = _make_neardup_batch_fn(
        spark, f"{sink_root}/accepted", f"{sink_root}/bands"
    )
    ledger_path = f"{sink_root}/gate_ledger"

    def gated_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint(eager=True)  # flags computed once
        # batch_id lives in the partition directory name only — keeping
        # it out of the file avoids a partition/file column clash on read
        ledger = batch.agg(
            F.count("*").alias("n_raw"),
            F.sum((~F.col("heur_ok")).cast("long")).alias(
                "n_fail_heuristic"
            ),
            F.sum(
                (F.col("heur_ok") & ~F.col("clf_ok")).cast("long")
            ).alias("n_fail_classifier"),
            F.sum(
                (F.col("heur_ok") & F.col("clf_ok")).cast("long")
            ).alias("n_gate_pass"),
        )
        # replay-idempotent: a re-delivered batch_id overwrites its own
        # partition instead of appending a duplicate ledger row
        ledger.write.mode("overwrite").parquet(
            f"{ledger_path}/batch_id={batch_id}"
        )
        neardup_batch(
            batch.filter(F.col("heur_ok") & F.col("clf_ok")).select(
                "doc_id", "text", "lang", "source"
            ),
            batch_id,
        )

    writer = (
        flagged.writeStream.foreachBatch(gated_batch)
        .outputMode("append")
        .option("checkpointLocation", f"{sink_root}/_ck/curation")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_shards(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming shard-router sink: route each micro-batch's documents
    into the SAME content-stable hash-shard layout that the batch
    ``write_training_shards`` produces (hive ``shard=N`` directories,
    shard = h64(doc_id) mod N_EXPORT_SHARDS) — the continuous-ingest
    path of the training-data export story. Because assignment is a
    pure function of doc_id, batch and streaming writers can feed the
    SAME table and a late-arriving doc always lands in its one shard.

    Uses the native partitioned file sink (not foreachBatch): append
    mode + checkpoint gives exactly-once file output, and the sink
    tracks files per shard directory. At scale the micro-batch
    repartition on shard keeps one writer task per shard per trigger,
    bounding small-file growth; a periodic ``compact_files`` pass per
    shard directory handles the rest."""
    from pinterest_data_pipeline6_spark.operators.curation import (
        N_EXPORT_SHARDS,
        _shard_col,
    )

    sharded = df.withColumn("shard", _shard_col()).repartition(
        N_EXPORT_SHARDS, "shard"
    )
    writer = (
        sharded.writeStream.format("parquet")
        .outputMode("append")
        .partitionBy("shard")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_pipeline(
    spark: SparkSession,
    source_dirs: dict[str, str],
    sink_root: str,
    available_now: bool = True,
) -> dict[str, StreamingQuery]:
    """The full STREAM notebook analog: three payload streams → clean →
    three append tables, one checkpoint each (STREAM:174-192)."""
    queries: dict[str, StreamingQuery] = {}
    for entity, src in source_dirs.items():
        stream = read_payload_stream(spark, entity, src)
        cleaned = clean_stream(entity, stream)
        queries[entity] = write_append(
            cleaned,
            path=f"{sink_root}/{entity}_table",
            checkpoint=f"{sink_root}/_checkpoints/{entity}",
            available_now=available_now,
        )
    return queries


def dq_violation_tags(rules: dict[str, "F.Column"]) -> "F.Column":
    """The gate's tagging expression: array of the names of every rule
    the row VIOLATES (rule True = pass; a NULL rule result is treated
    as a pass, mirroring SQL's CASE semantics so the batch twin's
    DuckDB oracle agrees on null inputs). All rules evaluate in ONE
    projection — adding a rule never adds a scan."""
    return F.array_compact(
        F.array(
            *[
                F.when(~cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules.items()
            ]
        )
    )


def dq_metric_aggs(rules: dict[str, "F.Column"]) -> list["F.Column"]:
    """The gate's ledger aggregates over a ``violated``-tagged relation:
    input/accepted/quarantined counts plus one violation count per
    rule. Shared verbatim by the streaming sink (whole-batch agg) and
    the ``dq_gate_ledger`` batch twin (grouped by batch key) so the
    externally-oracled twin pins exactly the expressions the streaming
    path runs."""
    return [
        F.count(F.lit(1)).alias("n_in"),
        F.sum((F.size("violated") == 0).cast("bigint")).alias("n_accepted"),
        F.sum((F.size("violated") > 0).cast("bigint")).alias("n_quarantined"),
        *[
            F.sum(F.array_contains("violated", name).cast("bigint")).alias(
                f"v_{name}"
            )
            for name in rules
        ],
    ]


def write_foreach_batch_dq_gate(
    df: DataFrame,
    accepted_path: str,
    quarantine_path: str,
    metrics_path: str,
    checkpoint: str,
    rules: dict[str, "F.Column"],
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming data-quality gate — the streaming form of
    ``operators.dataquality.dq_expectations``: every micro-batch is
    split into accepted rows and quarantined rows (tagged with the
    comma-joined names of the rules they violated), and one metrics row
    per batch (input/accepted/quarantined counts plus per-rule
    violation counts) is appended to a monitoring ledger.

    ``rules`` maps rule name → boolean Column (True = row passes). All
    rules evaluate in ONE projection — the violation list is an
    array_compact over per-rule WHEN expressions — so adding a rule
    never adds a scan of the batch.

    Idempotent under foreachBatch's at-least-once replay: all three
    sinks are hive-partitioned by ``batch_id`` and written with dynamic
    partition overwrite, so a retried batch replaces exactly its own
    partition instead of double-appending. The batch is persisted
    across the three writes (one source read, three narrow outputs)."""
    def gate_batch(batch: DataFrame, batch_id: int) -> None:
        tagged = batch.withColumn("violated", dq_violation_tags(rules)).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        tagged.persist()
        try:
            accepted = tagged.where(F.size("violated") == 0).drop("violated")
            quarantined = tagged.where(F.size("violated") > 0).withColumn(
                "violated", F.array_join("violated", ",")
            )
            for out, path in ((accepted, accepted_path), (quarantined, quarantine_path)):
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(path)
                )
            metrics = tagged.agg(*dq_metric_aggs(rules)).withColumn(
                "batch_id", F.lit(int(batch_id))
            )
            (
                metrics.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(metrics_path)
            )
        finally:
            tagged.unpersist()

    writer = (
        df.writeStream.foreachBatch(gate_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def trending_snapshot(partials: DataFrame, k: int) -> DataFrame:
    """The trending sink's merge step: per-batch (win_start, event_type)
    partial counts → total counts → top-k types per window, ties broken
    by event_type ascending (deterministic snapshot). Shared by the
    streaming sink and the ``trending_topk_snapshot`` batch twin.

    The rank window partitions on win_start over ALREADY-AGGREGATED
    rows (≤ #types per window), so the shuffle carries the totals
    table, never raw events."""
    from pyspark.sql.window import Window as W

    totals = partials.groupBy("win_start", "event_type").agg(
        F.sum("n").alias("n")
    )
    rnk = F.row_number().over(
        W.partitionBy("win_start").orderBy(F.desc("n"), F.asc("event_type"))
    )
    return totals.withColumn("rank", rnk).where(F.col("rank") <= k)


def write_foreach_batch_trending(
    df: DataFrame,
    counts_path: str,
    snapshot_path: str,
    checkpoint: str,
    k: int = 3,
    window_duration: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Trending-now sink: maintains a per-window top-k event-type
    snapshot as the stream progresses. Each micro-batch (1) writes its
    windowed per-type partial counts under its own ``batch_id``
    partition (dynamic partition overwrite ⇒ replay-idempotent, same
    contract as the DQ gate), then (2) recomputes the snapshot — total
    counts per (window, type) across all batch partials, ranked, top k
    per window — and atomically overwrites ``snapshot_path``.

    The snapshot pass re-reads only the partials table (window × type ×
    batch cardinality, not raw events); at scale the partials are
    periodically compacted (``sources/io.compact_files``) so the
    re-aggregation stays bounded — the classic
    streaming-partials + batch-merge lambda shape, with the stream side
    exactly-once."""
    def trending_batch(batch: DataFrame, batch_id: int) -> None:
        partial = (
            batch.groupBy(
                F.window("ts", window_duration).getField("start").alias("win_start"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        (
            partial.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(counts_path)
        )
        spark = batch.sparkSession
        top = trending_snapshot(spark.read.parquet(counts_path), k)
        top.write.mode("overwrite").parquet(snapshot_path)

    writer = (
        df.writeStream.foreachBatch(trending_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
