"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDF
pipelines (``mapInPandas``).

The decode step itself is STUBBED (this environment ships no
image/audio codecs — see ``_decode_image``): real deployments swap the
stub for PIL/torchaudio/ffmpeg calls without touching any Spark-side
plumbing. Everything around the stub is real and tested: the schema
contract, Arrow batch shapes, per-partition batching, the fan-out
(frame sampling) iterator pattern, and the deterministic fake feature
path used by tests and oracles.

Scale notes:
- payloads never pass through Python row-by-row — ``mapInPandas``
  moves whole Arrow record batches; ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` bounds batch memory for fat binaries;
- the feature extractor is a narrow map (no shuffle); downstream
  similarity joins reuse operators/similarity.py on the emitted
  vectors;
- metadata filters (kind/width/duration) are plain Catalyst predicates
  on the struct column — pushed to the scan, so decode only ever runs
  on the selected subset.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pinterest_data_pipeline6_spark.sources.readers import table, widen_small_scan

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def synthesize_media(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic media table derived from ``documents``: the payload
    is the utf-8 text bytes (a stand-in for real image/audio bytes with
    a known generator), kind cycles image/audio/video, metadata is
    derived from doc stats. Catalyst-native — no Python in this step.
    The scan is widened so the downstream Pandas-UDF stages (Arrow
    batches) run on all cores, not the single input split."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def _decode_image(payload: bytes) -> bytes:
    """STUB — real image decode (PIL/libjpeg) is unavailable in this
    environment. Deployments replace this function only; the Spark
    plumbing around it is codec-agnostic."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "swap _decode_image for a real decoder (e.g. PIL.Image.open)"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature vector: mean byte value of ``dim``
    equal-width chunks, scaled to [0, 1]. Stands in for a real encoder
    with the same signature (bytes -> fixed-dim vector)."""
    if not payload:
        return [0.0] * dim
    n = len(payload)
    step = max(n // dim, 1)
    feats = []
    for i in range(dim):
        chunk = payload[i * step : (i + 1) * step] or payload[-step:]
        feats.append(round(sum(chunk) / len(chunk) / 255.0, 6))
    return feats


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. The UDF
    receives whole pandas batches (never Python rows); output rows map
    1:1 to inputs, schema is declared up front."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [_fake_features(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every: int = 4, frame_size: int = 32) -> DataFrame:
    """Frame sampling for video payloads: chop the payload into
    ``frame_size``-byte frames, keep every ``every``-th — the fan-out
    (1 row -> N rows) mapInPandas iterator pattern a real video
    frame-sampler uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:  # absent/undecodable asset: no frames
                    continue
                frames = [
                    payload[o : o + frame_size]
                    for o in range(0, len(payload), frame_size)
                ]
                for i in range(0, len(frames), every):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_frames.append(frames[i])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    video = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return video.mapInPandas(run, FRAMES_SCHEMA)


def resize_payloads(media: DataFrame, factor: int = 4) -> DataFrame:
    """Resize/downsample over binary payloads: keep every ``factor``-th
    byte (the deterministic stand-in for an image resize — a real
    implementation swaps the body for PIL thumbnail/resample with the
    same signature and schema). 1:1 mapInPandas, same batch contract as
    extract_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [
                        bytes(p[::factor]) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    return media.select("media_id", "kind", "payload").mapInPandas(run, schema)


def media_payload_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-kind payload accounting over the synthesized media table —
    metadata/byte-length handling stays fully Catalyst-side (no decode
    needed for this class of query)."""
    media = synthesize_media(spark, sf)
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.col("meta.width")).alias("max_width"),
            F.max(F.col("meta.duration_ms")).alias("max_duration_ms"),
        )
        .orderBy("kind")
    )


def media_feature_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end multimodal pipeline: synthesize -> Arrow-batched
    feature extraction (Pandas UDF) -> per-kind rollup of the first
    feature component. Because the stand-in extractor is deterministic
    byte arithmetic over an ASCII corpus, the whole pipeline carries a
    DuckDB oracle (see ORACLE notes); swapping in a real encoder
    returns this entry to rows-only. tests/test_multimodal.py
    additionally pins exact values."""
    feats = extract_features(synthesize_media(spark, sf))
    return (
        feats.select("kind", F.col("features").getItem(0).alias("f0"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.round(F.sum(F.col("f0").cast("decimal(18,6)")).cast("double"), 4).alias("sum_f0"),
        )
        .orderBy("kind")
    )


def frame_sample_accounting(spark: SparkSession, sf: str) -> DataFrame:
    """Oracle-checked audit of the mapInPandas FAN-OUT path: run the
    video frame sampler (32-byte frames, keep every 4th) and report
    total sampled frames, videos touched, and sampled bytes. Because
    the synthetic payload is the utf-8 text bytes, the expected counts
    are pure arithmetic over strlen(text) — which lets the DuckDB
    oracle verify the 1→N Python fan-out EXACTLY, the strongest check
    available for a UDF-shaped operator (media_feature_rollup's
    extractor stays rows-only by contrast).

    Scale shape: one Arrow-batched pass over the video slice; the
    rollup reduces inside each batch's output partition before one
    final agg. No shuffle carries payload bytes."""
    frames = sample_frames(synthesize_media(spark, sf))
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.count_distinct("media_id").alias("n_videos"),
        F.sum(F.length("frame")).alias("frame_bytes"),
    )


def binary_file_inventory(spark: SparkSession, sf: str) -> DataFrame:
    """Opaque-binary ingestion via Spark's ``binaryFile`` source — the
    entry point for raw image/audio/video assets before any decode
    stage: each file becomes (path, modificationTime, length, content)
    with content lazily read per-row. The inventory projects metadata
    only, so at scale the scan never materializes payload bytes for
    files that filters drop (the source supports pathGlobFilter +
    modifiedAfter pushdown for incremental ingest).

    The oracle reads the same files with DuckDB's read_blob; digests
    are engine-internal (DuckDB 1.0 cannot md5 raw blobs), so the
    cross-checked contract is (file name, byte length) per file."""
    inv = spark.read.format("binaryFile").load(f"{sf}/*.parquet")
    return (
        inv.select(
            F.element_at(F.split("path", "/"), -1).alias("file"),
            F.col("length").alias("n_bytes"),
        )
        .orderBy("file")
    )


ORACLE: dict[str, str] = {
    # read_blob path is pinned to the driver's oracle scale factor
    # (the harness compares at sf0.01 — BASELINE.md); DuckDB has no
    # view-relative way to address raw files
    "binary_file_inventory": """
        SELECT regexp_extract(filename, '[^/]+$') AS file,
               CAST(size AS BIGINT) AS n_bytes
        FROM read_blob('/root/testdata/sf0.01/*.parquet')
    """,
    "media_payload_stats": """
        SELECT kind, COUNT(*) AS n_media,
               CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
               MAX(width) AS max_width, MAX(duration_ms) AS max_duration_ms
        FROM (
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   encode(text) AS payload,
                   CAST(n_chars % 640 AS INT) AS width,
                   CAST(n_chars * 10 AS INT) AS duration_ms
            FROM documents
        )
        GROUP BY kind
    """,
    # media_feature_rollup: the stand-in extractor is deterministic
    # arithmetic (mean byte of the first of FEATURE_DIM equal-width
    # chunks), and the synthetic corpus is pure ASCII (byte == ascii of
    # the char, verified octet_length(encode(text)) == length(text) at
    # every SF), so f0 unrolls into ascii(substr(...)) sums.  Division
    # order mirrors Python exactly: (sum / step) / 255.0.  A REAL
    # encoder swapped in for _fake_features would return this entry to
    # rows-only — the oracle checks the Arrow plumbing + rollup, which
    # is the part that survives the swap.
    "media_feature_rollup": f"""
        WITH f AS (
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE ROUND(
                            CAST(list_sum(list_transform(
                                generate_series(1,
                                    GREATEST(length(text) // {FEATURE_DIM}, 1)),
                                i -> ascii(substr(text, CAST(i AS INT), 1))
                            )) AS DOUBLE)
                            / GREATEST(length(text) // {FEATURE_DIM}, 1)
                            / 255.0, 6)
                   END AS f0
            FROM documents
        )
        SELECT kind, COUNT(*) AS n_media,
               ROUND(CAST(SUM(CAST(f0 AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_f0
        FROM f GROUP BY kind ORDER BY kind
    """,
    #
    # frame_sample_accounting: the sampler chops ceil(len/32) frames
    # and keeps indices 0,4,8,… — sampled = (nf+3)//4; every sampled
    # frame is 32 bytes except the LAST frame (size len-32*(nf-1)),
    # which is sampled iff (nf-1) % 4 = 0.
    "frame_sample_accounting": """
        WITH vids AS (
            SELECT strlen(text) AS len FROM documents
            WHERE doc_id % 3 = 2 AND strlen(text) > 0
        ),
        calc AS (
            SELECT len,
                   CAST(CEIL(len / 32.0) AS BIGINT) AS nf,
                   len - 32 * (CAST(CEIL(len / 32.0) AS BIGINT) - 1) AS last_sz
            FROM vids
        ),
        per AS (
            SELECT (nf + 3) // 4 AS sampled,
                   CASE WHEN (nf - 1) % 4 = 0
                        THEN 32 * ((nf + 3) // 4 - 1) + last_sz
                        ELSE 32 * ((nf + 3) // 4) END AS bytes
            FROM calc
        )
        SELECT CAST(SUM(sampled) AS BIGINT) AS n_frames,
               CAST(COUNT(*) AS BIGINT) AS n_videos,
               CAST(SUM(bytes) AS BIGINT) AS frame_bytes
        FROM per
    """,
}

QUERIES = {
    "media_payload_stats": media_payload_stats,
    "media_feature_rollup": media_feature_rollup,
    "binary_file_inventory": binary_file_inventory,
    "frame_sample_accounting": frame_sample_accounting,
}


def media_content_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Content-hash dedup accounting over BINARY payloads: per media
    kind, distinct md5 digests vs total assets and the byte mass a
    dedup pass would reclaim ((copies - 1) x payload size per digest
    group) — the storage-side twin of the text dedup family, run on
    the opaque bytes themselves so it works for any codec.

    100 TB shape: the digest is a map-side projection (16 bytes
    shuffle per asset, payloads never leave the scan); two shrinking
    hash aggregates (kind+digest, then kind)."""
    media = synthesize_media(spark, sf)
    groups = (
        media.select(
            "kind",
            F.md5("payload").alias("digest"),
            F.length("payload").alias("nbytes"),
        )
        .groupBy("kind", "digest")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("nbytes").alias("nbytes"),
        )
    )
    return (
        groups.groupBy("kind")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_media"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum(F.col("cnt") * F.col("nbytes")).cast("bigint").alias(
                "total_bytes"
            ),
            F.sum((F.col("cnt") - 1) * F.col("nbytes")).cast(
                "bigint"
            ).alias("reclaimable_bytes"),
        )
        .orderBy("kind")
    )


ORACLE["media_content_dedup"] = """
    WITH groups AS (
        -- DuckDB's md5 takes VARCHAR only; hashing the text is
        -- byte-identical to Spark's md5 over encode(text, 'utf-8')
        -- because both digest the utf-8 byte stream
        SELECT kind, md5(text) AS digest, COUNT(*) AS cnt,
               MAX(octet_length(encode(text))) AS nbytes
        FROM (
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   text
            FROM documents
        )
        GROUP BY 1, 2
    )
    SELECT kind,
           CAST(SUM(cnt) AS BIGINT) AS n_media,
           COUNT(*) AS n_unique,
           CAST(SUM(cnt * nbytes) AS BIGINT) AS total_bytes,
           CAST(SUM((cnt - 1) * nbytes) AS BIGINT) AS reclaimable_bytes
    FROM groups GROUP BY kind ORDER BY kind
"""

QUERIES["media_content_dedup"] = media_content_dedup


def media_byte_entropy_by_kind(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-distribution health profile of BINARY payloads per media
    kind: total bytes, distinct byte values, and the byte entropy in
    bits — the cheapest corruption/codec screen there is (a healthy
    compressed codec sits near 8 bits; structured text far below; a
    stuck encoder collapses toward 0) and it needs no decoder at all,
    so it runs on any payload the pipeline ever ingests.

    Catalyst-native byte histogram — NO UDF: hex() the payload once,
    explode byte OFFSETS (the codegen index idiom), and read each byte
    as a 2-char substring. The shuffle carries (kind, byte) pairs that
    partial-aggregate to <= 256 rows per kind per task; entropy terms
    round to 9 decimals into DECIMAL (the reid_risk_entropy libm
    convention). Linear in payload bytes — the floor for any
    byte-level statistic."""
    media = synthesize_media(spark, sf)
    hx = media.select("kind", F.hex("payload").alias("hx"))
    # Guard empty payloads BEFORE the explode: Spark's sequence(1, 0)
    # returns the DESCENDING [1, 0] (two spurious rows) while DuckDB's
    # generate_series(1, 0) is empty — the same gotcha _bpe_pair_counts
    # guards with its size filter.
    bytes_ = (
        hx.filter(F.length("hx") > 0)
        .select(
            "kind",
            "hx",
            F.explode(
                F.sequence(F.lit(1), (F.length("hx") / 2).cast("int"))
            ).alias("i"),
        )
        .select(
            "kind",
            F.substring(
                "hx", (F.col("i") * 2 - 1).cast("int"), 2
            ).alias("b"),
        )
    )
    counts = bytes_.groupBy("kind", "b").agg(F.count("*").alias("k"))
    totals = counts.groupBy("kind").agg(F.sum("k").alias("n"))
    j = counts.join(F.broadcast(totals), "kind")
    p = F.col("k").cast("double") / F.col("n").cast("double")
    term = F.round(-(p * F.log2(p)), 9).cast("decimal(20,9)")
    return (
        j.groupBy("kind")
        .agg(
            F.max("n").cast("bigint").alias("total_bytes"),
            F.count("*").alias("n_distinct_bytes"),
            F.round(F.sum(term).cast("double"), 6).alias("byte_entropy_bits"),
        )
        .orderBy("kind")
    )


ORACLE["media_byte_entropy_by_kind"] = """
    WITH hx AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               hex(encode(text)) AS h
        FROM documents
    ),
    bytes_ AS (
        SELECT kind, substr(h, CAST(i * 2 - 1 AS INT), 2) AS b
        FROM (
            SELECT kind, h,
                   unnest(generate_series(1, len(h) // 2)) AS i
            FROM hx
        )
    ),
    counts AS (
        SELECT kind, b, COUNT(*) AS k FROM bytes_ GROUP BY kind, b
    ),
    totals AS (SELECT kind, SUM(k) AS n FROM counts GROUP BY kind)
    SELECT kind,
           CAST(MAX(n) AS BIGINT) AS total_bytes,
           COUNT(*) AS n_distinct_bytes,
           ROUND(CAST(SUM(CAST(ROUND(
                    -(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                    * LOG2(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                 AS DECIMAL(20,9))) AS DOUBLE), 6) AS byte_entropy_bits
    FROM counts JOIN totals USING (kind)
    GROUP BY kind ORDER BY kind
"""

QUERIES["media_byte_entropy_by_kind"] = media_byte_entropy_by_kind
