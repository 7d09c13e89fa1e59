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


# ---------------------------------------------------------------------------
# Round 9: perceptual image near-duplicate detection — aHash / dHash
# over the deterministic payload byte matrices, pure Catalyst bit math
# (NO decoder needed: the hashes read strided byte samples, exactly
# what they would read from a decoded 8x8 grayscale thumbnail; a real
# deployment swaps the sampling source for decoded pixels without
# touching the banding/verification plumbing below).
#
# aHash (average hash): sample PHASH_CELLS bytes at strided offsets
# covering the whole payload, bit j = cell_j > mean(cells) — identical
# integer form cell_j * PHASH_CELLS > sum(cells).  dHash (difference
# hash): sample a 4x9 grid, bit = left-neighbor > right-neighbor
# within each row (32 comparison bits).  Both are 32-bit fingerprints
# packed into bigint, matching the repo's 32-bit SimHash convention,
# and both engines compute them from the same hex-substring byte
# reads (verified bit-for-bit in tests).
#
# Pairing reuses the simhash_hamming_pairs machinery: 4 bands x 8
# bits, pigeonhole guarantees any pair within Hamming distance 3
# agrees on >= 1 band, candidates verified with one bit_count(xor)
# per pair.  100 TB shape: the hash is a row-local projection (no
# shuffle); the band join is bucket-confined exactly like MinHash/
# SimHash banding — never all-pairs.

PHASH_CELLS = 32        # strided byte samples -> 32-bit aHash
DHASH_GRID = 36         # 4 rows x 9 cols -> 32 within-row comparisons
PHASH_BANDS = 4         # 4 bands x 8 bits
PHASH_HAMMING_MAX = 3   # pigeonhole-complete for <= 3 bit flips

# dHash packing weights for the 35 adjacent-cell comparisons of the
# 4x9 grid: comparisons crossing a row boundary (i % 9 == 8) weigh 0,
# the 32 within-row comparisons get consecutive powers of two.
_DHASH_WEIGHTS: list[int] = []
_k = 0
for _i in range(DHASH_GRID - 1):
    if _i % 9 == 8:
        _DHASH_WEIGHTS.append(0)
    else:
        _DHASH_WEIGHTS.append(1 << _k)
        _k += 1


def _media_hex(spark: SparkSession, sf: str) -> DataFrame:
    """(media_id, kind, hx, n): hex-encoded payload + byte length,
    empty payloads excluded (the byte-entropy guard)."""
    media = synthesize_media(spark, sf)
    return media.select(
        "media_id",
        "kind",
        F.hex("payload").alias("hx"),
        F.length("payload").cast("long").alias("n"),
    ).filter(F.col("n") > 0)


def _byte_cells(n_cells: int) -> str:
    """SQL text for an array of ``n_cells`` strided byte samples: cell
    j reads the byte at offset floor(j * n / n_cells) — the same
    coverage a thumbnail resize gives a real perceptual hash.

    Built as ONE ``expr()`` string rather than per-cell Column objects:
    r10 measured the Column-object form costing ~2 s PER QUERY
    CONSTRUCTION at the driver — 68 cells × ~6 py4j round-trips each,
    paid again on every bench rep (construction is part of the timed
    query, by the bench contract).  The SQL parser ingests the same
    tree in one call.  Semantics unchanged: {j}*n is BIGINT, /
    {n_cells} is double division, FLOOR → BIGINT, the position cast
    and CONV(…, 16, 10) → INT match the old Column chain node for
    node (pinned by test_perceptual_hashes_match_python_reference)."""
    cells = ", ".join(
        f"CAST(CONV(SUBSTRING(hx, CAST(2*FLOOR({j}*n/{n_cells})+1 AS INT),"
        " 2), 16, 10) AS INT)"
        for j in range(n_cells)
    )
    return f"array({cells})"


def _perceptual_hashes(spark: SparkSession, sf: str) -> DataFrame:
    """(media_id, kind, ahash, dhash) — both 32-bit, packed bigint.

    Evaluation-order contract (the winnowing_fingerprints lesson,
    textops.py:2190): the cell arrays are materialized as their own
    projected columns — each is consumed many times downstream, so the
    projection survives CollapseProject and every consumer reads a
    plain attribute.  The cell TOTAL is likewise its own projected
    column, referenced 32 times by the ahash terms, so CollapseProject
    cannot re-inline its 31-add chain into each term.

    r10 rewrite (guide §1.2 step 2 / §7.3 "planning time itself"):
    the hashes were previously ~100 Column objects built in Python
    loops plus zip_with/aggregate lambdas.  Measured at sf0.1, that
    cost ~2 s of pure DRIVER time per query construction (py4j
    round-trips), paid on every bench rep, and the lambda bodies
    evaluated interpreted (HOFs do not join whole-stage codegen).
    Everything is now a handful of ``selectExpr`` strings — one parser
    call each — and both hashes are static IF/sum chains that stay
    inside WholeStageCodegen.  Bit-identical to the fold form: the
    same integer comparisons and the same power-of-two summands
    (pinned by test_perceptual_hashes_match_python_reference)."""
    base = _media_hex(spark, sf).selectExpr(
        "media_id",
        "kind",
        f"{_byte_cells(PHASH_CELLS)} AS ca",
        f"{_byte_cells(DHASH_GRID)} AS cd",
    )
    tot = "(" + " + ".join(f"ca[{k}]" for k in range(PHASH_CELLS)) + ")"
    with_tot = base.selectExpr("media_id", "kind", "ca", "cd", f"{tot} AS tot")
    ahash = " + ".join(
        f"IF(ca[{j}]*{PHASH_CELLS} > tot, {1 << j}L, 0L)"
        for j in range(PHASH_CELLS)
    )
    dhash = " + ".join(
        f"IF(cd[{i}] > cd[{i + 1}], {w}L, 0L)"
        for i, w in enumerate(_DHASH_WEIGHTS)
        if w
    )
    return with_tot.selectExpr(
        "media_id", "kind", f"({ahash}) AS ahash", f"({dhash}) AS dhash"
    )


_MEDIA_HX_SQL = """
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               hex(encode(text)) AS h,
               octet_length(encode(text)) AS n
        FROM documents
        WHERE octet_length(encode(text)) > 0
"""


def _cells_sql(n_cells: int) -> str:
    return (
        "["
        + ", ".join(
            f"CAST(('0x' || substr(h, CAST(2*(({j}*n)//{n_cells})+1 AS INT),"
            " 2)) AS INT)"
            for j in range(n_cells)
        )
        + "]"
    )


_POW2_SQL = "[" + ", ".join(str(1 << j) for j in range(PHASH_CELLS)) + "]"
_DHW_SQL = "[" + ", ".join(str(w) for w in _DHASH_WEIGHTS) + "]"

_PHASH_SQL = f"""
        SELECT media_id, kind,
               CAST(list_sum(list_transform(
                   generate_series(1, {PHASH_CELLS}),
                   j -> CASE WHEN ca[j] * {PHASH_CELLS} > list_sum(ca)
                             THEN {_POW2_SQL}[j] ELSE 0 END)) AS BIGINT)
                   AS ahash,
               CAST(list_sum(list_transform(
                   generate_series(1, {DHASH_GRID - 1}),
                   i -> CASE WHEN cd[i] > cd[i + 1]
                             THEN {_DHW_SQL}[i] ELSE 0 END)) AS BIGINT)
                   AS dhash
        FROM (
            SELECT media_id, kind, {_cells_sql(PHASH_CELLS)} AS ca,
                   {_cells_sql(DHASH_GRID)} AS cd
            FROM ({_MEDIA_HX_SQL})
        )
"""


def perceptual_ahash_inventory(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash collision inventory per media kind: distinct
    aHash values, exact-collision groups (the byte-identical OR
    perceptually-identical assets), largest group, and the fraction of
    assets sitting in a multi-member group — the quick census that
    says whether perceptual dedup is worth a banding pass at all.

    Two shrinking hash aggregates over a row-local projection; the
    shuffle carries (kind, 32-bit hash)."""
    ph = _perceptual_hashes(spark, sf)
    groups = ph.groupBy("kind", "ahash").agg(F.count("*").alias("sz"))
    return (
        groups.groupBy("kind")
        .agg(
            F.sum("sz").alias("n_media"),
            F.count("*").alias("n_distinct_ahash"),
            F.sum((F.col("sz") > 1).cast("bigint")).alias("n_dup_groups"),
            F.max("sz").alias("max_group_size"),
            F.round(
                F.sum(F.when(F.col("sz") > 1, F.col("sz")).otherwise(0)).cast(
                    "double"
                )
                / F.sum("sz").cast("double"),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("kind")
    )


ORACLE["perceptual_ahash_inventory"] = f"""
    WITH ph AS ({_PHASH_SQL}),
    groups AS (
        SELECT kind, ahash, COUNT(*) AS sz FROM ph GROUP BY kind, ahash
    )
    SELECT kind,
           CAST(SUM(sz) AS BIGINT) AS n_media,
           COUNT(*) AS n_distinct_ahash,
           CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups,
           CAST(MAX(sz) AS BIGINT) AS max_group_size,
           ROUND(CAST(SUM(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(sz) AS DOUBLE), 6) AS dup_frac
    FROM groups GROUP BY kind ORDER BY kind
"""

QUERIES["perceptual_ahash_inventory"] = perceptual_ahash_inventory


def perceptual_hash_band_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Image near-dup candidate funnel: aHash banded into 4x8-bit
    bands, candidates = image pairs agreeing on >= 1 band, verified
    with bit_count(xor).  Pigeonhole: any pair within Hamming distance
    PHASH_HAMMING_MAX (3) differs in <= 3 of the 4 bands, so banding
    has perfect recall there — the simhash_hamming_pairs guarantee
    applied to pixels-stand-in bytes (dedup.py:253).

    100 TB shape: band-bucket equi-join only (never all-pairs); one
    integer op per candidate to verify."""
    img = _perceptual_hashes(spark, sf).filter(F.col("kind") == "image")
    bands = img.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(*[F.lit(b) for b in range(PHASH_BANDS)])
        ).alias("band_idx"),
    ).select(
        "media_id",
        "ahash",
        "band_idx",
        F.expr("(ahash >> (band_idx * 8)) & 255").alias("band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("m_a"),
            F.col("b.media_id").alias("m_b"),
            F.col("a.ahash").alias("h_a"),
            F.col("b.ahash").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return pairs.select(hamming.alias("hamming")).agg(
        F.count("*").alias("n_candidates"),
        F.sum((F.col("hamming") <= PHASH_HAMMING_MAX).cast("bigint")).alias(
            "n_close"
        ),
        F.min("hamming").alias("min_hamming"),
        F.round(F.avg("hamming"), 4).alias("avg_hamming"),
    )


ORACLE["perceptual_hash_band_pairs"] = f"""
    WITH ph AS ({_PHASH_SQL}),
    img AS (SELECT media_id, ahash FROM ph WHERE kind = 'image'),
    bands AS (
        SELECT media_id, ahash, b AS band_idx,
               (ahash >> (b * 8)) & 255 AS band_val
        FROM img, (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS b)
    ),
    pairs AS (
        SELECT DISTINCT a.media_id AS m_a, b.media_id AS m_b,
               a.ahash AS h_a, b.ahash AS h_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.media_id < b.media_id
    )
    SELECT COUNT(*) AS n_candidates,
           CAST(SUM(CASE WHEN bit_count(xor(h_a, h_b)) <= {PHASH_HAMMING_MAX}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
           CAST(MIN(bit_count(xor(h_a, h_b))) AS INT) AS min_hamming,
           ROUND(AVG(bit_count(xor(h_a, h_b))), 4) AS avg_hamming
    FROM pairs
"""

QUERIES["perceptual_hash_band_pairs"] = perceptual_hash_band_pairs


def perceptual_dual_hash_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Dual-hash verification audit on the aHash band candidates: how
    often the two independent perceptual hashes agree that a candidate
    pair is close (both within Hamming 3), vs aHash-only, dHash-only,
    or neither — the precision knob for perceptual dedup (requiring
    both hashes is the standard cheap way to cut aHash's flat-image
    false positives).  Constant-size output over the banded candidate
    set; both hashes ride the same row, so verification adds one more
    integer op per pair."""
    img = _perceptual_hashes(spark, sf).filter(F.col("kind") == "image")
    bands = img.select(
        "media_id",
        "ahash",
        "dhash",
        F.explode(
            F.array(*[F.lit(b) for b in range(PHASH_BANDS)])
        ).alias("band_idx"),
    ).select(
        "media_id",
        "ahash",
        "dhash",
        "band_idx",
        F.expr("(ahash >> (band_idx * 8)) & 255").alias("band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("m_a"),
            F.col("b.media_id").alias("m_b"),
            F.col("a.ahash").alias("ha_a"),
            F.col("b.ahash").alias("ha_b"),
            F.col("a.dhash").alias("hd_a"),
            F.col("b.dhash").alias("hd_b"),
        )
        .distinct()
    )
    close_a = (
        F.bit_count(F.col("ha_a").bitwiseXOR(F.col("ha_b")))
        <= PHASH_HAMMING_MAX
    )
    close_d = (
        F.bit_count(F.col("hd_a").bitwiseXOR(F.col("hd_b")))
        <= PHASH_HAMMING_MAX
    )
    cls = (
        F.when(close_a & close_d, "both_close")
        .when(close_a, "ahash_only")
        .when(close_d, "dhash_only")
        .otherwise("neither")
    )
    return (
        pairs.select(cls.alias("agreement"))
        .groupBy("agreement")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("agreement")
    )


ORACLE["perceptual_dual_hash_agreement"] = f"""
    WITH ph AS ({_PHASH_SQL}),
    img AS (SELECT media_id, ahash, dhash FROM ph WHERE kind = 'image'),
    bands AS (
        SELECT media_id, ahash, dhash, b AS band_idx,
               (ahash >> (b * 8)) & 255 AS band_val
        FROM img, (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS b)
    ),
    pairs AS (
        SELECT DISTINCT a.media_id AS m_a, b.media_id AS m_b,
               a.ahash AS ha_a, b.ahash AS ha_b,
               a.dhash AS hd_a, b.dhash AS hd_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.media_id < b.media_id
    )
    SELECT CASE
             WHEN bit_count(xor(ha_a, ha_b)) <= {PHASH_HAMMING_MAX}
              AND bit_count(xor(hd_a, hd_b)) <= {PHASH_HAMMING_MAX}
                 THEN 'both_close'
             WHEN bit_count(xor(ha_a, ha_b)) <= {PHASH_HAMMING_MAX}
                 THEN 'ahash_only'
             WHEN bit_count(xor(hd_a, hd_b)) <= {PHASH_HAMMING_MAX}
                 THEN 'dhash_only'
             ELSE 'neither' END AS agreement,
           COUNT(*) AS n_pairs
    FROM pairs GROUP BY 1 ORDER BY agreement
"""

QUERIES["perceptual_dual_hash_agreement"] = perceptual_dual_hash_agreement


def perceptual_hash_bit_stability(spark: SparkSession, sf: str) -> DataFrame:
    """Per-bit bias audit of the image aHash: the fraction of images
    with each of the 32 bits set.  A healthy perceptual hash sits near
    0.5 per bit; a bit pinned at 0 or 1 carries no discriminative
    information and silently halves the effective band width — the
    audit that tunes the sampling grid, exactly as lsh_tuning_sweep
    tunes MinHash bands.  Bounded output (32 rows); one explode of a
    32-element literal over the hash projection."""
    img = _perceptual_hashes(spark, sf).filter(F.col("kind") == "image")
    bits = img.select(
        F.explode(
            F.array(*[F.lit(j) for j in range(PHASH_CELLS)])
        ).alias("bit_idx"),
        "ahash",
    ).select(
        "bit_idx", F.expr("(ahash >> bit_idx) & 1").alias("bit")
    )
    return (
        bits.groupBy("bit_idx")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("bit").alias("n_set"),
            F.round(
                F.sum("bit").cast("double") / F.count("*").cast("double"), 6
            ).alias("set_frac"),
        )
        .orderBy("bit_idx")
    )


ORACLE["perceptual_hash_bit_stability"] = f"""
    WITH ph AS ({_PHASH_SQL}),
    img AS (SELECT ahash FROM ph WHERE kind = 'image'),
    bits AS (
        SELECT CAST(j AS INT) AS bit_idx, (ahash >> j) & 1 AS bit
        FROM img, (SELECT unnest(generate_series(0, {PHASH_CELLS - 1})) AS j)
    )
    SELECT bit_idx, COUNT(*) AS n_images,
           CAST(SUM(bit) AS BIGINT) AS n_set,
           ROUND(CAST(SUM(bit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS set_frac
    FROM bits GROUP BY bit_idx ORDER BY bit_idx
"""

QUERIES["perceptual_hash_bit_stability"] = perceptual_hash_bit_stability


# ---------------------------------------------------------------------------
# Round 9: audio-class fingerprinting on byte windows — the binary
# twin of text winnowing (Schleimer et al. 2003, as used by audio
# landmark fingerprinters): hash every FP_GRAM_BYTES-byte gram, take
# the MIN gram-hash per disjoint FP_WINDOW-gram window as that
# window's fingerprint, then pair payloads through an inverted index
# on the fingerprint value.  Fingerprints with document frequency
# above FP_MAX_DF are dropped before pairing (stop-fingerprints:
# common byte runs carry no identity signal and would quadratically
# blow up their bucket — the PPJoin-style frequency cut that keeps
# bucket sizes bounded at any corpus scale).

FP_GRAM_BYTES = 4     # gram width (8 hex chars)
FP_WINDOW = 8         # disjoint grams per fingerprint window
FP_MAX_DF = 16        # drop fingerprints seen in more payloads
FP_STRONG_SHARED = 3  # pairs sharing >= this many fingerprints


def _media_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """(media_id, kind, w, fp): one MIN-gram-hash fingerprint per
    disjoint FP_WINDOW-gram window of each payload.  The gram hash is
    the portable 60-bit md5 hash so the min picks the same gram in
    both engines."""
    from pinterest_data_pipeline6_spark.operators.textops import _h64_spark

    mh = _media_hex(spark, sf).filter(F.col("n") >= FP_GRAM_BYTES)
    grams = mh.select(
        "media_id",
        "kind",
        "hx",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - FP_GRAM_BYTES)
        ).alias("g"),
    ).select(
        "media_id",
        "kind",
        F.floor(F.col("g") / FP_WINDOW).cast("int").alias("w"),
        _h64_spark(
            F.substring(
                "hx", (F.col("g") * 2 + 1).cast("int"), F.lit(2 * FP_GRAM_BYTES)
            )
        ).alias("gh"),
    )
    return grams.groupBy("media_id", "kind", "w").agg(
        F.min("gh").alias("fp")
    )


def _fp_sql() -> str:
    """DuckDB twin of ``_media_fingerprints``."""
    from pinterest_data_pipeline6_spark.operators.textops import H64_SQL

    gram = f"substr(h, CAST(g * 2 + 1 AS INT), {2 * FP_GRAM_BYTES})"
    return f"""
        SELECT media_id, kind, CAST(g // {FP_WINDOW} AS INT) AS w,
               MIN({H64_SQL.format(expr=gram)}) AS fp
        FROM (
            SELECT media_id, kind, h,
                   unnest(generate_series(0, n - {FP_GRAM_BYTES})) AS g
            FROM ({_MEDIA_HX_SQL.replace("octet_length(encode(text)) > 0",
                                         f"octet_length(encode(text)) >= {FP_GRAM_BYTES}")})
        )
        GROUP BY media_id, kind, g // {FP_WINDOW}
    """


def media_fingerprint_minima(spark: SparkSession, sf: str) -> DataFrame:
    """Fingerprint census per media kind: payloads fingerprinted,
    total windows, distinct fingerprint values, and fingerprints per
    payload — the density knob (window width) is tuned off this table
    the way paragraph_df_histogram tunes the boilerplate threshold.

    Linear explode (grams) into a partial-aggregating min per window;
    the shuffle carries (media_id, window, 60-bit hash) only."""
    fps = _media_fingerprints(spark, sf)
    return (
        fps.groupBy("kind")
        .agg(
            F.count_distinct("media_id").alias("n_payloads"),
            F.count("*").alias("n_fingerprints"),
            F.count_distinct("fp").alias("n_distinct_fp"),
            F.round(
                F.count("*").cast("double")
                / F.count_distinct("media_id").cast("double"),
                4,
            ).alias("avg_fp_per_payload"),
        )
        .orderBy("kind")
    )


ORACLE["media_fingerprint_minima"] = f"""
    WITH fps AS ({_fp_sql()})
    SELECT kind,
           CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_payloads,
           COUNT(*) AS n_fingerprints,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / CAST(COUNT(DISTINCT media_id) AS DOUBLE), 4)
               AS avg_fp_per_payload
    FROM fps GROUP BY kind ORDER BY kind
"""

QUERIES["media_fingerprint_minima"] = media_fingerprint_minima


def _audio_fp_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """(m_a, m_b, n_shared): audio payload pairs sharing >= 1 rare
    fingerprint, with the count of DISTINCT shared fingerprint values.
    The df cut runs BEFORE the self-join so every bucket is <=
    FP_MAX_DF wide."""
    fps = (
        _media_fingerprints(spark, sf)
        .filter(F.col("kind") == "audio")
        .select("media_id", "fp")
        .distinct()
    )
    df_ok = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= FP_MAX_DF)
        .select("fp")
    )
    rare = fps.join(df_ok, "fp")
    a, b = rare.alias("a"), rare.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("m_a"),
            F.col("b.media_id").alias("m_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )


_AUDIO_FP_PAIRS_SQL = f"""
    fps AS (
        SELECT DISTINCT media_id, fp FROM ({_fp_sql()})
        WHERE kind = 'audio'
    ),
    df_ok AS (
        SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {FP_MAX_DF}
    ),
    rare AS (SELECT media_id, fp FROM fps JOIN df_ok USING (fp)),
    pairs AS (
        SELECT a.media_id AS m_a, b.media_id AS m_b,
               COUNT(*) AS n_shared
        FROM rare a JOIN rare b
          ON a.fp = b.fp AND a.media_id < b.media_id
        GROUP BY a.media_id, b.media_id
    )
"""


def media_fingerprint_band_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Audio near-dup candidate funnel through the fingerprint
    inverted index: candidate pairs (>= 1 shared rare fingerprint),
    strong pairs (>= FP_STRONG_SHARED shared), and the shared-count
    profile.  100 TB shape: the join key is the fingerprint value with
    buckets pre-capped at FP_MAX_DF, so candidate generation is
    bounded per bucket — never all-pairs, same guarantee as MinHash
    banding."""
    pairs = _audio_fp_pairs(spark, sf)
    return pairs.agg(
        F.count("*").alias("n_candidate_pairs"),
        F.sum(
            (F.col("n_shared") >= FP_STRONG_SHARED).cast("bigint")
        ).alias("n_strong_pairs"),
        F.max("n_shared").alias("max_shared"),
        F.round(F.avg("n_shared"), 4).alias("avg_shared"),
    )


ORACLE["media_fingerprint_band_pairs"] = f"""
    WITH {_AUDIO_FP_PAIRS_SQL}
    SELECT COUNT(*) AS n_candidate_pairs,
           CAST(SUM(CASE WHEN n_shared >= {FP_STRONG_SHARED} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_strong_pairs,
           CAST(MAX(n_shared) AS BIGINT) AS max_shared,
           ROUND(AVG(n_shared), 4) AS avg_shared
    FROM pairs
"""

QUERIES["media_fingerprint_band_pairs"] = media_fingerprint_band_pairs


def media_fingerprint_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Containment histogram for the audio fingerprint candidates:
    shared / min(|fp_a|, |fp_b|) over rare fingerprints, banded into
    quarters with EXACT integer comparisons (4*s vs m boundaries — no
    float thresholds to diverge between engines).  High containment +
    low Jaccard is the clip-inside-a-longer-recording signature, which
    is why containment (not Jaccard) is the audio-dedup verdict."""
    pairs = _audio_fp_pairs(spark, sf)
    fps = (
        _media_fingerprints(spark, sf)
        .filter(F.col("kind") == "audio")
        .select("media_id", "fp")
        .distinct()
    )
    df_ok = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= FP_MAX_DF)
        .select("fp")
    )
    sizes = (
        fps.join(df_ok, "fp")
        .groupBy("media_id")
        .agg(F.count("*").alias("nfp"))
    )
    j = (
        pairs.join(sizes.select(F.col("media_id").alias("m_a"),
                                F.col("nfp").alias("nfp_a")), "m_a")
        .join(sizes.select(F.col("media_id").alias("m_b"),
                           F.col("nfp").alias("nfp_b")), "m_b")
        .select(
            "n_shared",
            F.least("nfp_a", "nfp_b").alias("m"),
        )
    )
    s, m = F.col("n_shared"), F.col("m")
    bucket = (
        F.when(4 * s < m, "c0_lt25")
        .when(2 * s < m, "c1_lt50")
        .when(4 * s < 3 * m, "c2_lt75")
        .otherwise("c3_ge75")
    )
    return (
        j.select(bucket.alias("containment_band"))
        .groupBy("containment_band")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("containment_band")
    )


ORACLE["media_fingerprint_containment"] = f"""
    WITH {_AUDIO_FP_PAIRS_SQL},
    sizes AS (
        SELECT media_id, COUNT(*) AS nfp
        FROM rare GROUP BY media_id
    ),
    j AS (
        SELECT n_shared, LEAST(sa.nfp, sb.nfp) AS m
        FROM pairs
        JOIN sizes sa ON pairs.m_a = sa.media_id
        JOIN sizes sb ON pairs.m_b = sb.media_id
    )
    SELECT CASE WHEN 4 * n_shared < m THEN 'c0_lt25'
                WHEN 2 * n_shared < m THEN 'c1_lt50'
                WHEN 4 * n_shared < 3 * m THEN 'c2_lt75'
                ELSE 'c3_ge75' END AS containment_band,
           COUNT(*) AS n_pairs
    FROM j GROUP BY 1 ORDER BY containment_band
"""

QUERIES["media_fingerprint_containment"] = media_fingerprint_containment


def media_meta_consistency(spark: SparkSession, sf: str) -> DataFrame:
    """Metadata-vs-payload validation per media kind: zero-dimension
    assets, metadata/payload contract violations (duration_ms must be
    10x the payload byte count for this generator; real pipelines pin
    the analogous codec-header-vs-bytes contract), and the
    portrait/landscape split — the multimodal twin of dq_expectations.
    One pass, row-local predicates, bounded output."""
    media = synthesize_media(spark, sf)
    n = F.length("payload").cast("long")
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum((F.col("meta.width") == 0).cast("bigint")).alias(
                "n_zero_width"
            ),
            F.sum((F.col("meta.height") == 0).cast("bigint")).alias(
                "n_zero_height"
            ),
            F.sum(
                (F.col("meta.duration_ms") != n * 10).cast("bigint")
            ).alias("n_duration_mismatch"),
            F.sum(
                (F.col("meta.height") > F.col("meta.width")).cast("bigint")
            ).alias("n_portrait"),
        )
        .orderBy("kind")
    )


ORACLE["media_meta_consistency"] = """
    WITH media AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               CAST(n_chars % 640 AS INT) AS width,
               CAST(n_chars % 480 AS INT) AS height,
               CAST(n_chars * 10 AS INT) AS duration_ms,
               octet_length(encode(text)) AS n
        FROM documents
    )
    SELECT kind, COUNT(*) AS n_media,
           CAST(SUM(CASE WHEN width = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_width,
           CAST(SUM(CASE WHEN height = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_height,
           CAST(SUM(CASE WHEN duration_ms != n * 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_duration_mismatch,
           CAST(SUM(CASE WHEN height > width THEN 1 ELSE 0 END) AS BIGINT)
               AS n_portrait
    FROM media GROUP BY kind ORDER BY kind
"""

QUERIES["media_meta_consistency"] = media_meta_consistency


def perceptual_dup_survivorship(spark: SparkSession, sf: str) -> DataFrame:
    """Storage-reclaim accounting for perceptually-identical assets:
    within each exact-aHash group the canonical survivor is the lowest
    media_id; every other member's payload bytes are reclaimable — the
    perceptual twin of media_content_dedup (which needs byte-identical
    payloads; aHash groups also capture re-encoded/resampled copies
    whose bytes differ but whose sampled matrix does not).

    Two shrinking aggregates keyed on (kind, ahash); the min-survivor
    pick is an exact integer min inside the same agg — no second
    pass."""
    ph = _perceptual_hashes(spark, sf)
    sized = ph.join(
        _media_hex(spark, sf).select("media_id", "n"), "media_id"
    )
    groups = sized.groupBy("kind", "ahash").agg(
        F.count("*").alias("sz"),
        F.sum("n").alias("bytes_total"),
        F.min(F.struct("media_id", "n")).alias("survivor"),
    )
    return (
        groups.groupBy("kind")
        .agg(
            F.sum("sz").alias("n_media"),
            F.sum((F.col("sz") - 1)).alias("n_removable"),
            F.sum("bytes_total").alias("bytes_total"),
            F.sum(
                F.col("bytes_total") - F.col("survivor.n")
            ).alias("bytes_reclaimable"),
        )
        .orderBy("kind")
    )


ORACLE["perceptual_dup_survivorship"] = f"""
    WITH ph AS ({_PHASH_SQL}),
    sized AS (
        SELECT ph.media_id, ph.kind, ph.ahash, hx.n
        FROM ph JOIN ({_MEDIA_HX_SQL}) hx ON ph.media_id = hx.media_id
    ),
    groups AS (
        SELECT kind, ahash, COUNT(*) AS sz,
               CAST(SUM(n) AS BIGINT) AS bytes_total,
               MIN({{'media_id': media_id, 'n': n}}) AS survivor
        FROM sized GROUP BY kind, ahash
    )
    SELECT kind,
           CAST(SUM(sz) AS BIGINT) AS n_media,
           CAST(SUM(sz - 1) AS BIGINT) AS n_removable,
           CAST(SUM(bytes_total) AS BIGINT) AS bytes_total,
           CAST(SUM(bytes_total - survivor.n) AS BIGINT)
               AS bytes_reclaimable
    FROM groups GROUP BY kind ORDER BY kind
"""

QUERIES["perceptual_dup_survivorship"] = perceptual_dup_survivorship


def fingerprint_df_spectrum(spark: SparkSession, sf: str) -> DataFrame:
    """Fingerprint document-frequency spectrum: for each df (number of
    distinct payloads sharing a fingerprint), how many distinct
    fingerprints sit there and their occurrence mass — the table that
    tunes FP_MAX_DF, exactly as paragraph_df_histogram tunes the
    boilerplate threshold: the stop cut should sit past the knee where
    identity signal ends and common-byte-run mass begins.

    Two strictly shrinking aggregates (fingerprints -> per-value df ->
    per-df rollup); output bounded by the df range."""
    fps = _media_fingerprints(spark, sf).select("media_id", "fp").distinct()
    per_fp = fps.groupBy("fp").agg(F.count("*").alias("df"))
    return (
        per_fp.groupBy("df")
        .agg(F.count("*").alias("n_fingerprints"))
        .select(
            "df",
            "n_fingerprints",
            (F.col("df") * F.col("n_fingerprints")).alias("occurrence_mass"),
        )
        .orderBy("df")
    )


ORACLE["fingerprint_df_spectrum"] = f"""
    WITH fps AS (
        SELECT DISTINCT media_id, fp FROM ({_fp_sql()})
    ),
    per_fp AS (SELECT fp, COUNT(*) AS df FROM fps GROUP BY fp)
    SELECT df, COUNT(*) AS n_fingerprints,
           CAST(df * COUNT(*) AS BIGINT) AS occurrence_mass
    FROM per_fp GROUP BY df ORDER BY df
"""

QUERIES["fingerprint_df_spectrum"] = fingerprint_df_spectrum


def perceptual_band_selectivity(spark: SparkSession, sf: str) -> DataFrame:
    """Banding-cost planner for the perceptual hash join: per band
    index, the buckets in use, the largest bucket, and the exact
    candidate-pair mass each band would generate (sum of sz*(sz-1)/2
    over its buckets) — the number that prices the band join BEFORE
    running it, exactly as lsh_bucket_histogram prices MinHash bands.
    A band whose pair mass explodes (too few effective bits — see
    perceptual_hash_bit_stability) is the one to re-sample or widen.

    Bounded output (PHASH_BANDS rows); two shrinking aggregates."""
    img = _perceptual_hashes(spark, sf).filter(F.col("kind") == "image")
    bands = img.select(
        F.explode(
            F.array(*[F.lit(b) for b in range(PHASH_BANDS)])
        ).alias("band_idx"),
        "ahash",
    ).select(
        "band_idx", F.expr("(ahash >> (band_idx * 8)) & 255").alias("band_val")
    )
    buckets = bands.groupBy("band_idx", "band_val").agg(
        F.count("*").alias("sz")
    )
    return (
        buckets.groupBy("band_idx")
        .agg(
            F.count("*").alias("n_buckets_used"),
            F.max("sz").alias("max_bucket"),
            F.sum(
                (F.col("sz") * (F.col("sz") - 1) / 2).cast("bigint")
            ).alias("candidate_pairs"),
        )
        .orderBy("band_idx")
    )


ORACLE["perceptual_band_selectivity"] = f"""
    WITH ph AS ({_PHASH_SQL}),
    bands AS (
        SELECT CAST(b AS INT) AS band_idx,
               (ahash >> (b * 8)) & 255 AS band_val
        FROM (SELECT ahash FROM ph WHERE kind = 'image'),
             (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS b)
    ),
    buckets AS (
        SELECT band_idx, band_val, COUNT(*) AS sz
        FROM bands GROUP BY band_idx, band_val
    )
    SELECT band_idx, COUNT(*) AS n_buckets_used,
           CAST(MAX(sz) AS BIGINT) AS max_bucket,
           CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM buckets GROUP BY band_idx ORDER BY band_idx
"""

QUERIES["perceptual_band_selectivity"] = perceptual_band_selectivity


def video_frame_dedup_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-level dedup accounting over the video frame-sampler's
    output: distinct frame payloads vs total sampled frames, frames
    appearing in more than one video, and the byte mass a frame-store
    would reclaim — title cards, black frames, and shared intros are
    exactly this shape in a real corpus.  Because the sampler is the
    deterministic 32-byte/every-4th chop (frame_sample_accounting's
    contract), the DuckDB oracle reproduces every sampled frame as a
    text substring and verifies the WHOLE fan-out + dedup pipeline —
    the strongest oracle a mapInPandas fan-out can get.

    Scale shape: frames group on their md5 digest (16 bytes per frame
    through the shuffle, payload bytes stay in the scan-side Arrow
    batches); two shrinking aggregates."""
    frames = sample_frames(synthesize_media(spark, sf))
    groups = (
        frames.select(
            F.md5(F.col("frame").cast("string")).alias("digest"),
            F.length("frame").alias("nbytes"),
            "media_id",
        )
        .groupBy("digest")
        .agg(
            F.count("*").alias("cnt"),
            F.max("nbytes").alias("nbytes"),
            F.count_distinct("media_id").alias("nvid"),
        )
    )
    return groups.agg(
        F.sum("cnt").alias("n_frames"),
        F.count("*").alias("n_distinct_frames"),
        F.sum((F.col("nvid") > 1).cast("bigint")).alias("n_cross_video"),
        F.sum((F.col("cnt") - 1) * F.col("nbytes")).alias(
            "bytes_reclaimable"
        ),
    )


ORACLE["video_frame_dedup_stats"] = """
    WITH vids AS (
        SELECT doc_id, text, strlen(text) AS len,
               CAST(CEIL(strlen(text) / 32.0) AS BIGINT) AS nf
        FROM documents
        WHERE doc_id % 3 = 2 AND strlen(text) > 0
    ),
    frames AS (
        SELECT doc_id,
               substr(text, CAST(i * 32 + 1 AS INT), 32) AS frame_txt
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(0, nf - 1, 4)) AS i
            FROM vids
        )
    ),
    groups AS (
        SELECT md5(frame_txt) AS digest, COUNT(*) AS cnt,
               MAX(strlen(frame_txt)) AS nbytes,
               COUNT(DISTINCT doc_id) AS nvid
        FROM frames GROUP BY md5(frame_txt)
    )
    SELECT CAST(SUM(cnt) AS BIGINT) AS n_frames,
           COUNT(*) AS n_distinct_frames,
           CAST(SUM(CASE WHEN nvid > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cross_video,
           CAST(SUM((cnt - 1) * nbytes) AS BIGINT) AS bytes_reclaimable
    FROM groups
"""

QUERIES["video_frame_dedup_stats"] = video_frame_dedup_stats


# ---------------------------------------------------------------------------
# Round 10: cross-modal pair operators — joining the r9 perceptual /
# fingerprint machinery to the text side.  A media asset's caption is
# the text of its source document (media_id == doc_id), so every
# (media, caption) pair question becomes a JOIN OF CANDIDATE SETS:
# the media near-dup candidates (aHash band pairs, Hamming-verified)
# against the caption near-dup candidates (MinHash/LSH band pairs).
#
# 100 TB shape: both candidate sets are band-bucket equi-joins (never
# all-pairs), each sub-O(n^2) by construction; the cross-modal step
# is then an equi-join of two already-sparse pair sets on the pair
# key — the cheapest join in the whole pipeline.  No new shuffle
# pattern is introduced: this is candidate-set intersection, the same
# shape as dual-hash agreement but across modalities.

PHASH_ALL_BANDS_HAMMING = PHASH_HAMMING_MAX


def _crossmodal_media_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """(kind, m_a, m_b): perceptual near-dup media pairs across ALL
    kinds — the aHash band join keyed on (kind, band, value) so pairs
    stay within a modality, verified at Hamming <= 3.

    The hash inventory is localCheckpoint-ed (lazily, the
    minhash-signature sharing precedent in dedup.py) so the byte-cell
    hash expressions run once, not once per self-join side — in
    production the inventory is a persisted table anyway."""
    ph = _perceptual_hashes(spark, sf).localCheckpoint(eager=False)
    bands = ph.select(
        "media_id",
        "kind",
        "ahash",
        F.explode(
            F.array(*[F.lit(b) for b in range(PHASH_BANDS)])
        ).alias("band_idx"),
    ).select(
        "media_id",
        "kind",
        "ahash",
        "band_idx",
        F.expr("(ahash >> (band_idx * 8)) & 255").alias("band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    # Hamming is verified BEHIND the pair aggregate, never as a bare
    # filter over the distinct pairs: a filter on grouping columns
    # pushes through the aggregate INTO the join condition (the
    # inline-verification anti-pattern dedup.py's PPJoin documents as
    # 8x worse — measured here as a pathological plan at sf0.1).
    # min(ham) over band duplicates of one pair is the pair's hamming.
    pairs = a.join(
        b,
        (F.col("a.kind") == F.col("b.kind"))
        & (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.media_id") < F.col("b.media_id")),
    ).select(
        F.col("a.kind").alias("kind"),
        F.col("a.media_id").alias("m_a"),
        F.col("b.media_id").alias("m_b"),
        F.bit_count(
            F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))
        ).alias("ham"),
    )
    return (
        pairs.groupBy("kind", "m_a", "m_b")
        .agg(F.min("ham").alias("ham"))
        .filter(F.col("ham") <= PHASH_ALL_BANDS_HAMMING)
        .select("kind", "m_a", "m_b")
    )


_MPAIRS_SQL = f"""
    mbands AS (
        SELECT media_id, kind, ahash, b AS band_idx,
               (ahash >> (b * 8)) & 255 AS band_val
        FROM ph, (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS b)
    ),
    mclose AS (
        SELECT kind, m_a, m_b FROM (
            SELECT DISTINCT a.kind AS kind, a.media_id AS m_a,
                   b.media_id AS m_b, a.ahash AS h_a, b.ahash AS h_b
            FROM mbands a JOIN mbands b
              ON a.kind = b.kind AND a.band_idx = b.band_idx
             AND a.band_val = b.band_val AND a.media_id < b.media_id
        ) WHERE bit_count(xor(h_a, h_b)) <= {PHASH_ALL_BANDS_HAMMING}
    )
"""

_TPAIRS_SQL = """
    tpairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
"""


def crossmodal_pair_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Image-text PAIR dedup decision table: per media kind, how many
    pairs each modality's candidate generator proposes and how many
    survive the cross-modal rule — a (media, caption) pair is a
    duplicate only if BOTH the payloads are perceptual near-dups AND
    the captions are LSH candidates (band-set intersection).  The
    both_rate column is the precision the caption signal adds on top
    of the pixel signal — the knob a multimodal curation pipeline
    tunes before collapsing pairs."""
    from pinterest_data_pipeline6_spark.operators.dedup import (
        minhash_band_pairs,
    )

    # both candidate-pair sets feed two consumers each (the tagged
    # union and the intersection) — lazy localCheckpoints run each
    # generator once (the dedup.py signature-sharing precedent)
    mpairs = _crossmodal_media_pairs(spark, sf).localCheckpoint(
        eager=False
    )
    tp = minhash_band_pairs(spark, sf)
    # same-kind caption pairs (kind is doc_id % 3, the media synthesis
    # rule) so the three sets are comparable per modality
    kind_of = lambda c: (
        F.when(F.col(c) % 3 == 0, F.lit("image"))
        .when(F.col(c) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    tpk = (
        tp.filter((F.col("doc_a") % 3) == (F.col("doc_b") % 3))
        .select(kind_of("doc_a").alias("kind"), "doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    both = mpairs.join(
        tpk.select(
            F.col("kind").alias("kind"),
            F.col("doc_a").alias("m_a"),
            F.col("doc_b").alias("m_b"),
        ),
        ["kind", "m_a", "m_b"],
    )
    tagged = (
        mpairs.select("kind", F.lit(1).alias("mc"), F.lit(0).alias("tc"), F.lit(0).alias("bc"))
        .unionByName(
            tpk.select("kind", F.lit(0).alias("mc"), F.lit(1).alias("tc"), F.lit(0).alias("bc"))
        )
        .unionByName(
            both.select("kind", F.lit(0).alias("mc"), F.lit(0).alias("tc"), F.lit(1).alias("bc"))
        )
    )
    return (
        tagged.groupBy("kind")
        .agg(
            F.sum("mc").alias("n_media_close"),
            F.sum("tc").alias("n_caption_pairs"),
            F.sum("bc").alias("n_both"),
            F.round(
                F.sum("bc").cast("double")
                / F.nullif(F.sum("mc"), F.lit(0)).cast("double"),
                6,
            ).alias("both_rate"),
        )
        .orderBy("kind")
    )


def _kind_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} % 3 = 0 THEN 'image' "
        f"WHEN {col} % 3 = 1 THEN 'audio' ELSE 'video' END"
    )


def _crossmodal_oracle_prefix() -> str:
    from pinterest_data_pipeline6_spark.operators.dedup import (
        _BAND_SQL,
        _SIG_SQL,
    )

    return f"""
    WITH ph AS ({_PHASH_SQL}),
    {_MPAIRS_SQL.strip().rstrip()},
    sig AS ({_SIG_SQL}),
    banded AS ({_BAND_SQL}),
    {_TPAIRS_SQL.strip()},
    tpk AS (
        SELECT {_kind_sql('doc_a')} AS kind, doc_a, doc_b
        FROM tpairs WHERE doc_a % 3 = doc_b % 3
    )
"""


ORACLE["crossmodal_pair_dedup"] = (
    _crossmodal_oracle_prefix()
    + """
    , tagged AS (
        SELECT kind, 1 AS mc, 0 AS tc, 0 AS bc FROM mclose
        UNION ALL
        SELECT kind, 0 AS mc, 1 AS tc, 0 AS bc FROM tpk
        UNION ALL
        SELECT m.kind, 0 AS mc, 0 AS tc, 1 AS bc
        FROM mclose m JOIN tpk t
          ON m.kind = t.kind AND m.m_a = t.doc_a AND m.m_b = t.doc_b
    )
    SELECT kind,
           CAST(SUM(mc) AS BIGINT) AS n_media_close,
           CAST(SUM(tc) AS BIGINT) AS n_caption_pairs,
           CAST(SUM(bc) AS BIGINT) AS n_both,
           ROUND(CAST(SUM(bc) AS DOUBLE)
                 / CAST(NULLIF(SUM(mc), 0) AS DOUBLE), 6) AS both_rate
    FROM tagged GROUP BY kind ORDER BY kind
"""
)

QUERIES["crossmodal_pair_dedup"] = crossmodal_pair_dedup


def caption_media_consistency(spark: SparkSession, sf: str) -> DataFrame:
    """Caption-media consistency audit: for every perceptual media
    near-dup pair, do the captions agree?  Per kind: pairs, pairs
    whose captions are byte-identical (md5), pairs whose captions are
    at least LSH near-dup candidates, and the near-consistency rate.
    Low consistency means the pixel-side near-dups carry different
    text — exactly the pairs a contrastive image-text trainer must
    NOT collapse (they are hard negatives, not duplicates)."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    from pinterest_data_pipeline6_spark.operators.dedup import (
        minhash_band_pairs,
    )

    mpairs = _crossmodal_media_pairs(spark, sf)
    dig = docs.select("doc_id", F.md5("text").alias("digest"))
    tp = minhash_band_pairs(spark, sf).withColumn("near", F.lit(1))
    joined = (
        mpairs.join(
            dig.select(
                F.col("doc_id").alias("m_a"), F.col("digest").alias("dig_a")
            ),
            "m_a",
        )
        .join(
            dig.select(
                F.col("doc_id").alias("m_b"), F.col("digest").alias("dig_b")
            ),
            "m_b",
        )
        .join(
            tp.select(
                F.col("doc_a").alias("m_a"),
                F.col("doc_b").alias("m_b"),
                "near",
            ),
            ["m_a", "m_b"],
            "left",
        )
    )
    return (
        joined.groupBy("kind")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                (F.col("dig_a") == F.col("dig_b")).cast("long")
            ).alias("n_caption_exact"),
            F.sum(F.coalesce(F.col("near"), F.lit(0)).cast("long")).alias(
                "n_caption_near"
            ),
            F.round(
                F.sum(F.coalesce(F.col("near"), F.lit(0))).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("consistency_rate"),
        )
        .orderBy("kind")
    )


ORACLE["caption_media_consistency"] = (
    _crossmodal_oracle_prefix()
    + """
    , joined AS (
        SELECT m.kind,
               da.digest AS dig_a, db.digest AS dig_b,
               CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS near
        FROM mclose m
        JOIN (SELECT doc_id, md5(text) AS digest FROM documents) da
          ON da.doc_id = m.m_a
        JOIN (SELECT doc_id, md5(text) AS digest FROM documents) db
          ON db.doc_id = m.m_b
        LEFT JOIN tpairs t ON t.doc_a = m.m_a AND t.doc_b = m.m_b
    )
    SELECT kind,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN dig_a = dig_b THEN 1 ELSE 0 END) AS BIGINT)
               AS n_caption_exact,
           CAST(SUM(near) AS BIGINT) AS n_caption_near,
           ROUND(CAST(SUM(near) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS consistency_rate
    FROM joined GROUP BY kind ORDER BY kind
"""
)

QUERIES["caption_media_consistency"] = caption_media_consistency


def crossmodal_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-modal benchmark contamination: training media whose
    payload BYTES contain any 4-byte gram of a benchmark caption
    (sources src0/src1 — the decontamination_overlap split applied
    across modalities).  A benchmark caption leaking into a training
    payload would defeat text-side decontamination because the leak
    is on the wrong modality; this closes that hole.

    Plan: benchmark caption gram hashes (small, deduped) BROADCAST
    into a left-semi join against the training payloads'
    window-minimum fingerprints (a fingerprint is itself a gram hash,
    so any matching window proves a shared gram); payload bytes never
    shuffle."""
    from pinterest_data_pipeline6_spark.operators.privacy import (
        BENCHMARK_SOURCES,
    )
    from pinterest_data_pipeline6_spark.operators.textops import _h64_spark

    docs = widen_small_scan(table(spark, sf, "documents"))
    src = docs.select("doc_id", "source")
    bench_hx = (
        docs.filter(F.col("source").isin(*BENCHMARK_SOURCES))
        .select(
            F.hex(F.encode("text", "utf-8")).alias("hx"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n"),
        )
        .filter(F.col("n") >= FP_GRAM_BYTES)
    )
    bench_grams = (
        bench_hx.select(
            "hx",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - FP_GRAM_BYTES)
            ).alias("g"),
        )
        .select(
            _h64_spark(
                F.substring(
                    "hx",
                    (F.col("g") * 2 + 1).cast("int"),
                    F.lit(2 * FP_GRAM_BYTES),
                )
            ).alias("fp")
        )
        .distinct()
    )
    train_fps = _media_fingerprints(spark, sf).join(
        src.withColumnRenamed("doc_id", "media_id"), "media_id"
    ).filter(~F.col("source").isin(*BENCHMARK_SOURCES))
    hits = (
        train_fps.join(F.broadcast(bench_grams), "fp", "left_semi")
        .select("media_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train_media = (
        _media_hex(spark, sf)
        .join(src.withColumnRenamed("doc_id", "media_id"), "media_id")
        .filter(~F.col("source").isin(*BENCHMARK_SOURCES))
        .select("media_id", "kind")
    )
    return (
        train_media.join(hits, "media_id", "left")
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_train_media"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("long")).alias(
                "n_contaminated"
            ),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("contamination_rate"),
        )
        .orderBy("kind")
    )


def _crossmodal_contam_oracle() -> str:
    from pinterest_data_pipeline6_spark.operators.privacy import (
        BENCHMARK_SOURCES,
    )
    from pinterest_data_pipeline6_spark.operators.textops import H64_SQL

    bench_in = ", ".join(f"'{s}'" for s in BENCHMARK_SOURCES)
    gram = f"substr(h, CAST(g * 2 + 1 AS INT), {2 * FP_GRAM_BYTES})"
    return f"""
    WITH fps AS ({_fp_sql()}),
    src AS (SELECT doc_id, source FROM documents),
    bench_grams AS (
        SELECT DISTINCT {H64_SQL.format(expr=gram)} AS fp
        FROM (
            SELECT h, unnest(generate_series(0, n - {FP_GRAM_BYTES})) AS g
            FROM (
                SELECT hex(encode(text)) AS h,
                       octet_length(encode(text)) AS n
                FROM documents WHERE source IN ({bench_in})
            ) WHERE n >= {FP_GRAM_BYTES}
        )
    ),
    hits AS (
        SELECT DISTINCT f.media_id
        FROM fps f
        JOIN src s ON s.doc_id = f.media_id
            AND s.source NOT IN ({bench_in})
        WHERE f.fp IN (SELECT fp FROM bench_grams)
    ),
    train_media AS (
        SELECT m.media_id, m.kind
        FROM ({_MEDIA_HX_SQL}) m
        JOIN src s ON s.doc_id = m.media_id
        WHERE s.source NOT IN ({bench_in})
    )
    SELECT kind,
           COUNT(*) AS n_train_media,
           CAST(SUM(CASE WHEN h.media_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           ROUND(CAST(SUM(CASE WHEN h.media_id IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS contamination_rate
    FROM train_media t LEFT JOIN hits h ON h.media_id = t.media_id
    GROUP BY kind ORDER BY kind
"""


ORACLE["crossmodal_contamination"] = _crossmodal_contam_oracle()
QUERIES["crossmodal_contamination"] = crossmodal_contamination
