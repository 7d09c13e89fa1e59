"""End-to-end corpus curation pipeline — the flagship composition of
the training-data operator families into ONE dataflow:

    normalize → quality filter → exact dedup (digest representative)
    → MinHash/LSH near-dup collapse → stratified hash sample
    → per-(lang, source) accounting

Every stage is the production pattern at 100 TB:

- **normalize/quality**: map-only projections and per-cell metrics —
  no shuffle, full codegen; rejected docs never reach a shuffle.
- **exact dedup**: representative-per-digest via min-aggregate on the
  16-byte digest (the shuffle carries digests + doc_ids, never text).
- **near-dup collapse**: MinHash signatures (one explode + one min
  agg) → band-key self-join among exact representatives only; a doc is
  dropped when ANY band bucket contains a smaller surviving doc_id
  (min-id representative policy — the standard LSH dedup decision,
  pairwise, no transitive closure needed, so no iteration).
- **stratified sample**: hash-gated Bernoulli per language stratum —
  map-only, reproducible across runs and engines, auditable.
- **accounting**: one hash agg emits the per-stage funnel so the run
  itself produces its dataset card.

The whole pipeline is Catalyst-native (the heaviest Python object in
the plan is nothing — there are no UDFs) and has a line-by-line DuckDB
oracle twin below, which makes the funnel numbers an engine-level
correctness contract rather than a trust-me metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pinterest_data_pipeline6_spark.operators.dedup import (
    MINHASH_P,
    N_BANDS,
    N_MINHASH,
    ROWS_PER_BAND,
    _MINHASH_A,
    _MINHASH_B,
    _exploded_shingles,
)
from pinterest_data_pipeline6_spark.operators.textops import (
    H64_SQL,
    SAMPLE_DEFAULT_THRESHOLD,
    SAMPLE_THRESHOLDS,
    _h64_spark,
)
from pinterest_data_pipeline6_spark.sources.readers import table, widen_small_scan

MIN_TOKENS = 15
MIN_DISTINCT_RATIO = 0.3


def _quality_flags(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source, norm, passed_quality): normalization plus
    the cheap per-cell quality gate (length + lexical diversity)."""
    norm = F.lower(F.trim(F.col("text")))
    toks = F.split(norm, " ")
    n_tok = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    return docs.select(
        "doc_id",
        "lang",
        "source",
        norm.alias("norm"),
        ((n_tok >= MIN_TOKENS) & (distinct_ratio >= MIN_DISTINCT_RATIO)).alias(
            "passed_quality"
        ),
    )


def _band_keys(sig: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) — md5 over each band's minhash row."""
    keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"m_{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                )
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.posexplode(keys).alias("band_idx", "band_key"))


def corpus_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The full curation funnel per (lang, source): raw → quality →
    exact-dedup representative → near-dup survivor → sampled, plus the
    final kept-token count. See module docstring for the stage-by-stage
    scale rationale."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    q = _quality_flags(docs)

    # exact representative: min doc_id per digest among quality passers
    digest = F.md5("norm")
    w = Window.partitionBy("digest").orderBy("doc_id")
    exact = (
        q.filter("passed_quality")
        .withColumn("digest", digest)
        .withColumn("is_exact_rep", F.row_number().over(w) == 1)
    )

    # near-dup collapse among exact representatives: minhash → bands →
    # a doc is dominated if any band bucket holds a smaller doc_id
    reps = exact.filter("is_exact_rep").select("doc_id", "norm")
    shingled = _exploded_shingles(
        reps.select("doc_id", F.col("norm").alias("text")), "doc_id"
    )
    base = (_h64_spark(F.col("shingle")) % MINHASH_P).alias("hb")
    sig = (
        shingled.select("doc_id", base)
        .groupBy("doc_id")
        .agg(
            *[
                F.min((F.col("hb") * _MINHASH_A[i] + _MINHASH_B[i]) % MINHASH_P).alias(
                    f"m_{i}"
                )
                for i in range(N_MINHASH)
            ]
        )
    )
    banded = _band_keys(sig)
    a, b = banded.alias("a"), banded.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    # docs with <3 tokens have no shingles → no signature → cannot be
    # dominated (kept), same on both engines

    # stratified hash sample over near-dup survivors
    hex2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thr = F.lit(SAMPLE_DEFAULT_THRESHOLD)
    for lang, t in SAMPLE_THRESHOLDS.items():
        thr = F.when(F.col("lang") == lang, t).otherwise(thr)

    flags = (
        exact.join(dominated.withColumn("is_dominated", F.lit(True)), "doc_id", "left")
        .withColumn("survives_neardup", F.col("is_exact_rep") & F.col("is_dominated").isNull())
        .withColumn("sampled", F.col("survives_neardup") & (hex2 < thr))
    )

    # funnel accounting: quality passers come from `exact`; raw counts
    # need the rejected docs too, so re-join onto the full quality table
    funnel = q.join(
        flags.select("doc_id", "is_exact_rep", "survives_neardup", "sampled"),
        "doc_id",
        "left",
    )
    return (
        funnel.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_raw"),
            F.sum(F.col("passed_quality").cast("int")).alias("n_quality"),
            F.sum(F.coalesce(F.col("is_exact_rep").cast("int"), F.lit(0))).alias(
                "n_exact_reps"
            ),
            F.sum(F.coalesce(F.col("survives_neardup").cast("int"), F.lit(0))).alias(
                "n_neardup_kept"
            ),
            F.sum(F.coalesce(F.col("sampled").cast("int"), F.lit(0))).alias("n_sampled"),
            F.sum(
                F.when(
                    F.coalesce(F.col("sampled"), F.lit(False)),
                    F.size(F.split("norm", " ")),
                ).otherwise(0)
            ).alias("n_kept_tokens"),
        )
        .orderBy("lang", "source")
    )


N_EXPORT_SHARDS = 32


def _shard_col() -> "F.Column":
    """Portable deterministic shard id: h64(doc_id) mod N_EXPORT_SHARDS.
    Content-stable (same doc → same shard on every run and engine),
    unlike hash()/rand()-based assignment."""
    return F.pmod(
        _h64_spark(F.col("doc_id").cast("string")), F.lit(N_EXPORT_SHARDS)
    ).cast("int")


def export_shard_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Shard-assignment accounting for training-data export: per shard,
    document and token counts. Hash sharding is the last stage of every
    curation pipeline — training jobs read shard files round-robin, so
    shard balance IS the loader's load balance. The histogram is the
    auditable check that the hash spreads evenly (a skewed shard means a
    straggler reader every epoch).

    Map-only assignment + one small aggregate; at 100 TB the companion
    ``write_training_shards`` writes the same assignment as a
    hive-partitioned layout with one shuffle on the shard key."""
    docs = table(spark, sf, "documents")
    return (
        docs.select(
            _shard_col().alias("shard"),
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .orderBy("shard")
    )


def write_training_shards(docs: DataFrame, path: str) -> int:
    """Materialize the hash-shard export layout: repartition on the
    shard id (one shuffle, co-locating each shard's docs into one task)
    then hive-partition by ``shard`` so readers open exactly the shards
    they own. Returns the number of shard directories written."""
    sharded = docs.withColumn("shard", _shard_col())
    (
        sharded.repartition(N_EXPORT_SHARDS, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    from pathlib import Path

    return len([p for p in Path(path).glob("shard=*") if p.is_dir()])


SPLIT_BOUNDS = (90, 95)  # percent bounds: [0,90) train, [90,95) val, rest test


def dataset_split_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test split accounting: each document is
    routed by a content-stable hash of its doc_id into train/val/test
    at 90/5/5, and the operator reports per-(lang, split) doc and token
    counts — the reproducibility contract a dataset card records.

    Hash-gated splitting (h64 mod 100 against fixed bounds) is the
    production idiom: map-only, no shuffle for the assignment itself,
    the SAME doc lands in the same split on every run, engine, and
    scale — unlike randomSplit, whose assignment changes with partition
    layout. One small aggregate; at 100 TB the split column also
    becomes the export layout's partition key."""
    docs = table(spark, sf, "documents")
    pct = F.pmod(_h64_spark(F.col("doc_id").cast("string")), F.lit(100))
    split = (
        F.when(pct < SPLIT_BOUNDS[0], "train")
        .when(pct < SPLIT_BOUNDS[1], "val")
        .otherwise("test")
    )
    return (
        docs.select(
            "lang",
            split.alias("split"),
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .orderBy("lang", "split")
    )


def write_dataset_card(
    spark: SparkSession,
    sf: str,
    out_dir: str,
) -> dict:
    """Run the curation funnel and persist an auditable dataset card:
    the per-(lang, source) funnel table as parquet plus a JSON manifest
    (input path, funnel thresholds, stage totals). Reproducibility is
    structural — every stage is deterministic (hash-gated sampling, min
    doc_id representatives), so re-running on the same input yields the
    same card byte-for-byte. Returns the manifest dict."""
    import json
    from pathlib import Path

    funnel = corpus_curation_pipeline(spark, sf)
    out = Path(out_dir)
    funnel.write.mode("overwrite").parquet(str(out / "funnel.parquet"))
    persisted = spark.read.parquet(str(out / "funnel.parquet"))
    total_cols = (
        "n_raw",
        "n_quality",
        "n_exact_reps",
        "n_neardup_kept",
        "n_sampled",
        "n_kept_tokens",
    )
    # one action computes every stage total AND the stratum count —
    # a single scan of the (tiny) persisted funnel, not 7
    row = persisted.agg(
        F.count("*").alias("__n_strata"),
        *[F.sum(c).alias(c) for c in total_cols],
    ).first()
    totals = {c: int(row[c]) for c in total_cols}
    manifest = {
        "input": sf,
        "thresholds": {
            "min_tokens": MIN_TOKENS,
            "min_distinct_ratio": MIN_DISTINCT_RATIO,
            "minhash": {"n_hashes": N_MINHASH, "bands": N_BANDS},
            "sample": {"default": SAMPLE_DEFAULT_THRESHOLD, **SAMPLE_THRESHOLDS},
        },
        "totals": totals,
        "n_strata": int(row["__n_strata"]),
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2, sort_keys=True))
    return manifest


SAMPLE_K_PER_SOURCE = 10


def weighted_sample_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-Res): every doc gets key = ln(u)/w with u a hash-derived
    uniform in (0,1] and w = n_chars, and the k largest keys per source
    form the sample — longer docs are proportionally more likely, yet
    the draw is exactly reproducible across engines and runs (the
    auditable alternative to ``rand()`` sampling, which can never be
    replayed).

    Scale shape: the key is row-local arithmetic on a 60-bit portable
    hash; top-k per source is one window shuffle on the stratum key with
    the rank filter right after it (WindowGroupLimit pushes the k-cut
    into the partial sort), so nothing global ever materializes."""
    docs = table(spark, sf, "documents")
    u = (
        _h64_spark(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))) % 1_000_000
        + 1
    ) / F.lit(1_000_000.0)
    key = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(F.desc("key"), "doc_id")
    return (
        docs.select(
            "source", "doc_id", F.col("n_chars").alias("weight"), key.alias("key")
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= SAMPLE_K_PER_SOURCE)
        # + 0.0 normalizes IEEE negative zero: rounding the tiny negative
        # key of a u≈1 doc yields -0.0 in DuckDB but +0.0 in Spark
        # (x + 0.0 == x for every other value)
        .select(
            "source",
            "rnk",
            "doc_id",
            "weight",
            (F.round("key", 6) + F.lit(0.0)).alias("samp_key"),
        )
        .orderBy("source", "rnk")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle: the same funnel, clause for clause
# ---------------------------------------------------------------------------

_min_exprs = ", ".join(
    f"MIN((hb * {_MINHASH_A[i]} + {_MINHASH_B[i]}) % {MINHASH_P}) AS m_{i}"
    for i in range(N_MINHASH)
)

_band_selects = "\nUNION ALL\n".join(
    "SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_key FROM sig".format(
        b=b,
        cols=" || ',' || ".join(
            f"CAST(m_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        ),
    )
    for b in range(N_BANDS)
)

_thr_sql = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN '{t}'" for lang, t in SAMPLE_THRESHOLDS.items()
) + f" ELSE '{SAMPLE_DEFAULT_THRESHOLD}' END"


PROMPT_FRACTION = 4  # first 1/4 of tokens are prompt (loss-masked)


def loss_mask_accounting(spark: SparkSession, sf: str) -> DataFrame:
    """Training-sample conversion accounting: when each document
    becomes a (prompt, completion) pair with the first 1/PROMPT_FRACTION
    of its tokens loss-masked, how many tokens per language train vs
    ride along masked — the number that converts corpus size into
    effective training tokens for a data budget.

    Pure closed-form integer arithmetic per row (floor division on the
    token count — no token materialization, no shuffle before the
    per-language rollup)."""
    docs = table(spark, sf, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    prompt = F.floor(n_tok / PROMPT_FRACTION).cast("bigint")
    return (
        docs.select("lang", n_tok.alias("n"), prompt.alias("p"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.sum("p").alias("masked_tokens"),
            (F.sum("n") - F.sum("p")).alias("trained_tokens"),
            F.round(F.sum("p") / F.sum("n"), 6).alias("mask_ratio"),
        )
        .orderBy("lang")
    )


ORACLE: dict[str, str] = {
    "loss_mask_accounting": f"""
        WITH t AS (
            SELECT lang, len(string_split(text, ' ')) AS n,
                   len(string_split(text, ' ')) // {PROMPT_FRACTION} AS p
            FROM documents
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST(SUM(p) AS BIGINT) AS masked_tokens,
               CAST(SUM(n) - SUM(p) AS BIGINT) AS trained_tokens,
               ROUND(SUM(p) / CAST(SUM(n) AS DOUBLE), 6) AS mask_ratio
        FROM t GROUP BY lang ORDER BY lang
    """,
    "weighted_sample_topk": f"""
        WITH keyed AS (
            SELECT source, doc_id, n_chars AS weight,
                   ln((({H64_SQL.format(expr="'samp:' || CAST(doc_id AS VARCHAR)")})
                       % 1000000 + 1) / 1000000.0) / n_chars AS key
            FROM documents
        ),
        ranked AS (
            SELECT source, doc_id, weight, key,
                   CAST(ROW_NUMBER() OVER (PARTITION BY source
                                           ORDER BY key DESC, doc_id) AS INT) AS rnk
            FROM keyed
        )
        SELECT source, rnk, doc_id, weight,
               ROUND(key, 6) + 0.0 AS samp_key
        FROM ranked
        WHERE rnk <= {SAMPLE_K_PER_SOURCE}
    """,
    "corpus_curation_pipeline": f"""
        WITH q AS (
            SELECT doc_id, lang, source, lower(trim(text)) AS norm,
                   (len(string_split(lower(trim(text)), ' ')) >= {MIN_TOKENS}
                    AND CAST(len(list_distinct(string_split(lower(trim(text)), ' '))) AS DOUBLE)
                        / len(string_split(lower(trim(text)), ' ')) >= {MIN_DISTINCT_RATIO})
                       AS passed_quality
            FROM documents
        ),
        exact AS (
            SELECT *, md5(norm) AS digest,
                   ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id) = 1
                       AS is_exact_rep
            FROM q WHERE passed_quality
        ),
        reps AS (SELECT doc_id, norm FROM exact WHERE is_exact_rep),
        shingled AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(string_split(norm, ' ')) - 2),
                       i -> array_to_string(string_split(norm, ' ')[i:i+2], ' '))) AS shingle
            FROM reps WHERE len(string_split(norm, ' ')) >= 3
        ),
        sig AS (
            SELECT doc_id, {_min_exprs}
            FROM (SELECT doc_id, {H64_SQL.format(expr="shingle")} % {MINHASH_P} AS hb
                  FROM shingled)
            GROUP BY doc_id
        ),
        banded AS ({_band_selects}),
        dominated AS (
            SELECT DISTINCT b.doc_id
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ),
        flags AS (
            SELECT e.*,
                   e.is_exact_rep AND d.doc_id IS NULL AS survives_neardup,
                   e.is_exact_rep AND d.doc_id IS NULL
                       AND substr(md5(CAST(e.doc_id AS VARCHAR)), 1, 2) < ({_thr_sql})
                       AS sampled
            FROM exact e LEFT JOIN dominated d ON e.doc_id = d.doc_id
        )
        SELECT q.lang, q.source,
               COUNT(*) AS n_raw,
               CAST(SUM(CASE WHEN q.passed_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(SUM(CASE WHEN f.is_exact_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_reps,
               CAST(SUM(CASE WHEN f.survives_neardup THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_kept,
               CAST(SUM(CASE WHEN f.sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(SUM(CASE WHEN f.sampled
                    THEN len(string_split(q.norm, ' ')) ELSE 0 END) AS BIGINT) AS n_kept_tokens
        FROM q LEFT JOIN flags f ON q.doc_id = f.doc_id
        GROUP BY q.lang, q.source
    """,
    "dataset_split_counts": f"""
        SELECT lang,
               CASE WHEN {H64_SQL.format(expr="CAST(doc_id AS VARCHAR)")} % 100
                         < {SPLIT_BOUNDS[0]} THEN 'train'
                    WHEN {H64_SQL.format(expr="CAST(doc_id AS VARCHAR)")} % 100
                         < {SPLIT_BOUNDS[1]} THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY lang, split
        ORDER BY lang, split
    """,
    "export_shard_histogram": f"""
        SELECT CAST({H64_SQL.format(expr="CAST(doc_id AS VARCHAR)")} % {N_EXPORT_SHARDS} AS INT)
                   AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY shard
        ORDER BY shard
    """,
}

QUERIES = {
    "loss_mask_accounting": loss_mask_accounting,
    "corpus_curation_pipeline": corpus_curation_pipeline,
    "export_shard_histogram": export_shard_histogram,
    "dataset_split_counts": dataset_split_counts,
    "weighted_sample_topk": weighted_sample_topk,
}


# --- data-selection wave (r6 window): DSIR, per-source caps, token budgets ---

DSIR_TARGET_SOURCES = ("src0", "src1")  # the "curated" target distribution
DSIR_BUCKETS = 128  # hashed-feature buckets (DSIR uses 10k at web scale;
# 128 keeps the oracle's 128-row CTE readable — the plan shape is identical)

SOURCE_CAP = 20  # max docs kept per source (domain-cap trimming)

BUDGET_FRACTION_NUM, BUDGET_FRACTION_DEN = 1, 2  # train on half the corpus


def dsir_importance_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every pool document by how much more
    likely its hashed-unigram features are under a small TARGET corpus
    (sources ``src0``/``src1`` stand in for the curated target) than
    under the pool itself.  weight(d) = Σ_tokens ln(p_target(bucket) /
    p_pool(bucket)) with add-one smoothing over ``DSIR_BUCKETS`` hashed
    buckets.  Per language: pool docs, mean weight, docs with positive
    weight (the ones importance resampling keeps), and the keep rate.

    100 TB shape: the feature distributions are a 128-row aggregate
    (explode → partial+final count per bucket — the explode fan-out is
    absorbed map-side), broadcast back as the bucket→log-ratio lookup;
    the per-doc score is then one broadcast-join + one doc_id-keyed
    aggregate (high-cardinality key).  Nothing iterates, nothing
    collects, and the text column never crosses a shuffle."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    is_target = F.col("source").isin(*DSIR_TARGET_SOURCES)
    toks = docs.select(
        "doc_id",
        "lang",
        is_target.alias("is_target"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).withColumn("bucket", F.pmod(_h64_spark(F.col("tok")), F.lit(DSIR_BUCKETS)))
    counts = toks.groupBy("bucket").agg(
        F.sum(F.col("is_target").cast("bigint")).alias("c_t"),
        F.sum((~F.col("is_target")).cast("bigint")).alias("c_r"),
    )
    # totals via an unpartitioned window over the ≤128-row aggregate —
    # bounded by the bucket count, never by corpus size
    w = Window.partitionBy()
    p_t = (F.col("c_t") + 1) / (F.sum("c_t").over(w) + F.lit(DSIR_BUCKETS))
    p_r = (F.col("c_r") + 1) / (F.sum("c_r").over(w) + F.lit(DSIR_BUCKETS))
    ratios = counts.select("bucket", F.log(p_t / p_r).alias("log_ratio"))
    pool = toks.filter(~F.col("is_target"))
    doc_w = (
        pool.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum("log_ratio").alias("w"))
    )
    return (
        doc_w.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("w"), 4).alias("mean_weight"),
            F.sum((F.col("w") > 0).cast("bigint")).alias("n_selected"),
            F.round(F.avg((F.col("w") > 0).cast("double")), 4).alias("keep_rate"),
        )
        .orderBy("lang")
    )


def source_quality_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain cap trimming (the web-corpus rule that no single
    domain may dominate the mix): keep at most ``SOURCE_CAP`` documents
    per source, best-quality first, where quality is the integer
    composite distinct_tokens * 1_000_000 + least(n_chars, 999_999)
    (monotone in lexical diversity, chars as tiebreak — the clamp keeps
    the tiebreak strictly inside its tier even for >1M-char documents,
    and the composite stays exactly representable, so the keep set is
    engine-independent).  Per source: docs seen, kept, dropped, and the
    quality floor of the kept set.

    100 TB shape: ``source`` is a low-cardinality key, so a plain
    ``row_number() OVER (PARTITION BY source)`` would sort each
    domain's full document set in ONE task — the exact anti-pattern
    tests/test_plans.py's hygiene sweep exists to catch.  The rank
    instead reuses ``_distributed_rank`` (textops): one range shuffle
    on (source, score, doc_id), per-partition local row_numbers, and a
    broadcast prefix-sum of per-partition counts — no single-task sort
    at any domain size."""
    from pinterest_data_pipeline6_spark.operators.textops import _distributed_rank

    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = F.split(F.col("text"), " ")
    quality = (
        F.size(F.array_distinct(toks)).cast("bigint") * F.lit(1_000_000)
        + F.least(F.col("n_chars"), F.lit(999_999))
    )
    scored = docs.select(
        "doc_id", "source", quality.alias("quality"), (-quality).alias("score")
    )
    ranked = _distributed_rank(scored, group_cols=["source"])
    kept = F.col("_grank") <= SOURCE_CAP
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("bigint")).alias("n_kept"),
            F.sum((~kept).cast("bigint")).alias("n_dropped"),
            F.min(F.when(kept, F.col("quality"))).alias("quality_floor"),
        )
        .orderBy("source")
    )


def token_budget_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled token-budget planning (the mixture step every
    pretraining run does before reading a byte): given a total training
    budget of ``BUDGET_FRACTION`` of the corpus's tokens, allocate each
    source tokens proportional to sqrt(available) — temperature 0.5
    up-weights small sources exactly like ``source_mixture_weights`` —
    clipped at what the source actually has (one-shot waterfill; the
    clipped surplus is reported, not redistributed).  Per source:
    available tokens, mixture share, allocated tokens, and the epoch
    count the allocation implies.

    100 TB shape: one scan → one partial+final agg to a #sources-row
    table; everything after (shares, clipping, epochs) is arithmetic
    over that tiny aggregate via unpartitioned windows bounded by the
    source count.  sqrt (not pow) keeps the weights IEEE-correctly-
    rounded and therefore bit-identical across engines.  The allocation
    uses the UNROUNDED share: rounded shares can sum to slightly more
    than 1, so Σ floor(budget·rounded_share) could exceed the budget at
    production source counts (budget · ~5e-7 · n_sources) — the 6-dp
    rounding exists only for the reported ``share`` column."""
    docs = table(spark, sf, "documents")
    avail = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).alias("avail_tokens")
    )
    w = Window.partitionBy()
    weight = F.sqrt(F.col("avail_tokens").cast("double"))
    share_raw = weight / F.sum(weight).over(w)
    budget = F.floor(
        F.sum("avail_tokens").over(w) * F.lit(BUDGET_FRACTION_NUM)
        / F.lit(BUDGET_FRACTION_DEN)
    )
    shared = avail.select(
        "source",
        "avail_tokens",
        F.round(share_raw, 6).alias("share"),
        F.least(F.col("avail_tokens"), F.floor(budget * share_raw)).alias(
            "alloc_tokens"
        ),
    )
    return shared.select(
        "source",
        "avail_tokens",
        "share",
        "alloc_tokens",
        F.round(F.col("alloc_tokens") / F.col("avail_tokens"), 4).alias("epochs"),
    ).orderBy("source")


_DSIR_TGT_IN = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)

ORACLE["dsir_importance_weights"] = f"""
    WITH toks AS (
        SELECT doc_id, lang, source IN ({_DSIR_TGT_IN}) AS is_target,
               {H64_SQL.format(expr="tok")} % {DSIR_BUCKETS} AS bucket
        FROM (SELECT doc_id, lang, source,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents)
    ),
    counts AS (
        SELECT bucket,
               SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_t,
               SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS c_r
        FROM toks GROUP BY bucket
    ),
    ratios AS (
        SELECT bucket,
               ln(((c_t + 1) / (SUM(c_t) OVER () + {DSIR_BUCKETS}))
                  / ((c_r + 1) / (SUM(c_r) OVER () + {DSIR_BUCKETS}))) AS log_ratio
        FROM counts
    ),
    doc_w AS (
        SELECT t.doc_id, t.lang, SUM(r.log_ratio) AS w
        FROM toks t JOIN ratios r ON t.bucket = r.bucket
        WHERE NOT t.is_target
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(w), 4) AS mean_weight,
           CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           ROUND(AVG(CASE WHEN w > 0 THEN 1.0 ELSE 0.0 END), 4) AS keep_rate
    FROM doc_w GROUP BY lang ORDER BY lang
"""

ORACLE["source_quality_cap"] = f"""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   * 1000000 + LEAST(n_chars, 999999) AS quality
        FROM documents
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id ASC) AS rk
        FROM scored
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rk <= {SOURCE_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN rk > {SOURCE_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           MIN(CASE WHEN rk <= {SOURCE_CAP} THEN quality END) AS quality_floor
    FROM ranked GROUP BY source ORDER BY source
"""

ORACLE["token_budget_allocation"] = f"""
    WITH avail AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
        FROM documents GROUP BY source
    ),
    shared AS (
        SELECT source, avail_tokens,
               sqrt(CAST(avail_tokens AS DOUBLE))
                   / SUM(sqrt(CAST(avail_tokens AS DOUBLE))) OVER () AS share_raw,
               FLOOR(SUM(avail_tokens) OVER () * {BUDGET_FRACTION_NUM}.0
                     / {BUDGET_FRACTION_DEN}) AS budget
        FROM avail
    )
    SELECT source, avail_tokens, ROUND(share_raw, 6) AS share,
           CAST(LEAST(avail_tokens, FLOOR(budget * share_raw)) AS BIGINT)
               AS alloc_tokens,
           ROUND(LEAST(avail_tokens, FLOOR(budget * share_raw))
                 / CAST(avail_tokens AS DOUBLE), 4) AS epochs
    FROM shared ORDER BY source
"""

QUERIES["dsir_importance_weights"] = dsir_importance_weights
QUERIES["source_quality_cap"] = source_quality_cap
QUERIES["token_budget_allocation"] = token_budget_allocation


# ---------------------------------------------------------------------------
# round 7: batch twin of the streaming curation funnel
# ---------------------------------------------------------------------------


def curation_funnel_batch_ledger(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of ``streaming/jobs.py::run_streaming_curation`` —
    the streaming funnel (row-local quality gate -> cross-batch LSH
    near-dup suppression sink) had only pytest evidence; this replays
    the SAME composition over the documents table with ``doc_id % 3``
    standing in for micro-batch arrival order: per batch, raw rows,
    quality rejections (map-only, before any signature work — the
    funnel ordering docs/SCALE.md mandates), history-bucket
    suppressions against the accumulated band state of earlier
    batches' ACCEPTED docs, within-batch smaller-id dominations, and
    final acceptances.  NULL text counts as a quality failure in both
    engines (COALESCE, not SQL three-valued silence).

    100 TB shape: the gate is a row-local projection ahead of the
    band-keyed semi-join recurrence — identical to the sink's own
    per-micro-batch plan."""
    from pinterest_data_pipeline6_spark.operators.dedup import (
        NEARDUP_LEDGER_BATCHES,
        _neardup_batch_states,
    )

    docs = widen_small_scan(table(spark, sf, "documents"))
    q = _quality_flags(docs).select(
        "doc_id",
        "norm",
        F.coalesce("passed_quality", F.lit(False)).alias("ok"),
        F.pmod("doc_id", F.lit(NEARDUP_LEDGER_BATCHES)).alias("batch_id"),
    )
    gated = q.filter("ok").select(
        "doc_id", F.col("norm").alias("text"), "batch_id"
    )
    states = _neardup_batch_states(gated).unionByName(
        q.filter(~F.col("ok")).select(
            "batch_id", "doc_id", F.lit("failq").alias("status")
        )
    )
    return (
        states.groupBy("batch_id")
        .agg(
            F.count("*").alias("n_raw"),
            F.sum((F.col("status") == "failq").cast("bigint")).cast(
                "bigint"
            ).alias("n_failed_quality"),
            F.sum((F.col("status") != "failq").cast("bigint")).cast(
                "bigint"
            ).alias("n_gated"),
            F.sum((F.col("status") == "hist").cast("bigint")).cast(
                "bigint"
            ).alias("n_hist_suppressed"),
            F.sum((F.col("status") == "within").cast("bigint")).cast(
                "bigint"
            ).alias("n_within_suppressed"),
            F.sum(
                F.col("status").isin("kept", "bandless").cast("bigint")
            ).cast("bigint").alias("n_accepted"),
        )
        .orderBy("batch_id")
    )


def _funnel_ledger_sql() -> str:
    from pinterest_data_pipeline6_spark.operators.dedup import (
        NEARDUP_LEDGER_BATCHES,
        _neardup_states_sql,
    )

    cond = (
        f"(len(string_split(lower(trim(text)), ' ')) >= {MIN_TOKENS} "
        "AND CAST(len(list_distinct(string_split(lower(trim(text)), ' ')))"
        " AS DOUBLE) / len(string_split(lower(trim(text)), ' '))"
        f" >= {MIN_DISTINCT_RATIO})"
    )
    return f"""
    WITH batched AS (
        SELECT doc_id, lower(trim(text)) AS text,
               doc_id % {NEARDUP_LEDGER_BATCHES} AS batch_id
        FROM documents WHERE COALESCE({cond}, FALSE)
    ),
    {_neardup_states_sql("batched")},
    all_states AS (
        SELECT batch_id, doc_id, status FROM states
        UNION ALL
        SELECT doc_id % {NEARDUP_LEDGER_BATCHES} AS batch_id, doc_id,
               'failq' AS status
        FROM documents WHERE NOT COALESCE({cond}, FALSE)
    )
    SELECT batch_id, COUNT(*) AS n_raw,
           CAST(SUM(CASE WHEN status = 'failq' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_failed_quality,
           CAST(SUM(CASE WHEN status != 'failq' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gated,
           CAST(SUM(CASE WHEN status = 'hist' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hist_suppressed,
           CAST(SUM(CASE WHEN status = 'within' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_suppressed,
           CAST(SUM(CASE WHEN status IN ('kept', 'bandless') THEN 1 ELSE 0
                    END) AS BIGINT) AS n_accepted
    FROM all_states GROUP BY batch_id ORDER BY batch_id
    """


ORACLE["curation_funnel_batch_ledger"] = _funnel_ledger_sql()
QUERIES["curation_funnel_batch_ledger"] = curation_funnel_batch_ledger


# ---------------------------------------------------------------------------
# round 7: mixture-concentration and split-divergence audits
# ---------------------------------------------------------------------------


def source_concentration_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """Source-concentration audit per language: Herfindahl-Hirschman
    index (sum of squared source shares) and Gini coefficient of doc
    counts across sources — the two numbers a data-mixture review asks
    for before a lang's corpus is declared "diverse".  Both are
    integer-cross-multiplied (HHI = sum(x^2)/S^2, Gini = mean absolute
    difference / 2*mean) with ONE final division each.

    100 TB shape: raw docs reduce to #langs x #sources rows in one
    agg; the Gini pairwise join runs on that bounded aggregate."""
    docs = table(spark, sf, "documents")
    cnt = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("x"))
    ag = cnt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    b = cnt.select(
        F.col("lang").alias("lang_b"), F.col("x").alias("xb")
    )
    mad = (
        cnt.join(b, cnt.lang == b.lang_b)
        .groupBy("lang")
        .agg(F.sum(F.abs(F.col("x") - F.col("xb"))).alias("sad"))
    )
    return (
        ag.join(mad, "lang")
        .select(
            "lang",
            F.col("k").cast("bigint").alias("n_sources"),
            F.col("s").cast("bigint").alias("n_docs"),
            F.round(
                F.col("q") / (F.col("s") * F.col("s")).cast("double"), 6
            ).alias("hhi"),
            F.round(
                F.col("sad")
                / (F.lit(2) * F.col("k") * F.col("s")).cast("double"),
                6,
            ).alias("gini"),
        )
        .orderBy("lang")
    )


ORACLE["source_concentration_hhi"] = """
    WITH cnt AS (
        SELECT lang, source, COUNT(*) AS x
        FROM documents GROUP BY 1, 2
    ),
    ag AS (
        SELECT lang, COUNT(*) AS k, SUM(x) AS s, SUM(x * x) AS q
        FROM cnt GROUP BY lang
    ),
    mad AS (
        SELECT a.lang, SUM(ABS(a.x - b.x)) AS sad
        FROM cnt a JOIN cnt b ON a.lang = b.lang
        GROUP BY a.lang
    )
    SELECT ag.lang,
           CAST(k AS BIGINT) AS n_sources,
           CAST(s AS BIGINT) AS n_docs,
           ROUND(q / CAST(s * s AS DOUBLE), 6) AS hhi,
           ROUND(sad / CAST(2 * k * s AS DOUBLE), 6) AS gini
    FROM ag JOIN mad ON ag.lang = mad.lang
    ORDER BY ag.lang
"""

QUERIES["source_concentration_hhi"] = source_concentration_hhi


def js_divergence_splits(spark: SparkSession, sf: str) -> DataFrame:
    """Jensen-Shannon divergence between the TRAIN and VAL language
    mixes (hash splits shared with ``dataset_split_counts``) — the
    symmetric, bounded [0,1] drift score a split-health check prefers
    over raw KL (which explodes on langs absent from one side; the
    add-one smoothing here keeps every term finite anyway).  Per lang:
    the smoothed shares and the JSD contribution
    0.5*p*log2(p/m) + 0.5*q*log2(q/m).

    100 TB shape: one scan, one hash agg to #langs rows; totals via an
    unpartitioned window over that bounded aggregate."""
    from pinterest_data_pipeline6_spark.operators.textops import _h64_spark

    docs = table(spark, sf, "documents")
    pct = F.pmod(_h64_spark(F.col("doc_id").cast("string")), F.lit(100))
    counts = docs.groupBy("lang").agg(
        F.sum((pct < SPLIT_BOUNDS[0]).cast("bigint")).alias("n_train"),
        F.sum(
            ((pct >= SPLIT_BOUNDS[0]) & (pct < SPLIT_BOUNDS[1])).cast(
                "bigint"
            )
        ).alias("n_val"),
    )
    w = Window.partitionBy()
    p = (F.col("n_train") + 1) / (
        F.sum("n_train").over(w) + F.count("*").over(w)
    )
    q = (F.col("n_val") + 1) / (F.sum("n_val").over(w) + F.count("*").over(w))
    m = (p + q) / 2
    return (
        counts.select(
            "lang",
            "n_train",
            "n_val",
            F.round(p, 6).alias("p_train"),
            F.round(q, 6).alias("q_val"),
            F.round(
                F.lit(0.5) * p * F.log2(p / m)
                + F.lit(0.5) * q * F.log2(q / m),
                6,
            ).alias("jsd_term"),
        )
        .orderBy("lang")
    )


def _js_oracle_sql() -> str:
    from pinterest_data_pipeline6_spark.operators.textops import H64_SQL

    pct = H64_SQL.format(expr="CAST(doc_id AS VARCHAR)") + " % 100"
    return f"""
    WITH counts AS (
        SELECT lang,
               CAST(SUM(CASE WHEN {pct} < {SPLIT_BOUNDS[0]} THEN 1 ELSE 0
                        END) AS BIGINT) AS n_train,
               CAST(SUM(CASE WHEN {pct} >= {SPLIT_BOUNDS[0]}
                             AND {pct} < {SPLIT_BOUNDS[1]} THEN 1 ELSE 0
                        END) AS BIGINT) AS n_val
        FROM documents GROUP BY lang
    ),
    sm AS (
        SELECT lang, n_train, n_val,
               (n_train + 1) / (SUM(n_train) OVER () + COUNT(*) OVER ())
                   AS p,
               (n_val + 1) / (SUM(n_val) OVER () + COUNT(*) OVER ()) AS q
        FROM counts
    )
    SELECT lang, n_train, n_val,
           ROUND(p, 6) AS p_train,
           ROUND(q, 6) AS q_val,
           ROUND(0.5 * p * log2(p / ((p + q) / 2))
                 + 0.5 * q * log2(q / ((p + q) / 2)), 6) AS jsd_term
    FROM sm ORDER BY lang
    """


ORACLE["js_divergence_splits"] = _js_oracle_sql()
QUERIES["js_divergence_splits"] = js_divergence_splits


def shard_balance_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Per-shard language-balance audit for the export layout of
    ``export_shard_histogram``: each shard's doc count plus the
    chi-square statistic of its language mix against the corpus-wide
    mix — a reader that round-robins shards sees a biased lang stream
    exactly when this fires.  Expected cells are cross-multiplied
    rationals (shard_total * lang_total / grand_total), one division
    per cell.

    100 TB shape: one agg to #shards x #langs cells; every window runs
    over that bounded grid."""
    docs = table(spark, sf, "documents")
    cells = docs.groupBy(
        _shard_col().alias("shard"), "lang"
    ).agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    w_shard = Window.partitionBy("shard")
    w_lang = Window.partitionBy("lang")
    grand = F.sum("n").over(w_all)
    exp = (
        F.sum("n").over(w_shard) * F.sum("n").over(w_lang)
    ) / grand.cast("double")
    term = (F.col("n") - exp) * (F.col("n") - exp) / exp
    return (
        cells.select(
            "shard",
            F.sum("n").over(w_shard).cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).over(w_shard).cast("bigint").alias("n_langs"),
            term.alias("term"),
        )
        .groupBy("shard", "n_docs", "n_langs")
        .agg(F.round(F.sum("term"), 4).alias("chi2"))
        .orderBy("shard")
    )


def _shard_balance_sql() -> str:
    from pinterest_data_pipeline6_spark.operators.textops import H64_SQL

    shard = (
        H64_SQL.format(expr="CAST(doc_id AS VARCHAR)")
        + f" % {N_EXPORT_SHARDS}"
    )
    return f"""
    WITH cells AS (
        SELECT CAST({shard} AS INT) AS shard, lang, COUNT(*) AS n
        FROM documents GROUP BY 1, 2
    ),
    t AS (
        SELECT shard, lang, n,
               SUM(n) OVER (PARTITION BY shard) AS st,
               COUNT(*) OVER (PARTITION BY shard) AS sl,
               SUM(n) OVER (PARTITION BY lang) AS lt,
               SUM(n) OVER () AS g
        FROM cells
    )
    SELECT shard,
           CAST(MIN(st) AS BIGINT) AS n_docs,
           CAST(MIN(sl) AS BIGINT) AS n_langs,
           ROUND(SUM((n - st * lt / CAST(g AS DOUBLE))
                     * (n - st * lt / CAST(g AS DOUBLE))
                     / (st * lt / CAST(g AS DOUBLE))), 4) AS chi2
    FROM t GROUP BY shard ORDER BY shard
    """


ORACLE["shard_balance_audit"] = _shard_balance_sql()
QUERIES["shard_balance_audit"] = shard_balance_audit


def token_lorenz_points(spark: SparkSession, sf: str) -> DataFrame:
    """Token-mass concentration (Lorenz-curve points) per language:
    the share of the lang's total tokens held by its top 1% and top
    10% of documents by length — the complement of
    ``source_concentration_hhi``: that measures WHICH sources
    dominate, this measures whether a few mega-documents dominate the
    token budget (they do in real crawls, and samplers must know).
    Top-N cutoffs are exact integer rationals ceil(n/100), ceil(n/10).

    100 TB shape: the per-lang length rank rides ``_distributed_rank``
    (range shuffle, no single-task sort); shares are two conditional
    sums in one aggregate."""
    from pinterest_data_pipeline6_spark.operators.textops import (
        _distributed_rank,
    )

    docs = table(spark, sf, "documents")
    scored = docs.select(
        "lang",
        # rank ascending on the NEGATED length = descending on length
        (-F.size(F.split(F.col("text"), " ")).cast("bigint")).alias(
            "score"
        ),
        F.col("doc_id").alias("doc_id"),
    )
    ranked = _distributed_rank(scored, group_cols=["lang"])
    top1 = F.expr("(total + 99) div 100")
    top10 = F.expr("(total + 9) div 10")
    return (
        ranked.groupBy("lang")
        .agg(
            F.max("total").cast("bigint").alias("n_docs"),
            F.sum(-F.col("score")).cast("bigint").alias("total_tokens"),
            F.round(
                F.sum(F.when(F.col("_grank") <= top1, -F.col("score")))
                / F.sum(-F.col("score")).cast("double"),
                6,
            ).alias("top1pct_share"),
            F.round(
                F.sum(F.when(F.col("_grank") <= top10, -F.col("score")))
                / F.sum(-F.col("score")).cast("double"),
                6,
            ).alias("top10pct_share"),
        )
        .orderBy("lang")
    )


ORACLE["token_lorenz_points"] = """
    WITH ranked AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY -CAST(len(string_split(text, ' '))
                                                 AS BIGINT) ASC NULLS FIRST,
                                           doc_id ASC) AS rk,
               COUNT(*) OVER (PARTITION BY lang) AS total
        FROM documents
    )
    SELECT lang,
           CAST(MAX(total) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           ROUND(SUM(CASE WHEN rk <= (total + 99) // 100 THEN n_tok END)
                 / CAST(SUM(n_tok) AS DOUBLE), 6) AS top1pct_share,
           ROUND(SUM(CASE WHEN rk <= (total + 9) // 10 THEN n_tok END)
                 / CAST(SUM(n_tok) AS DOUBLE), 6) AS top10pct_share
    FROM ranked GROUP BY lang ORDER BY lang
"""

QUERIES["token_lorenz_points"] = token_lorenz_points


# ---------------------------------------------------------------------------
# Round 9: epoch-wise shuffle + span-corruption accounting — the two
# data-ORDERING stages between a curated corpus and a training run.

N_EPOCHS = 3
EPOCH_SHARDS = 8


def epoch_shuffle_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Epoch-reshuffle balance audit: the training loader re-shards
    the corpus each epoch with a deterministic per-(epoch, doc) hash —
    the standard seeded-shuffle recipe (same data, different order
    every epoch, reproducible from the seed).  Per (epoch, shard):
    document and token mass, plus each shard's share of the epoch —
    the table that catches a broken reshuffle (identical shards across
    epochs, or a skewed shard that serializes every step of one
    epoch).

    Map-only tagging (two hashes per doc) into one bounded
    (N_EPOCHS x EPOCH_SHARDS)-row aggregate; the share divides by the
    epoch total via a window over the bounded aggregate."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    n_tok = F.size(F.split("text", " "))
    tagged = None
    for ep in range(N_EPOCHS):
        shard = (
            _h64_spark(
                F.concat(
                    F.lit(f"ep{ep}|"), F.col("doc_id").cast("string")
                )
            )
            % EPOCH_SHARDS
        ).cast("int")
        t = docs.select(
            F.lit(ep).alias("epoch"),
            shard.alias("shard"),
            n_tok.alias("n_tok"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    agg = tagged.groupBy("epoch", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    w = Window.partitionBy("epoch")
    return (
        agg.select(
            "epoch",
            "shard",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(w).cast("double"),
                6,
            ).alias("doc_share"),
        )
        .orderBy("epoch", "shard")
    )


def _epoch_shard_sql(ep: int) -> str:
    h = H64_SQL.format(expr=f"'ep{ep}|' || CAST(doc_id AS VARCHAR)")
    return f"CAST({h} % {EPOCH_SHARDS} AS INT)"


ORACLE["epoch_shuffle_audit"] = (
    "WITH tagged AS (\n"
    + "\nUNION ALL\n".join(
        f"""        SELECT {ep} AS epoch, {_epoch_shard_sql(ep)} AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents"""
        for ep in range(N_EPOCHS)
    )
    + """
    ),
    agg AS (
        SELECT epoch, shard, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM tagged GROUP BY epoch, shard
    )
    SELECT epoch, shard, n_docs, n_tokens,
           ROUND(CAST(n_docs AS DOUBLE)
                 / CAST(SUM(n_docs) OVER (PARTITION BY epoch) AS DOUBLE), 6)
               AS doc_share
    FROM agg ORDER BY epoch, shard
"""
)

QUERIES["epoch_shuffle_audit"] = epoch_shuffle_audit


SPAN_MASK_PCT = 15  # per-token corruption rate (T5 uses 0.15)


def span_corruption_masks(spark: SparkSession, sf: str) -> DataFrame:
    """Span-corruption (T5 denoising) accounting: every token is
    independently masked with probability SPAN_MASK_PCT% by a
    deterministic (doc, position) hash; consecutive masked tokens
    collapse into one sentinel span.  Per language: token mass, masked
    mass, realized mask rate, span count, and mean span length — the
    numbers that set the denoising objective's sentinel budget and
    verify the masking plan is reproducible from the seed.

    Span starts need NO window function: a span starts where position
    i is masked and position i-1 is not, and both flags are the same
    row-local hash evaluated at i and i-1 — two hashes per token,
    zero shuffles until the bounded per-lang aggregate."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = F.split("text", " ")
    pos = docs.select(
        "lang",
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size(toks) - 1)).alias("i"),
    )

    def masked(idx):
        return (
            _h64_spark(
                F.concat(
                    F.lit("mask|"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    idx.cast("string"),
                )
            )
            % 100
            < SPAN_MASK_PCT
        )

    m_i = masked(F.col("i"))
    m_prev = (F.col("i") > 0) & masked(F.col("i") - 1)
    flagged = pos.select(
        "lang",
        m_i.cast("bigint").alias("is_masked"),
        (m_i & ~m_prev).cast("bigint").alias("is_span_start"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("is_masked").alias("n_masked"),
            F.round(
                F.sum("is_masked").cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("mask_rate"),
            F.sum("is_span_start").alias("n_spans"),
            F.round(
                F.sum("is_masked").cast("double")
                / F.nullif(F.sum("is_span_start"), F.lit(0)).cast("double"),
                4,
            ).alias("avg_span_len"),
        )
        .orderBy("lang")
    )


_SPAN_H = H64_SQL.format(
    expr="'mask|' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)"
)
_SPAN_H_PREV = H64_SQL.format(
    expr="'mask|' || CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)"
)

ORACLE["span_corruption_masks"] = f"""
    WITH pos AS (
        SELECT lang, doc_id,
               unnest(generate_series(0, len(string_split(text, ' ')) - 1))
                   AS i
        FROM documents
    ),
    flagged AS (
        SELECT lang,
               CASE WHEN {_SPAN_H} % 100 < {SPAN_MASK_PCT}
                    THEN 1 ELSE 0 END AS is_masked,
               CASE WHEN {_SPAN_H} % 100 < {SPAN_MASK_PCT}
                     AND NOT (i > 0
                              AND {_SPAN_H_PREV} % 100 < {SPAN_MASK_PCT})
                    THEN 1 ELSE 0 END AS is_span_start
        FROM pos
    )
    SELECT lang,
           COUNT(*) AS n_tokens,
           CAST(SUM(is_masked) AS BIGINT) AS n_masked,
           ROUND(CAST(SUM(is_masked) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mask_rate,
           CAST(SUM(is_span_start) AS BIGINT) AS n_spans,
           ROUND(CAST(SUM(is_masked) AS DOUBLE)
                 / CAST(NULLIF(SUM(is_span_start), 0) AS DOUBLE), 4)
               AS avg_span_len
    FROM flagged GROUP BY lang ORDER BY lang
"""

QUERIES["span_corruption_masks"] = span_corruption_masks


# ---------------------------------------------------------------------------
# Data-constrained scaling accounting (Muennighoff et al. 2023,
# "Scaling Data-Constrained Language Models"): when the unique-token
# budget is exhausted, repeated epochs still help, but each repeat is
# worth less — the paper fits an exponential value decay in the number
# of repeats.  Here the decay schedule is quantized to INTEGER
# MILLI-TOKENS per unique token (epoch k repeats are worth
# round(1000 * DATA_DECAY^k) milli-tokens each), embedded as driver-
# side literals in BOTH engines, so every effective-token figure is
# exact integer arithmetic with one final division — the same
# determinism contract as the HLL/unigram milli-nat convention.
#
# Scale shape: both audits are ONE corpus scan collapsing to a 1-row
# aggregate (total/unique token masses), then literal-spine explodes
# over epoch counts / quality thresholds — no joins, no windows, no
# second pass.  At 100 TB the scan is the whole cost; the accounting
# itself is constant-size.

DATA_DECAY = 0.75     # per-repeat value retention (epoch k worth DECAY^k)
EPOCH_CAP = 12        # decay table length; epochs clamp here
W_MILLI = [round(1000 * DATA_DECAY**k) for k in range(EPOCH_CAP + 1)]
# S_MILLI[k] = milli-value of k full epochs = sum of the first k weights
S_MILLI = [sum(W_MILLI[:k]) for k in range(EPOCH_CAP + 1)]
DECAY_CURVE_EPOCHS = 8    # rows emitted by the decay curve
BUDGET_MULT = 4           # trade-off budget = 4x the full corpus


def epoch_token_value_decay(spark: SparkSession, sf: str) -> DataFrame:
    """Repeated-token value curve: for 1..8 training epochs over the
    full corpus, raw tokens seen vs effective tokens under the
    repetition-discount schedule, the marginal value of the last
    epoch, and the efficiency ratio — the table that says when another
    epoch over the same data stops paying for its compute."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    s_arr = F.array(*[F.lit(s) for s in S_MILLI])
    w_arr = F.array(*[F.lit(w) for w in W_MILLI])
    u = docs.agg(
        F.sum(F.size(F.split("text", " "))).alias("ut")
    )
    return (
        u.select(
            "ut",
            F.explode(
                F.array(
                    *[F.lit(e) for e in range(1, DECAY_CURVE_EPOCHS + 1)]
                )
            ).alias("epochs"),
        )
        .select(
            "epochs",
            (F.col("ut") * F.col("epochs")).alias("raw_tokens"),
            (
                F.col("ut") * F.element_at(s_arr, F.col("epochs") + 1)
                / F.lit(1000)
            ).cast("long").alias("effective_tokens"),
            (
                F.col("ut") * F.element_at(w_arr, F.col("epochs"))
                / F.lit(1000)
            ).cast("long").alias("marginal_tokens"),
            F.round(
                F.element_at(s_arr, F.col("epochs") + 1).cast("double")
                / (F.lit(1000.0) * F.col("epochs")),
                6,
            ).alias("efficiency"),
        )
        .orderBy("epochs")
    )


def _sql_list(vals) -> str:
    return "[" + ", ".join(str(v) for v in vals) + "]"


ORACLE["epoch_token_value_decay"] = f"""
    WITH u AS (
        SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ut
        FROM documents
    ),
    e AS (SELECT unnest(generate_series(1, {DECAY_CURVE_EPOCHS})) AS epochs)
    SELECT CAST(epochs AS INT) AS epochs,
           ut * epochs AS raw_tokens,
           CAST(ut * ({_sql_list(S_MILLI)}[epochs + 1]) // 1000 AS BIGINT)
               AS effective_tokens,
           CAST(ut * ({_sql_list(W_MILLI)}[epochs]) // 1000 AS BIGINT)
               AS marginal_tokens,
           ROUND(CAST({_sql_list(S_MILLI)}[epochs + 1] AS DOUBLE)
                 / (1000.0 * epochs), 6) AS efficiency
    FROM u CROSS JOIN e ORDER BY epochs
"""

QUERIES["epoch_token_value_decay"] = epoch_token_value_decay


TRADEOFF_MIN_CHARS = [0, 150, 250, 350]


def data_constrained_tradeoff(spark: SparkSession, sf: str) -> DataFrame:
    """Unique-tokens vs epochs trade-off at a fixed compute budget of
    BUDGET_MULT x the full corpus: each row keeps only documents with
    n_chars >= threshold (a quality proxy that needs no ranking pass),
    spends the SAME token budget by repeating the smaller unique set
    for more epochs, and scores the strategy in effective tokens under
    the repetition-discount schedule — the Muennighoff question
    ("filter harder and repeat, or keep everything for one pass?") as
    a one-scan table.  Epochs clamp at EPOCH_CAP; the budget remainder
    is a partial epoch valued at the next weight."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    n_tok = F.size(F.split("text", " "))
    aggs = []
    for t in TRADEOFF_MIN_CHARS:
        keep = F.col("n_chars") >= t
        aggs.append(F.sum(F.when(keep, n_tok)).alias(f"u{t}"))
        aggs.append(F.sum(keep.cast("long")).alias(f"d{t}"))
    row = docs.agg(*aggs)
    s_arr = F.array(*[F.lit(s) for s in S_MILLI])
    w_arr = F.array(*[F.lit(w) for w in W_MILLI])
    strat = row.select(
        (F.col(f"u{TRADEOFF_MIN_CHARS[0]}") * F.lit(BUDGET_MULT)).alias(
            "budget"
        ),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("min_chars"),
                        F.col(f"d{t}").alias("n_docs"),
                        F.coalesce(F.col(f"u{t}"), F.lit(0)).alias("u"),
                    )
                    for t in TRADEOFF_MIN_CHARS
                ]
            )
        ).alias("s"),
    ).select("budget", "s.min_chars", "s.n_docs", "s.u")
    # exact integer epoch count (`div`, not double `/` + cast — the
    # HLL shiftright lesson applies to any cross-engine integer math)
    epochs = F.least(F.expr("budget div u"), F.lit(EPOCH_CAP))
    leftover = F.greatest(
        F.col("budget") - epochs * F.col("u"), F.lit(0)
    )
    eff_milli = F.col("u") * F.element_at(
        s_arr, (epochs + 1).cast("int")
    ) + leftover * F.element_at(w_arr, (epochs + 1).cast("int"))
    return (
        strat.filter(F.col("u") > 0)
        .select(
            "min_chars",
            "n_docs",
            F.col("u").alias("unique_tokens"),
            epochs.cast("int").alias("epochs"),
            (eff_milli / F.lit(1000)).cast("long").alias(
                "effective_tokens"
            ),
            F.round(
                eff_milli.cast("double")
                / (F.lit(1000.0) * F.col("budget")),
                6,
            ).alias("budget_efficiency"),
        )
        .orderBy("min_chars")
    )


def _tradeoff_branch_sql(t: int) -> str:
    return f"""SELECT {t} AS min_chars, d{t} AS n_docs,
               COALESCE(u{t}, 0) AS u, budget FROM a"""


ORACLE["data_constrained_tradeoff"] = f"""
    WITH a AS (
        SELECT
            {", ".join(
                f"CAST(SUM(CASE WHEN n_chars >= {t} THEN len(string_split(text, ' ')) END) AS BIGINT) AS u{t}, "
                f"CAST(SUM(CASE WHEN n_chars >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS d{t}"
                for t in TRADEOFF_MIN_CHARS
            )},
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                * {BUDGET_MULT} AS budget
        FROM documents
    ),
    strat AS (
        {" UNION ALL ".join(_tradeoff_branch_sql(t) for t in TRADEOFF_MIN_CHARS)}
    ),
    e AS (
        SELECT min_chars, n_docs, u, budget,
               LEAST(budget // u, {EPOCH_CAP}) AS epochs
        FROM strat WHERE u > 0
    ),
    m AS (
        SELECT *,
               u * ({_sql_list(S_MILLI)}[CAST(epochs AS INT) + 1])
               + GREATEST(budget - epochs * u, 0)
                 * ({_sql_list(W_MILLI)}[CAST(epochs AS INT) + 1])
                   AS eff_milli
        FROM e
    )
    SELECT CAST(min_chars AS INT) AS min_chars, n_docs,
           u AS unique_tokens,
           CAST(epochs AS INT) AS epochs,
           CAST(eff_milli // 1000 AS BIGINT) AS effective_tokens,
           ROUND(CAST(eff_milli AS DOUBLE) / (1000.0 * budget), 6)
               AS budget_efficiency
    FROM m ORDER BY min_chars
"""

QUERIES["data_constrained_tradeoff"] = data_constrained_tradeoff


# ---------------------------------------------------------------------------
# DoReMi-class domain reweighting (Xie et al. 2023): one
# multiplicative-weights update of the per-domain (source) mixture —
# domains whose quality score trails the corpus mean get upweighted
# proportionally to exp(eta * excess), the Group-DRO step DoReMi runs
# with a proxy model's excess loss.  Here the excess signal is the
# hashed-feature classifier's per-token score deficit (scoring.py) —
# a real deployment swaps in proxy-model losses without touching the
# dataflow, the documented swap-point pattern.
#
# Scale shape: ONE corpus scan (token explode -> literal-array weight
# lookup) collapsing to a SOURCES-row aggregate; the mean/normalizer
# terms are 1-row aggregates of that bounded table crossJoined back
# (intentional BNLJ, constant probe).  Division/exp happen on the
# bounded table only; outputs round to 6 decimals (the reid_risk
# libm-margin convention — no argmax rides on the exp).

DOREMI_ETA = 1.0  # multiplicative-weights step size


def doremi_domain_reweighting(spark: SparkSession, sf: str) -> DataFrame:
    """Per source: docs, tokens, token share (the reference mixture),
    per-token classifier score vs the corpus mean, the clipped excess,
    and the DoReMi-updated mixture weight
    w'_s ∝ share_s * exp(eta * excess_s / 1000), normalized."""
    from pinterest_data_pipeline6_spark.operators.scoring import (
        _doc_scores,
    )

    per_src = (
        _doc_scores(spark, sf)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("total_milli").alias("sum_milli"),
        )
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("g_tokens"),
        F.sum("sum_milli").alias("g_milli"),
    )
    j = per_src.crossJoin(F.broadcast(tot))
    mean_s = F.round(
        F.col("sum_milli").cast("double") / F.col("n_tokens").cast("double"),
        9,
    )
    mean_g = F.round(
        F.col("g_milli").cast("double") / F.col("g_tokens").cast("double"),
        9,
    )
    excess = F.greatest(mean_g - mean_s, F.lit(0.0))
    share = F.col("n_tokens").cast("double") / F.col("g_tokens").cast(
        "double"
    )
    raw = share * F.exp(F.lit(DOREMI_ETA) * excess / F.lit(1000.0))
    scored = j.select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("share"),
        mean_s.alias("mean_s"),
        excess.alias("excess"),
        raw.alias("raw_w"),
    )
    norm = scored.agg(F.sum("raw_w").alias("z"))
    return (
        scored.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("share", 6).alias("token_share"),
            F.round("mean_s", 6).alias("mean_score_milli"),
            F.round("excess", 6).alias("excess_milli"),
            F.round(F.col("raw_w") / F.col("z"), 6).alias("new_weight"),
        )
        .orderBy("source")
    )


def _doremi_sql() -> str:
    from pinterest_data_pipeline6_spark.operators.scoring import (
        _DOC_SCORES_SQL,
    )

    return f"""
    WITH ds AS ({_DOC_SCORES_SQL}),
    per_src AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(total_milli) AS BIGINT) AS sum_milli
        FROM ds GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS g_tokens,
               CAST(SUM(sum_milli) AS BIGINT) AS g_milli
        FROM per_src
    ),
    scored AS (
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / CAST(g_tokens AS DOUBLE) AS share,
               ROUND(CAST(sum_milli AS DOUBLE)
                     / CAST(n_tokens AS DOUBLE), 9) AS mean_s,
               GREATEST(ROUND(CAST(g_milli AS DOUBLE)
                              / CAST(g_tokens AS DOUBLE), 9)
                        - ROUND(CAST(sum_milli AS DOUBLE)
                                / CAST(n_tokens AS DOUBLE), 9),
                        0.0) AS excess
        FROM per_src CROSS JOIN tot
    ),
    w AS (
        SELECT *,
               share * exp({DOREMI_ETA} * excess / 1000.0) AS raw_w
        FROM scored
    )
    SELECT source, n_docs, n_tokens,
           ROUND(share, 6) AS token_share,
           ROUND(mean_s, 6) AS mean_score_milli,
           ROUND(excess, 6) AS excess_milli,
           ROUND(raw_w / (SELECT SUM(raw_w) FROM w), 6) AS new_weight
    FROM w ORDER BY source
"""


ORACLE["doremi_domain_reweighting"] = _doremi_sql()
QUERIES["doremi_domain_reweighting"] = doremi_domain_reweighting
