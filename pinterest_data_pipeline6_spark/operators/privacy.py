"""Privacy & data-governance operators for a training-data pipeline:
PII detection/redaction, benchmark decontamination, and source-mixture
weighting. Beyond-reference capabilities (the reference repo has no
privacy surface — SURVEY.md §2 covers cleaning only), but standard
requirements for any corpus feeding model training at 100 TB.

Spark-first shapes:

- **PII redaction**: pure Catalyst regex ops (`regexp_extract_all`,
  `regexp_replace`) — per-row, embarrassingly parallel, whole-stage
  codegen, no shuffle until the per-source rollup. The synthetic corpus
  carries no PII, so a deterministic injection step (keyed on doc_id)
  plants emails/phones first; both engines derive the identical
  augmented text, then redact it with the identical pattern. Patterns
  stay in the common Java-regex ∩ RE2 subset (no lookaround, no
  backrefs) so Spark and DuckDB match the same spans.
- **decontamination**: GPT-3-style exact n-gram overlap — a corpus
  document is contaminated if ANY of its 8-gram shingles appears in the
  benchmark split. Formulated as shingle-hash left-semi join: the
  benchmark side is tiny relative to the corpus, so at scale it
  broadcasts and the corpus is never shuffled; the flag-count rollup is
  the only aggregation.
- **mixture weights**: temperature-scaled source sampling
  (w_s ∝ n_s^alpha, alpha=0.5 — the multilingual-sampling trick that
  up-weights small sources) — two hash aggs and a broadcast of one
  scalar; the window-total formulation keeps it a single pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pinterest_data_pipeline6_spark.operators.dedup import _exploded_shingles
from pinterest_data_pipeline6_spark.operators.textops import H64_SQL, _h64_spark
from pinterest_data_pipeline6_spark.sources.readers import table, widen_small_scan

# Java-regex ∩ RE2 subset — identical match semantics in Spark and DuckDB
EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PHONE_RE = "555-[0-9]{4}"

DECONTAM_N = 8  # exact n-gram width for benchmark-overlap flagging
BENCHMARK_SOURCES = ("src0", "src1")  # stand-in benchmark split
MIX_ALPHA = 0.5  # temperature for source re-weighting
MIX_BUDGET = 1000  # sampled-doc budget the weights are scaled to


def _augmented(docs: DataFrame) -> DataFrame:
    """Deterministically plant PII markers: every 7th doc gains an
    email, every 11th a phone number (both keyed on doc_id, so the
    oracle derives the identical augmented text)."""
    email = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(F.lit(" call 555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    return docs.withColumn("aug", F.concat(F.col("text"), email, phone))


def pii_redaction_stats(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub accounting per source: how many docs carried PII, how
    many emails/phones were found, and the total redacted-text length
    (which proves the rewrite applied the same spans in both engines).
    At 100 TB this is a map-only pass — the regexes run inside codegen
    on each partition; only per-source partial counts shuffle."""
    docs = _augmented(table(spark, sf, "documents"))
    n_emails = F.size(F.regexp_extract_all(F.col("aug"), F.lit(EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(F.col("aug"), F.lit(PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("aug"), EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return (
        docs.select(
            "source",
            n_emails.alias("ne"),
            n_phones.alias("np"),
            F.length(redacted).alias("rlen"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("ne") + F.col("np") > 0, 1).otherwise(0)).alias("n_with_pii"),
            F.sum("ne").alias("n_emails"),
            F.sum("np").alias("n_phones"),
            F.sum("rlen").alias("redacted_len"),
        )
        .orderBy("source")
    )


def decontamination_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ANY exact
    8-gram with the benchmark split (sources src0/src1) — the standard
    exact-substring contamination rule. Per lang: corpus size, flagged
    count, clean count.

    Plan shape at scale: benchmark shingle hashes (small, deduped)
    BROADCAST into a left-semi join against the exploded corpus
    shingles; the corpus never shuffles on the shingle key, and the
    per-doc flag is a distinct on doc_id after the semi join. Hash is
    engine-local (equality-only join key), so each engine may use its
    native 64-bit hash."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    bench = docs.filter(F.col("source").isin(*BENCHMARK_SOURCES))
    corpus = docs.filter(~F.col("source").isin(*BENCHMARK_SOURCES))
    bench_sh = (
        _exploded_shingles(bench, "doc_id", n=DECONTAM_N)
        .select(F.xxhash64("shingle").alias("h"))
        .distinct()
    )
    corpus_sh = _exploded_shingles(corpus, "doc_id", "lang", n=DECONTAM_N).select(
        "doc_id", "lang", F.xxhash64("shingle").alias("h")
    )
    flagged = (
        corpus_sh.join(F.broadcast(bench_sh), "h", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("flagged", F.lit(1))
    )
    return (
        corpus.select("doc_id", "lang")
        .join(flagged, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_corpus_docs"),
            F.sum(F.coalesce(F.col("flagged"), F.lit(0))).alias("n_flagged"),
            F.sum(F.when(F.col("flagged").isNull(), 1).otherwise(0)).alias("n_clean"),
        )
        .orderBy("lang")
    )


def source_mixture_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled source mixing: weight_s ∝ count_s^0.5,
    normalized, with the expected draw count for a 1000-doc budget —
    the up-weight-the-tail sampling rule used for multilingual /
    multi-source training mixes. One hash agg + a window total (the
    total broadcasts; no second scan of the data)."""
    docs = table(spark, sf, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = F.pow(F.col("n_docs").cast("double"), MIX_ALPHA)
    total = F.sum(w).over(Window.partitionBy())
    return (
        counts.select(
            "source",
            "n_docs",
            F.round(w / total, 6).alias("weight"),
            F.round(F.lit(MIX_BUDGET) * w / total, 2).alias("expected_draws"),
        )
        .orderBy("source")
    )


SEM_BENCH_MOD = 10  # vec_id % 10 == 0 plays the benchmark embedding set
SEM_COS_FLAG = 0.3  # cosine above this ⇒ semantically contaminated


def semantic_decontamination(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic (embedding-space) decontamination — the complement of
    the exact n-gram rule in ``decontamination_overlap``: a corpus
    vector is contaminated when ANY benchmark vector in its LSH bucket
    has cosine > 0.3 (catches paraphrased benchmark leakage that exact
    n-grams miss). Per label: corpus size, flagged, clean.

    Scale shape: the benchmark side is tiny relative to the corpus, so
    it BROADCASTS; the LSH-bucket equality keys the join, so each
    corpus vector is compared only against bucket-mates, and the
    corpus is never shuffled. Same signature/cosine primitives (and
    therefore bit-identical oracle math) as the similarity family."""
    from pinterest_data_pipeline6_spark.operators.dedup import _dot64, _norm64
    from pinterest_data_pipeline6_spark.operators.similarity import _signature

    emb = widen_small_scan(table(spark, sf, "embeddings"))
    # bench and corpus both derive from `signed`; recomputing the
    # map-only signature fold per branch is CHEAPER than persisting it
    # (a localCheckpoint here must serialize the full embedding arrays
    # — measured slower than the 0.3 s recompute at sf0.1)
    signed = emb.select(
        "vec_id",
        "label",
        "embedding",
        _signature("embedding").alias("bucket"),
        _norm64(F.col("embedding")).alias("nrm"),
    )
    bench = signed.filter(F.col("vec_id") % SEM_BENCH_MOD == 0).select(
        F.col("embedding").alias("bv"),
        F.col("bucket").alias("b_bucket"),
        F.col("nrm").alias("b_nrm"),
    )
    corpus = signed.filter(F.col("vec_id") % SEM_BENCH_MOD != 0)
    cos = _dot64(F.col("embedding"), F.col("bv")) / (F.col("nrm") * F.col("b_nrm"))
    flagged = (
        corpus.join(F.broadcast(bench), F.col("bucket") == F.col("b_bucket"))
        .filter(cos > SEM_COS_FLAG)
        .select("vec_id")
        .distinct()
        .withColumn("flagged", F.lit(1))
    )
    return (
        corpus.select("vec_id", "label")
        .join(flagged, "vec_id", "left")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_corpus"),
            F.sum(F.coalesce(F.col("flagged"), F.lit(0))).cast("bigint").alias("n_flagged"),
            F.sum(F.when(F.col("flagged").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clean"),
        )
        .orderBy("label")
    )


K_ANON = 5  # minimum equivalence-class size considered re-id safe
BAL_BAND = 1000  # account-balance generalization width (the QI coarsening)


def k_anonymity_report(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit over the customer table: rows sharing the same
    quasi-identifier tuple (nation, market segment, generalized
    account-balance band) form an equivalence class; any class smaller
    than k=5 is a re-identification risk (Sweeney's k-anonymity — the
    standard release-gate check before person-level data feeds training
    or analytics). Emits the class-size-band histogram a governance
    dashboard shows: per band, how many classes and individuals sit
    there and whether the band is below the k threshold.

    Scale shape: ONE hash aggregate over the QI tuple (map-side
    partials — the shuffle carries one row per distinct QI combination,
    not per person), then a re-aggregate of the tiny class table into
    ≤4 band rows. No window, no join; at 100 TB this is a single
    all-reduce whose width is the QI-space cardinality."""
    cust = table(spark, sf, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / BAL_BAND).cast("int").alias("bal_band"),
    ).agg(F.count("*").alias("class_size"))
    band = (
        F.when(F.col("class_size") == 1, "1")
        .when(F.col("class_size") <= 4, "2-4")
        .when(F.col("class_size") <= 9, "5-9")
        .otherwise("10+")
    )
    return (
        classes.select(band.alias("size_band"), "class_size")
        .groupBy("size_band")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_individuals"),
            F.min("class_size").cast("bigint").alias("min_class_size"),
            F.max("class_size").cast("bigint").alias("max_class_size"),
            F.max((F.col("class_size") < K_ANON).cast("bigint")).alias("at_risk"),
        )
        .orderBy("size_band")
    )


L_DIVERSE = 3  # minimum distinct sensitive values per QI class


def l_diversity_check(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit — k-anonymity's companion check: a class can
    be large (k-safe) yet still leak if everyone in it shares the same
    SENSITIVE value (homogeneity attack). Here the quasi-identifiers
    are (nation, balance band) and the sensitive attribute is the
    market segment; a class is l-diverse when it contains ≥3 distinct
    segments. Emits per nation: class count, how many classes fail
    l-diversity, the worst (minimum) diversity, and the population in
    failing classes — the drill-down that tells a reviewer WHERE
    generalization must coarsen before release.

    Scale shape: one hash aggregate keyed on the QI tuple computing
    count + count_distinct(sensitive) (Spark plans distinct-agg as a
    two-phase expand over the class key — both shuffles carry class
    rows, not people), then a per-nation re-aggregate of the class
    table. No join, no window."""
    cust = table(spark, sf, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / BAL_BAND).cast("int").alias("bal_band"),
    ).agg(
        F.count("*").alias("class_size"),
        F.count_distinct("c_mktsegment").alias("l_div"),
    )
    failing = F.col("l_div") < L_DIVERSE
    return (
        classes.groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum(failing.cast("bigint")).cast("bigint").alias("n_failing"),
            F.min("l_div").cast("bigint").alias("min_diversity"),
            F.sum(F.when(failing, F.col("class_size")).otherwise(0))
            .cast("bigint")
            .alias("pop_at_risk"),
        )
        .orderBy("c_nationkey")
    )


def corpus_drift_kl(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-drift monitor: KL divergence (base 2, add-one
    smoothed) between the language mix of two corpus halves (doc_id
    parity stands in for snapshot A vs snapshot B). Emits the per-
    language KL contribution — the drill-down a data-governance
    dashboard shows when the aggregate drift alarm fires.

    One scan, one hash agg to a #languages-row table; the totals come
    from an unpartitioned window over that tiny aggregate (bounded by
    language cardinality, never by corpus size), so the plan is flat
    regardless of input scale."""
    docs = table(spark, sf, "documents")
    counts = docs.groupBy("lang").agg(
        F.sum((F.col("doc_id") % 2 == 0).cast("bigint")).alias("n_p"),
        F.sum((F.col("doc_id") % 2 == 1).cast("bigint")).alias("n_q"),
    )
    w = Window.partitionBy()
    p = (F.col("n_p") + 1) / (F.sum("n_p").over(w) + F.count("*").over(w))
    q = (F.col("n_q") + 1) / (F.sum("n_q").over(w) + F.count("*").over(w))
    return (
        counts.select(
            "lang",
            "n_p",
            "n_q",
            F.round(p, 6).alias("p"),
            F.round(q, 6).alias("q"),
            F.round(p * F.log2(p / q), 6).alias("kl_term"),
        )
        .orderBy("lang")
    )


_BENCH_IN = ", ".join(f"'{s}'" for s in BENCHMARK_SOURCES)

_SHINGLES8_SQL = f"""list_transform(
    generate_series(1, len(string_split(text,' ')) - {DECONTAM_N - 1}),
    i -> array_to_string(string_split(text,' ')[i:i+{DECONTAM_N - 1}], ' '))"""

ORACLE: dict[str, str] = {
    "pii_redaction_stats": f"""
        WITH aug AS (
            SELECT source,
                   text ||
                   CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                        ELSE '' END ||
                   CASE WHEN doc_id % 11 = 0
                        THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE '' END AS aug
            FROM documents
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN ne + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_pii,
               CAST(SUM(ne) AS BIGINT) AS n_emails,
               CAST(SUM(np) AS BIGINT) AS n_phones,
               CAST(SUM(rlen) AS BIGINT) AS redacted_len
        FROM (
            SELECT source,
                   len(regexp_extract_all(aug, '{EMAIL_RE}')) AS ne,
                   len(regexp_extract_all(aug, '{PHONE_RE}')) AS np,
                   length(regexp_replace(regexp_replace(aug, '{EMAIL_RE}', '[EMAIL]', 'g'),
                                         '{PHONE_RE}', '[PHONE]', 'g')) AS rlen
            FROM aug
        )
        GROUP BY source
    """,
    # same flag rule, engine-native hash (equality-only join key): the
    # portable md5-bigint keeps DuckDB's side deterministic
    "decontamination_overlap": f"""
        WITH bench_sh AS (
            SELECT DISTINCT {H64_SQL.format(expr="shingle")} AS h
            FROM (SELECT unnest({_SHINGLES8_SQL}) AS shingle
                  FROM documents WHERE source IN ({_BENCH_IN}))
        ),
        corpus AS (
            SELECT doc_id, lang, text FROM documents
            WHERE source NOT IN ({_BENCH_IN})
        ),
        flagged AS (
            SELECT DISTINCT doc_id
            FROM (SELECT doc_id, {H64_SQL.format(expr="shingle")} AS h
                  FROM (SELECT doc_id, unnest({_SHINGLES8_SQL}) AS shingle FROM corpus))
            WHERE h IN (SELECT h FROM bench_sh)
        )
        SELECT c.lang, COUNT(*) AS n_corpus_docs,
               CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               CAST(SUM(CASE WHEN f.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
        FROM corpus c LEFT JOIN flagged f ON c.doc_id = f.doc_id
        GROUP BY c.lang
    """,
    "source_mixture_weights": f"""
        WITH counts AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        )
        SELECT source, n_docs,
               ROUND(pow(n_docs, {MIX_ALPHA}) / SUM(pow(n_docs, {MIX_ALPHA})) OVER (), 6)
                   AS weight,
               ROUND({MIX_BUDGET} * pow(n_docs, {MIX_ALPHA})
                     / SUM(pow(n_docs, {MIX_ALPHA})) OVER (), 2) AS expected_draws
        FROM counts
    """,
    "k_anonymity_report": f"""
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(FLOOR(c_acctbal / {BAL_BAND}) AS INT) AS bal_band,
                   COUNT(*) AS class_size
            FROM customer GROUP BY 1, 2, 3
        )
        SELECT CASE WHEN class_size = 1 THEN '1'
                    WHEN class_size <= 4 THEN '2-4'
                    WHEN class_size <= 9 THEN '5-9'
                    ELSE '10+' END AS size_band,
               COUNT(*) AS n_classes,
               CAST(SUM(class_size) AS BIGINT) AS n_individuals,
               CAST(MIN(class_size) AS BIGINT) AS min_class_size,
               CAST(MAX(class_size) AS BIGINT) AS max_class_size,
               CAST(MAX(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
                   AS at_risk
        FROM classes GROUP BY 1
    """,
    "l_diversity_check": f"""
        WITH classes AS (
            SELECT c_nationkey,
                   CAST(FLOOR(c_acctbal / {BAL_BAND}) AS INT) AS bal_band,
                   COUNT(*) AS class_size,
                   COUNT(DISTINCT c_mktsegment) AS l_div
            FROM customer GROUP BY 1, 2
        )
        SELECT c_nationkey,
               COUNT(*) AS n_classes,
               CAST(SUM(CASE WHEN l_div < {L_DIVERSE} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_failing,
               CAST(MIN(l_div) AS BIGINT) AS min_diversity,
               CAST(SUM(CASE WHEN l_div < {L_DIVERSE} THEN class_size ELSE 0 END)
                    AS BIGINT) AS pop_at_risk
        FROM classes GROUP BY c_nationkey
    """,
    "corpus_drift_kl": """
        WITH counts AS (
            SELECT lang,
                   CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
                   CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_q
            FROM documents GROUP BY lang
        ),
        smoothed AS (
            SELECT lang, n_p, n_q,
                   (n_p + 1) / (SUM(n_p) OVER () + COUNT(*) OVER ()) AS p,
                   (n_q + 1) / (SUM(n_q) OVER () + COUNT(*) OVER ()) AS q
            FROM counts
        )
        SELECT lang, n_p, n_q,
               ROUND(p, 6) AS p,
               ROUND(q, 6) AS q,
               ROUND(p * log2(p / q), 6) AS kl_term
        FROM smoothed
    """,
}

def _semantic_decontam_sql() -> str:
    """Oracle for semantic_decontamination: same literal-hyperplane
    signature and left-fold cosine as the similarity oracles, so the
    bucket assignment and the threshold compare are bit-identical."""
    from pinterest_data_pipeline6_spark.operators.similarity import _SIG_SQL, _cos_sql

    return f"""
        WITH signed AS (
            SELECT vec_id, label, embedding, {_SIG_SQL} AS bucket FROM embeddings
        ),
        bench AS (SELECT * FROM signed WHERE vec_id % {SEM_BENCH_MOD} = 0),
        corpus AS (SELECT * FROM signed WHERE vec_id % {SEM_BENCH_MOD} <> 0),
        flagged AS (
            SELECT DISTINCT c.vec_id, 1 AS flagged
            FROM corpus c JOIN bench b ON c.bucket = b.bucket
            WHERE {_cos_sql("c.embedding", "b.embedding")} > {SEM_COS_FLAG}
        )
        SELECT label, COUNT(*) AS n_corpus,
               CAST(SUM(CASE WHEN f.flagged IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged,
               CAST(SUM(CASE WHEN f.flagged IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clean
        FROM corpus c LEFT JOIN flagged f ON c.vec_id = f.vec_id
        GROUP BY label
    """


ORACLE["semantic_decontamination"] = _semantic_decontam_sql()

def cross_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Train/val/test leakage audit: with documents routed into splits
    by the same content-stable hash as ``curation.dataset_split_counts``
    (h64(doc_id) mod 100 against 90/5 bounds), report — for each split
    pair — how many exact-text digests appear on BOTH sides and how
    many documents of the pair's second split are leaked (share a
    digest with the first).  ``decontamination_overlap`` guards the
    corpus against an external benchmark; this guards the corpus
    against ITSELF — exact duplicates straddling a split boundary are
    eval contamination no external list can catch.

    Shape: one digest-keyed hash aggregate folds the corpus to one row
    per distinct digest (high-cardinality shuffle key, partial-agg
    shrinks dup-heavy sources map-side), then a single global
    aggregate produces the six pair sums at once and ``stack`` unpivots
    the one-row result to the three pair rows — no self-join of the
    digest table, no second pass over the corpus."""
    from pinterest_data_pipeline6_spark.operators.curation import SPLIT_BOUNDS

    docs = table(spark, sf, "documents")
    pct = F.pmod(_h64_spark(F.col("doc_id").cast("string")), F.lit(100))
    split = (
        F.when(pct < SPLIT_BOUNDS[0], "train")
        .when(pct < SPLIT_BOUNDS[1], "val")
        .otherwise("test")
    )
    d = docs.select(F.md5("text").alias("digest"), split.alias("split"))

    def _in(s: str) -> Column:
        return F.max((F.col("split") == s).cast("int"))

    def _n(s: str) -> Column:
        return F.sum((F.col("split") == s).cast("int"))

    per_digest = d.groupBy("digest").agg(
        _in("train").alias("it"),
        _in("val").alias("iv"),
        _in("test").alias("ix"),
        _n("val").alias("nv"),
        _n("test").alias("nx"),
    )
    one = per_digest.agg(
        F.coalesce(F.sum(F.col("it") * F.col("iv")), F.lit(0)).alias("tv_d"),
        F.coalesce(
            F.sum(F.when(F.col("it") == 1, F.col("nv")).otherwise(0)), F.lit(0)
        ).alias("tv_docs"),
        F.coalesce(F.sum(F.col("it") * F.col("ix")), F.lit(0)).alias("tx_d"),
        F.coalesce(
            F.sum(F.when(F.col("it") == 1, F.col("nx")).otherwise(0)), F.lit(0)
        ).alias("tx_docs"),
        F.coalesce(F.sum(F.col("iv") * F.col("ix")), F.lit(0)).alias("vx_d"),
        F.coalesce(
            F.sum(F.when(F.col("iv") == 1, F.col("nx")).otherwise(0)), F.lit(0)
        ).alias("vx_docs"),
    )
    return one.selectExpr(
        "stack(3, 'train|val',  CAST(tv_d AS BIGINT), CAST(tv_docs AS BIGINT),"
        "         'train|test', CAST(tx_d AS BIGINT), CAST(tx_docs AS BIGINT),"
        "         'val|test',   CAST(vx_d AS BIGINT), CAST(vx_docs AS BIGINT))"
        " AS (split_pair, shared_digests, leaked_docs)"
    ).orderBy("split_pair")


_SPLIT_SQL = f"""
    SELECT md5(text) AS digest,
           CASE WHEN pct < {{lo}} THEN 'train'
                WHEN pct < {{hi}} THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT text,
                 ({H64_SQL.format(expr="CAST(doc_id AS VARCHAR)")}) % 100 AS pct
          FROM documents)
"""

ORACLE_CROSS_SPLIT = """
    WITH d AS ({split_sql}),
    g AS (
        SELECT digest,
               MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS it,
               MAX(CASE WHEN split = 'val'   THEN 1 ELSE 0 END) AS iv,
               MAX(CASE WHEN split = 'test'  THEN 1 ELSE 0 END) AS ix,
               SUM(CASE WHEN split = 'val'   THEN 1 ELSE 0 END) AS nv,
               SUM(CASE WHEN split = 'test'  THEN 1 ELSE 0 END) AS nx
        FROM d GROUP BY digest
    ),
    o AS (
        SELECT COALESCE(SUM(it * iv), 0) AS tv_d,
               COALESCE(SUM(CASE WHEN it = 1 THEN nv ELSE 0 END), 0) AS tv_docs,
               COALESCE(SUM(it * ix), 0) AS tx_d,
               COALESCE(SUM(CASE WHEN it = 1 THEN nx ELSE 0 END), 0) AS tx_docs,
               COALESCE(SUM(iv * ix), 0) AS vx_d,
               COALESCE(SUM(CASE WHEN iv = 1 THEN nx ELSE 0 END), 0) AS vx_docs
        FROM g
    )
    SELECT 'train|val' AS split_pair, CAST(tv_d AS BIGINT) AS shared_digests,
           CAST(tv_docs AS BIGINT) AS leaked_docs FROM o
    UNION ALL
    SELECT 'train|test', CAST(tx_d AS BIGINT), CAST(tx_docs AS BIGINT) FROM o
    UNION ALL
    SELECT 'val|test', CAST(vx_d AS BIGINT), CAST(vx_docs AS BIGINT) FROM o
"""

QUERIES = {
    "pii_redaction_stats": pii_redaction_stats,
    "decontamination_overlap": decontamination_overlap,
    "source_mixture_weights": source_mixture_weights,
    "corpus_drift_kl": corpus_drift_kl,
    "k_anonymity_report": k_anonymity_report,
    "l_diversity_check": l_diversity_check,
    "semantic_decontamination": semantic_decontamination,
    "cross_split_leakage": cross_split_leakage,
}

def _cross_split_oracle() -> str:
    # import deferred: curation itself imports dedup/textops helpers
    from pinterest_data_pipeline6_spark.operators.curation import SPLIT_BOUNDS

    return ORACLE_CROSS_SPLIT.format(
        split_sql=_SPLIT_SQL.format(lo=SPLIT_BOUNDS[0], hi=SPLIT_BOUNDS[1])
    )


ORACLE["cross_split_leakage"] = _cross_split_oracle()


# --- DP-noised release (r6 window) -------------------------------------------

DP_EPSILONS = ("0.1", "1.0", "10.0")  # utility curve: strict -> loose budgets
DP_SALT = "dp|lang-hist|v1"  # seed domain for the deterministic noise draw


def dp_lang_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Differentially-private histogram release with a utility curve:
    the per-language document counts (a sensitivity-1 counting query)
    noised with Laplace(1/epsilon) at each budget in ``DP_EPSILONS``,
    reported next to the true count and the absolute error — the table
    a data-governance reviewer reads to pick the epsilon a public
    release can afford.

    SIMULATION-GRADE NOISE, deliberately: the Laplace draw is the
    inverse-CDF transform of a uniform derived from the portable
    60-bit hash of (salt, lang, epsilon) — deterministic, so the
    cross-engine oracle differential and replays agree bit-for-bit. A
    production release would substitute fresh secure randomness for
    the hash-uniform; every other line (sensitivity, scale, the
    epsilon accounting, the error audit) is the production shape.

    100 TB shape: one partial+final count per language, then the noise
    arithmetic and the 3-epsilon explode run on the #langs-row
    aggregate — bounded by label cardinality, never corpus size."""
    docs = table(spark, sf, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("true_count"))
    # epsilon travels as a STRING label (the double value rides along
    # for arithmetic): double-to-string rendering differs across
    # engines ('10' vs '10.0'), and the driver hashes rendered values
    eps = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("epsilon"), F.lit(float(s)).alias("epsv")
                )
                for s in DP_EPSILONS
            ]
        )
    ).alias("e")
    seeded = counts.select("lang", "true_count", eps).select(
        "lang", "true_count", F.col("e.epsilon").alias("epsilon"),
        F.col("e.epsv").alias("epsv"),
    )
    # uniform in (0,1): (h64 % 1e6 + 0.5) / 1e6 — never exactly 0 or 1,
    # so the log below is always finite
    u = (
        F.pmod(
            _h64_spark(
                F.concat_ws("|", F.lit(DP_SALT), F.col("lang"), F.col("epsilon"))
            ),
            F.lit(1_000_000),
        )
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    v = u - F.lit(0.5)  # centered uniform in (-0.5, 0.5)
    # inverse-CDF Laplace with scale b = sensitivity/epsilon = 1/epsilon
    noise = (
        -F.signum(v) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v)) / F.col("epsv")
    )
    return (
        seeded.select(
            "lang",
            "epsilon",
            "true_count",
            F.round(F.col("true_count") + noise, 4).alias("noisy_count"),
            F.round(F.abs(noise), 4).alias("abs_error"),
        )
        .orderBy("lang", "epsilon")
    )


_DP_EPS_VALUES = ", ".join(f"('{e}', CAST({e} AS DOUBLE))" for e in DP_EPSILONS)
_DP_U_SQL = (
    "(("
    + H64_SQL.format(expr=f"('{DP_SALT}' || '|' || lang || '|' || epsilon)")
    + " % 1000000) + 0.5) / 1000000.0"
)

ORACLE["dp_lang_histogram"] = f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS true_count FROM documents GROUP BY lang
    ),
    seeded AS (
        SELECT c.lang, c.true_count, e.epsilon, e.epsv
        FROM counts c CROSS JOIN (VALUES {_DP_EPS_VALUES}) AS e(epsilon, epsv)
    ),
    noised AS (
        SELECT lang, epsilon, true_count,
               -sign(({_DP_U_SQL}) - 0.5)
                   * ln(1.0 - 2.0 * abs(({_DP_U_SQL}) - 0.5)) / epsv AS noise
        FROM seeded
    )
    SELECT lang, epsilon, CAST(true_count AS BIGINT) AS true_count,
           ROUND(true_count + noise, 4) AS noisy_count,
           ROUND(ABS(noise), 4) AS abs_error
    FROM noised ORDER BY lang, epsilon
"""

QUERIES["dp_lang_histogram"] = dp_lang_histogram


PSEUDO_SALT = "pdp6-tokenization-v1"  # rotation handle: bump to re-key


def pseudonymize_consistency(spark: SparkSession, sf: str) -> DataFrame:
    """Pseudonymization audit — the governance gate run before sharing
    an events extract: user ids are replaced by a salted keyed hash
    (``h64(salt | user_id)``), and the audit verifies per event type
    that (a) the tokenization is injective on this corpus (distinct
    pseudonyms == distinct users — a collision would silently merge two
    users' histories) and (b) re-keying preserved activity structure:
    the max events-per-PSEUDONYM (grouped by pseudo_id alone) equals
    the max events-per-USER (grouped by user_id alone).  The two maxes
    are computed from SEPARATE groupings — a collision that merged two
    users would inflate the pseudonym-grouped count above every
    user-grouped count and flip ``structure_preserved`` even if the
    distinct counts were somehow masked.

    100 TB shape: the pseudonym is a row-local projection (no lookup
    table to join or protect); each grouping is one partial+final agg
    on a high-cardinality key (well-spread shuffle) whose per-type
    rollups are slim, and the final comparison joins two #type-row
    aggregates."""
    ev = table(spark, sf, "events")
    pseudo = _h64_spark(
        F.concat(F.lit(PSEUDO_SALT + "|"), F.col("user_id").cast("string"))
    )
    base = ev.select(
        "event_type", F.col("user_id"), pseudo.alias("pseudo_id")
    )
    by_user = (
        base.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.max("n").alias("max_events_per_user"),
        )
    )
    by_pseudo = (
        base.groupBy("event_type", "pseudo_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pseudo"),
            F.max("n").alias("max_events_per_pseudo"),
        )
    )
    return (
        by_user.join(by_pseudo, "event_type")
        .select(
            "event_type",
            "n_users",
            "n_pseudo",
            (F.col("n_users") == F.col("n_pseudo")).alias("injective"),
            "max_events_per_user",
            "max_events_per_pseudo",
            (
                F.col("max_events_per_user")
                == F.col("max_events_per_pseudo")
            ).alias("structure_preserved"),
        )
        .orderBy("event_type")
    )


QUERIES["pseudonymize_consistency"] = pseudonymize_consistency
ORACLE["pseudonymize_consistency"] = f"""
    WITH base AS (
        SELECT event_type, user_id,
               {H64_SQL.format(expr="'{salt}|' || CAST(user_id AS VARCHAR)")}
                   AS pseudo_id
        FROM events
    ),
    by_user AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MAX(n) AS BIGINT) AS max_events_per_user
        FROM (SELECT event_type, user_id, COUNT(*) AS n
              FROM base GROUP BY 1, 2)
        GROUP BY event_type
    ),
    by_pseudo AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pseudo,
               CAST(MAX(n) AS BIGINT) AS max_events_per_pseudo
        FROM (SELECT event_type, pseudo_id, COUNT(*) AS n
              FROM base GROUP BY 1, 2)
        GROUP BY event_type
    )
    SELECT u.event_type, u.n_users, p.n_pseudo,
           u.n_users = p.n_pseudo AS injective,
           u.max_events_per_user, p.max_events_per_pseudo,
           u.max_events_per_user = p.max_events_per_pseudo
               AS structure_preserved
    FROM by_user u JOIN by_pseudo p ON u.event_type = p.event_type
    ORDER BY u.event_type
""".replace("{salt}", PSEUDO_SALT)


# ---------------------------------------------------------------------------
# round 7: retention-policy and right-to-erasure governance audits
# ---------------------------------------------------------------------------

# per-type retention horizon in DAYS, relative to the corpus watermark
# (the audit is day-granular by design: retention policies are stated
# in days, and day-level cutoffs keep every count an exact integer
# comparison in both engines)
RETENTION_DAYS = {
    "click": 14,
    "view": 7,
    "purchase": 90,
    "signup": 90,
    "error": 30,
}
_RETENTION_DEFAULT = 30


def retention_purge_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Retention-policy purge preview: per event type, how many rows
    are OLDER than the type's retention horizon counting back from the
    corpus watermark (global max event date) — the number a scheduled
    purge job would delete, surfaced as an audit before it runs.

    100 TB shape: raw events reduce to #types x #days rows in one
    partial+final agg; the watermark is an unpartitioned window over
    that bounded aggregate (never a second scan), and the expiry
    predicate is a day-level integer compare."""
    ev = table(spark, sf, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wm = F.max(F.col("d")).over(Window.partitionBy())
    ret = F.coalesce(
        *[
            F.when(F.col("event_type") == t, F.lit(d))
            for t, d in RETENTION_DAYS.items()
        ],
        F.lit(_RETENTION_DEFAULT),
    )
    scored = daily.select(
        "event_type",
        ret.alias("retention_days"),
        "n",
        (F.col("d") < F.date_sub(wm, ret)).cast("bigint").alias("expired"),
    )
    return (
        scored.groupBy("event_type", "retention_days")
        .agg(
            F.sum("n").cast("bigint").alias("n_total"),
            F.sum(F.col("n") * F.col("expired")).cast("bigint").alias(
                "n_expired"
            ),
            F.round(
                F.sum(F.col("n") * F.col("expired"))
                / F.sum("n").cast("double"),
                6,
            ).alias("expired_share"),
        )
        .orderBy("event_type")
    )


_RET_CASE = (
    "CASE "
    + " ".join(
        f"WHEN event_type = '{t}' THEN {d}" for t, d in RETENTION_DAYS.items()
    )
    + f" ELSE {_RETENTION_DEFAULT} END"
)

ORACLE["retention_purge_audit"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, {_RET_CASE} AS retention_days, n,
               CASE WHEN d < MAX(d) OVER ()
                             - CAST(({_RET_CASE}) AS INT)
                    THEN 1 ELSE 0 END AS expired
        FROM daily
    )
    SELECT event_type, retention_days,
           CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(SUM(n * expired) AS BIGINT) AS n_expired,
           ROUND(SUM(n * expired) / CAST(SUM(n) AS DOUBLE), 6)
               AS expired_share
    FROM scored GROUP BY 1, 2 ORDER BY event_type
"""

QUERIES["retention_purge_audit"] = retention_purge_audit


ERASURE_MOD = 37  # deterministic stand-in for a deletion-request list


def right_to_erasure_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Right-to-erasure (GDPR art. 17) sweep: given a deletion-request
    list (stood in deterministically by customers whose salted hash ≡ 0
    mod {ERASURE_MOD}), count the rows and distinct subjects each table
    still holds for those users — the audit that proves an erasure job
    actually erased, run per table touchpoint (customer profile,
    orders, event stream).

    100 TB shape: the request list is a broadcast semi-join probe on
    each table (dimension-sized — deletion requests are thousands, not
    billions); each table contributes one partial+final agg row."""
    cust = table(spark, sf, "customer")
    req = cust.select(F.col("c_custkey").alias("subject")).filter(
        F.pmod(_h64_spark(F.col("c_custkey").cast("string")), F.lit(ERASURE_MOD))
        == 0
    ).distinct()
    touchpoints = [
        ("customer", table(spark, sf, "customer").select(
            F.col("c_custkey").alias("k"))),
        ("orders", table(spark, sf, "orders").select(
            F.col("o_custkey").alias("k"))),
        ("events", table(spark, sf, "events").select(
            F.col("user_id").alias("k"))),
    ]
    rows = []
    for name, t in touchpoints:
        held = t.join(
            F.broadcast(req), t.k == req.subject, "left_semi"
        )
        rows.append(
            held.agg(
                F.count(F.lit(1)).alias("n_rows_held"),
                F.count_distinct("k").alias("n_subjects_held"),
            ).select(F.lit(name).alias("table_name"), "*")
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("table_name")


def _erasure_sql() -> str:
    h = H64_SQL.format(expr="CAST(c_custkey AS VARCHAR)")
    req = f"SELECT DISTINCT c_custkey AS subject FROM customer WHERE {h} % {ERASURE_MOD} = 0"
    parts = []
    for name, tbl, key in (
        ("customer", "customer", "c_custkey"),
        ("orders", "orders", "o_custkey"),
        ("events", "events", "user_id"),
    ):
        parts.append(
            f"""
    SELECT '{name}' AS table_name, COUNT(*) AS n_rows_held,
           CAST(COUNT(DISTINCT {key}) AS BIGINT) AS n_subjects_held
    FROM {tbl} WHERE {key} IN ({req})
    """
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY table_name"


ORACLE["right_to_erasure_audit"] = _erasure_sql()
QUERIES["right_to_erasure_audit"] = right_to_erasure_audit


def reid_risk_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Re-identification risk profile of a quasi-identifier (QI)
    combination — the disclosure-risk measurement that COMPLEMENTS the
    k-anonymity gate: instead of a pass/fail on min class size it
    reports the full risk surface of QI = (event_type, weekday,
    6-hour band) over the events stream, per event_type: equivalence-
    class count, singleton classes (k=1 — individuals unique on the
    QI alone), the uniqueness rate, min/avg class size, and the QI
    entropy in bits (higher entropy = the QI partitions the population
    more finely = more re-identification power; Shannon's measure is
    the standard scalar for comparing QI choices before release).

    Determinism contract: weekday/band derive from integer epoch-day /
    hour arithmetic (no locale); each entropy term -(k/N)*log2(k/N)
    rounds to 9 decimals and accumulates in DECIMAL(20,9), so
    per-class aggregation order cannot perturb the sum; divisions of
    exact integer counts happen once, in double. The term rounds to 9
    (not 12) decimals because p is data-dependent, so log2 cannot be a
    driver-side literal: a 1-ulp JVM-vs-DuckDB libm divergence sits at
    ~1e-16 relative, and the 3-decimal margin between the 9-decimal
    term rounding and the 6-decimal output rounding absorbs it.

    100 TB shape: one hash agg on the QI key (bounded: #types x 7 x
    4 classes), then a per-type rollup of that bounded aggregate —
    raw events are touched exactly once, map-side combined."""
    ev = table(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    # weekday = epoch-day mod 7 (0 = Thursday): pure integer arithmetic,
    # identical in both engines; band = hour div 6.
    qi = ev.select(
        "event_type",
        F.pmod(F.unix_date(F.to_date("ts")), F.lit(7)).alias("weekday"),
        (F.hour("ts") / 6).cast("int").alias("band"),
    )
    classes = qi.groupBy("event_type", "weekday", "band").agg(
        F.count(F.lit(1)).alias("k")
    )
    totals = classes.groupBy("event_type").agg(
        F.sum("k").alias("n_events_raw")
    )
    j = classes.join(F.broadcast(totals), "event_type")
    p = F.col("k").cast("double") / F.col("n_events_raw").cast("double")
    term = F.round(-(p * F.log2(p)), 9).cast("decimal(20,9)")
    return (
        j.groupBy("event_type")
        .agg(
            F.max("n_events_raw").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).alias(
                "n_singletons"
            ),
            F.round(
                F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).cast("double")
                / F.max("n_events_raw").cast("double"),
                6,
            ).alias("uniqueness_rate"),
            F.min("k").alias("min_k"),
            F.round(
                F.max("n_events_raw").cast("double")
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("avg_k"),
            F.round(F.sum(term).cast("double"), 6).alias("qi_entropy_bits"),
        )
        .orderBy("event_type")
    )


ORACLE["reid_risk_entropy"] = """
    WITH qi AS (
        SELECT event_type,
               ((DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7)
                + 7) % 7 AS weekday,
               CAST(EXTRACT(hour FROM ts) // 6 AS INT) AS band
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    classes AS (
        SELECT event_type, weekday, band, COUNT(*) AS k
        FROM qi GROUP BY event_type, weekday, band
    ),
    totals AS (
        SELECT event_type, CAST(SUM(k) AS BIGINT) AS n_events_raw
        FROM classes GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(MAX(t.n_events_raw) AS BIGINT) AS n_events,
           COUNT(*) AS n_classes,
           CAST(SUM(CASE WHEN c.k = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singletons,
           ROUND(CAST(SUM(CASE WHEN c.k = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(MAX(t.n_events_raw) AS DOUBLE), 6)
               AS uniqueness_rate,
           MIN(c.k) AS min_k,
           ROUND(CAST(MAX(t.n_events_raw) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS avg_k,
           ROUND(CAST(SUM(CAST(ROUND(
                    -(CAST(c.k AS DOUBLE) / CAST(t.n_events_raw AS DOUBLE))
                    * LOG2(CAST(c.k AS DOUBLE)
                           / CAST(t.n_events_raw AS DOUBLE)), 9)
                 AS DECIMAL(20,9))) AS DOUBLE), 6) AS qi_entropy_bits
    FROM classes c JOIN totals t USING (event_type)
    GROUP BY c.event_type ORDER BY c.event_type
"""

QUERIES["reid_risk_entropy"] = reid_risk_entropy
