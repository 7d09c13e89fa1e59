"""Text-analysis operators over the ``documents`` table: token counting,
heuristic language-ID, quality scoring, document fingerprinting.

These extend the reference's capability surface (SURVEY.md §2.8 scalar
functions) with the text operators a large-scale training-data pipeline
needs. Everything is Catalyst-native (split / filter / transform /
aggregate higher-order functions) — no Python UDFs — so the plans stay
inside whole-stage codegen and scale linearly with a parquet scan: no
shuffle at all for the per-document operators, one partial+final hash
aggregate for the rollups.

Cross-engine determinism: the only hash used is the portable
``md5-hex → bigint`` primitive (first 15 hex chars = 60 bits, always
positive, exactly representable both engines — see ``_h64_spark`` /
``H64_SQL``); ratios are rounded to 4 decimals before comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline6_spark.sources.readers import table, widen_small_scan

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic toy lists — the operator contract (tokenize →
# per-language evidence ratio → argmax with a stable tiebreak) is what
# matters, not lexicon quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "fast", "slow"),
    "es": ("el", "la", "de", "y", "valor", "tabla"),
    "fr": ("le", "la", "de", "et", "valeur", "table"),
    "de": ("der", "die", "das", "und", "wert", "tabelle"),
    "zh": ("de", "he", "biao", "zhi", "hang", "lie"),
}


def _h64_spark(c: Column) -> Column:
    """Portable 60-bit hash: bigint of the first 15 hex chars of md5.
    Identical to ``H64_SQL`` in DuckDB (verified bit-for-bit)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


H64_SQL = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _tokens(col: str = "text") -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    return F.split(F.col(col), " ")


def token_count_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language token statistics: docs, total/avg tokens, distinct
    token ratio. One narrow scan + one hash aggregate."""
    docs = table(spark, sf, "documents")
    toks = _tokens()
    return (
        docs.select(
            "lang",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(F.avg(F.col("n_distinct") / F.col("n_tokens")), 4).alias("avg_distinct_ratio"),
        )
        .orderBy("lang")
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space
# symbols — the regex family subword tokenizers apply before merges
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Token accounting under a BPE-style pre-tokenization regex vs
    plain whitespace — the budget numbers an LLM-data pipeline tracks.
    regexp_count is row-local; one aggregate."""
    docs = table(spark, sf, "documents")
    return (
        docs.select(
            "lang",
            F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
            F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).alias("bpe_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            F.round(F.avg("bpe_tokens"), 4).alias("avg_bpe_tokens"),
        )
        .orderBy("lang")
    )


def token_gini_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-balance audit: the Gini coefficient of token mass across
    documents, per language — 0 means every doc contributes equally,
    1 means a few giants carry the corpus (the imbalance that makes
    per-doc sampling weights and length-stratified batching matter).

    G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over token counts sorted
    ascending — every term an exact integer, so the single double
    division is bit-identical cross-engine. The exact per-language rank
    rides ``_distributed_rank`` (the grouped range-partition +
    prefix-sum core under ``_distributed_ntile``): the sort parallelism
    is the range-partition count, never one task per language, so one
    giant language (English is half of any web corpus) costs the same
    as ten small ones."""
    docs = table(spark, sf, "documents")
    tl = docs.select(
        "lang", "doc_id", F.size(F.split(F.col("text"), " ")).alias("score")
    )
    ranked = _distributed_rank(tl, group_cols=["lang"]).select(
        "lang", F.col("score").alias("t"), F.col("_grank").alias("i")
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("t").alias("total_tokens"),
            F.sum(F.col("i").cast("bigint") * F.col("t")).alias("s_ix"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            F.round(
                (2 * F.col("s_ix") - (F.col("n_docs") + 1) * F.col("total_tokens"))
                / (F.col("n_docs") * F.col("total_tokens")),
                6,
            ).alias("gini"),
        )
        .orderBy("lang")
    )


BPE_TOP_MERGES = 20  # merge candidates reported per training round


def bpe_merge_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """One round of BPE tokenizer TRAINING at corpus scale: the top-20
    adjacent-symbol pairs by frequency — exactly the statistic each BPE
    merge step greedily picks. Symbols here are characters (round 1 of
    training; later rounds would re-run over merged symbols).

    Scale shape — the classic BPE-training trick: aggregate the corpus
    to its WORD-FREQUENCY table first (vocabulary ≪ corpus, one
    shuffle that shrinks 100 TB of text to a few GB of distinct
    words), then explode character pairs over the vocabulary only,
    weighting by word frequency. The final top-20 is a
    TakeOrderedAndProject, never a global sort."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    words = (
        docs.select(F.explode(_tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    pairs = words.filter(F.length("w") >= 2).select(
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        "w",
    ).select(
        F.col("w").substr(F.col("i"), F.lit(1)).alias("left_sym"),
        F.col("w").substr(F.col("i") + 1, F.lit(1)).alias("right_sym"),
        "freq",
    )
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(BPE_TOP_MERGES)
    )


def lang_id_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language-ID (marker-token ratio, argmax with stable
    alphabetical tiebreak) vs the labeled ``lang`` — emitted as a
    confusion-matrix rollup. Per-document scoring is shuffle-free."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = _tokens()
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = docs.select("lang", *scores)
    langs = sorted(LANG_MARKERS)  # alphabetical = stable tiebreak order
    best = F.col(f"s_{langs[0]}")
    pred = F.lit(langs[0])
    for lg in langs[1:]:
        cond = F.col(f"s_{lg}") > best
        pred = F.when(cond, lg).otherwise(pred)
        best = F.when(cond, F.col(f"s_{lg}")).otherwise(best)
    return (
        scored.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def quality_score_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality score per doc (length score, mean word length,
    distinct-token ratio), bucketed to a 0-9 decile-ish histogram.
    Mirrors the length/stopword-ratio heuristics of web-scale corpus
    filters; all row-local, then one aggregate."""
    docs = table(spark, sf, "documents")
    toks = _tokens()
    n_tok = F.size(toks)
    len_score = F.least(F.col("n_chars") / F.lit(400.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)) / n_tok
    mean_wlen = (F.col("n_chars") - (n_tok - 1)) / n_tok  # chars minus spaces
    wlen_score = F.least(mean_wlen / F.lit(6.0), F.lit(1.0))
    score = F.round(
        0.4 * len_score + 0.4 * diversity + 0.2 * wlen_score, 6
    )
    bucket = F.least(F.floor(score * 10), F.lit(9)).cast("int")
    return (
        docs.select(bucket.alias("q_bucket"))
        .groupBy("q_bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("q_bucket")
    )


def curriculum_deciles(
    spark: SparkSession, sf: str, exact_plan: bool = False
) -> DataFrame:
    """Curriculum binning: EQUI-HEIGHT difficulty deciles via ntile(10)
    over the composite quality score (the ordered-training counterpart
    of quality_score_buckets' equi-width histogram). Per decile: doc
    count and the score range it spans — the bin boundaries a curriculum
    sampler would draw from. ntile's global order carries doc_id as the
    unique tie-break so both engines assign identical bins.

    Scale path (default): EXACT ntile semantics without the global
    single-partition sort. The (score, doc_id) projection is
    range-partitioned, each partition computes local row_numbers in
    parallel, and the per-partition row counts (a prefix-sum over
    #partitions scalar rows inside the SAME lazy plan — never data)
    convert local ranks to
    global ranks; ntile's bucket-size arithmetic (first N%10 buckets get
    one extra row) is then applied row-locally. Every stage is a
    distributed shuffle of 24-byte pairs — nothing ever funnels through
    one task, so the plan survives 100 TB where ``ntile(10) OVER
    (ORDER BY ...)`` dies. ``exact_plan=True`` keeps the textbook global
    ntile for plan-comparison tests; both paths are bit-identical to the
    DuckDB oracle because the distributed form reproduces ntile's exact
    assignment (unique (score, doc_id) order ⇒ deterministic ranks)."""
    docs = table(spark, sf, "documents")
    toks = _tokens()
    n_tok = F.size(toks)
    len_score = F.least(F.col("n_chars") / F.lit(400.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)) / n_tok
    mean_wlen = (F.col("n_chars") - (n_tok - 1)) / n_tok
    wlen_score = F.least(mean_wlen / F.lit(6.0), F.lit(1.0))
    score = F.round(0.4 * len_score + 0.4 * diversity + 0.2 * wlen_score, 6)
    from pyspark.sql.window import Window

    scored = docs.select("doc_id", score.alias("score"))
    if exact_plan:
        w = Window.orderBy("score", "doc_id")
        binned = scored.withColumn("decile", F.ntile(10).over(w))
    else:
        binned = _distributed_ntile(scored, n_buckets=10)
    return (
        binned.groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
        .orderBy("decile")
    )


def _distributed_ntile(
    scored: DataFrame, n_buckets: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Exact ntile(n) over (score, doc_id) with no single-partition sort
    of the DATA, expressed as ONE fully-lazy plan (no driver collect, no
    persist). With ``group_cols``, computes an INDEPENDENT ntile inside
    every group in the same single pass — one range shuffle covers all
    groups (range keys lead with the group columns so each group's rows
    stay globally ordered), the prefix-sum windows partition by group
    (so no SinglePartition exchange exists at all in grouped mode), and
    the bucket arithmetic uses each group's own total. Callers that need
    several ntile passes over the same rows (rfm_segments quartiles
    three metrics) stack the metrics into long format and pay ONE
    pipeline instead of three.

    1. ``repartitionByRange(score, doc_id)`` — the only data shuffle.
       The explicit partition count marks the exchange
       REPARTITION_BY_NUM, so AQE never re-coalesces it and every
       consumer below observes the same pid ↦ rows mapping (the range
       sampler's seed is per-input-partition-deterministic, and the
       repeated subtree deduplicates via ReusedExchange anyway).
    2. per-partition ``row_number`` (window keyed on the partition id,
       so every partition sorts independently);
    3. per-partition counts → prefix-sum offsets + grand total via a
       window over the #partitions-row count table — scalar rows only,
       never data, the same O(#partitions) driver-equivalent the old
       collect-based shape moved to the driver — broadcast-joined back;
    4. ntile's bucket arithmetic on the global rank, in exact integer
       form: every division's numerator is (a - a mod b), a multiple of
       b below 2^53, so the double division is exact.

    The previous shape persisted the ranged data and collected counts to
    the driver — correct, but one eager materialization + driver
    sync-point PER CALL (rfm_segments makes three, serially, while
    building its plan) and pinned storage left behind after the query
    returned. Lazy composition lets callers stack ntile passes with zero
    construction-time jobs.
    """
    ranked = _distributed_rank(scored, group_cols)

    def idiv(a: Column, b: Column) -> Column:
        # exact floor-division for nonnegative bigints: (a - a mod b) is
        # a multiple of b and stays below 2^53, so the double division
        # below is exact
        return ((a - F.pmod(a, b)) / b).cast("long")

    g = F.col("_grank")
    total = F.col("total")
    q = idiv(total, F.lit(n_buckets))
    r = F.pmod(total, F.lit(n_buckets))
    boundary = r * (q + F.lit(1))
    # CaseWhen evaluates branches sequentially at runtime, so the q=0
    # guard keeps the later divisions away from zero divisors
    decile = (
        F.when(q == F.lit(0), g)  # fewer rows than buckets: rank = bucket
        .when(g <= boundary, idiv(g + q, q + F.lit(1)))
        .otherwise(r + idiv(g - boundary + q - F.lit(1), q))
    )
    return ranked.withColumn("decile", decile.cast("int")).drop("total", "_grank")


def _distributed_rank(
    scored: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """The rank core of ``_distributed_ntile``, reusable on its own:
    exact global ``row_number() OVER ([PARTITION BY group] ORDER BY
    score, doc_id)`` as ``_grank`` (plus the [group] row count as
    ``total``), with no single-task sort anywhere — one range shuffle
    of the data, per-partition local row_numbers, and a prefix-sum over
    the #partitions-row count table broadcast back (see the ntile
    docstring for why the repeated range subtree is safe: explicit
    partition count → REPARTITION_BY_NUM → AQE never re-coalesces, and
    the duplicate subtree deduplicates via ReusedExchange —
    plan-asserted in tests/test_plans.py). Callers that need exact
    per-group ranks over unbounded groups (``token_gini_per_lang``'s
    Gini rank) use this instead of a raw ``row_number`` window, whose
    one-task-per-group sort dies when a single group outgrows an
    executor."""
    from pyspark.sql.window import Window

    spark = scored.sparkSession
    grp = list(group_cols or [])
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = scored.repartitionByRange(nparts, *grp, "score", "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("pid", *grp).agg(F.count("*").alias("cnt"))
    w_prev = (
        Window.partitionBy(*grp)
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy(*grp)
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    off_df = counts.select(
        "pid",
        *grp,
        F.coalesce(F.sum("cnt").over(w_prev), F.lit(0)).alias("rank_offset"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    w = Window.partitionBy("pid", *grp).orderBy("score", "doc_id")
    return (
        ranged.join(F.broadcast(off_df), ["pid", *grp])
        # materialize the global rank as a column so downstream
        # consumers share ONE window expression (inlining it into each
        # CaseWhen branch made the physical Window compute row_number 6x)
        .withColumn("_grank", F.col("rank_offset") + F.row_number().over(w))
        .drop("pid", "rank_offset")
    )


PACK_BUDGET = 512  # tokens per packed training sequence
PACK_SHARDS = 16  # packing parallelism unit (lang x shard). Sized for the
# test corpus; at 100 TB this is O(cluster cores) — thousands — since each
# (lang, shard) window is one task's sort. The constant is the ONLY thing
# that changes: assignment stays h64(doc_id) % PACK_SHARDS.


def sequence_packing_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence-packing accounting under the concat-and-chunk scheme
    (the packing every large pretraining pipeline uses: concatenate
    documents in a deterministic order, slice at a fixed token budget,
    let documents straddle slice boundaries): per language — packed
    bins, total tokens, boundary-straddling docs and their fraction,
    and the fill ratio of the final partial bin.

    Packing order is (shard, doc_id) where shard is a portable hash of
    doc_id: the cumulative-sum window runs per (lang, shard), so the
    sort parallelism is langs x PACK_SHARDS regardless of corpus size —
    never a global single-partition window (same design as
    _distributed_ntile). A doc straddles a boundary iff its [start,
    end) token interval crosses a multiple of PACK_BUDGET."""
    from pyspark.sql.window import Window

    docs = table(spark, sf, "documents")
    shard = F.pmod(_h64_spark(F.col("doc_id").cast("string")), F.lit(PACK_SHARDS))
    n_tok = F.size(_tokens())
    w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    toks = docs.select(
        "lang", "doc_id", shard.alias("shard"), n_tok.alias("n_tok")
    ).withColumn("cum_end", F.sum("n_tok").over(w))
    start = F.col("cum_end") - F.col("n_tok")
    straddles = (
        F.floor(start / PACK_BUDGET) != F.floor((F.col("cum_end") - 1) / PACK_BUDGET)
    ).cast("int")
    per_shard = toks.select(
        "lang",
        "shard",
        "n_tok",
        straddles.alias("straddle"),
        F.col("cum_end").alias("cum_end"),
    ).groupBy("lang", "shard").agg(
        F.sum("n_tok").alias("shard_tokens"),
        F.sum("straddle").alias("n_straddle"),
        F.count("*").alias("n_docs"),
    )
    bins = F.ceil(F.col("shard_tokens") / PACK_BUDGET)
    return (
        per_shard.groupBy("lang")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("shard_tokens").alias("total_tokens"),
            F.sum(bins).alias("n_bins"),
            F.sum("n_straddle").alias("n_straddle"),
            F.round(F.sum("n_straddle") / F.sum("n_docs"), 4).alias("straddle_frac"),
            F.round(
                F.sum("shard_tokens") / (F.sum(bins) * PACK_BUDGET), 4
            ).alias("fill_ratio"),
        )
        .orderBy("lang")
    )


VOCAB_K = 20  # terms kept per language vocabulary (sized so the synthetic
# corpus, ~31 distinct terms/lang, actually produces OOV mass; production
# values are 10^4-10^5 — the plan shape is identical)


def tokenizer_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary coverage / OOV accounting: build a frequency-top-K
    vocabulary per language, then report what fraction of token
    OCCURRENCES falls outside it — the metric that decides a
    tokenizer's vocab size before anyone trains it.

    One explode → one (lang, term) count aggregate, then everything
    else happens on the COUNTS table (rows = distinct terms, orders of
    magnitude smaller than the corpus): a per-lang rank window picks the
    vocab and a final per-lang aggregate folds total vs in-vocab
    occurrences. The corpus-sized data crosses exactly one shuffle; the
    rank window's per-lang partition holds term-count rows, not tokens."""
    from pyspark.sql.window import Window

    docs = table(spark, sf, "documents")
    counts = (
        docs.select("lang", F.explode(_tokens()).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("term"))
    ranked = counts.withColumn("rank", F.row_number().over(w))
    in_vocab = F.col("rank") <= VOCAB_K
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").alias("n_distinct_terms"),
            F.sum(F.when(in_vocab, 1).otherwise(0)).alias("vocab_size"),
            F.sum("n").alias("total_tokens"),
            F.sum(F.when(~in_vocab, F.col("n")).otherwise(0)).alias("oov_tokens"),
            F.round(
                F.sum(F.when(~in_vocab, F.col("n")).otherwise(0)) / F.sum("n"), 4
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )


def bigram_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """LM-perplexity quality filter: score every document by the mean
    negative log conditional probability of its bigrams under the
    corpus's own bigram LM (the bigram_lm_counts model WITHOUT the
    top-k cut), then histogram docs into integer NLL buckets per
    language — the classic 'drop high-perplexity docs' gate of web-scale
    curation, expressed engine-side.

    The exploded instance stream is aggregated ONCE into per-doc
    bigram counts before anything else — the LM totals derive from that
    (already reduced) relation, and the scoring join runs
    (doc, bigram, cnt) x LM instead of instance x LM, so repeated
    bigrams inside a document never cross a join or a second shuffle.
    The per-doc mean is the cnt-weighted average. Buckets are
    floor(mean NLL): integer boundaries make the cross-engine compare
    immune to last-ulp libm differences in ln()."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    bg = (
        docs.select("doc_id", "lang", _tokens().alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            "lang",
            F.concat_ws(" ", F.slice("toks", F.col("i"), 2)).alias("bigram"),
        )
    )
    bg_doc = bg.groupBy("doc_id", "lang", "bigram").agg(
        F.count("*").alias("cnt")
    )
    counts = bg_doc.groupBy("lang", "bigram").agg(F.sum("cnt").alias("n"))
    prefix = (
        counts.select(
            "lang",
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
            "n",
        )
        .groupBy("lang", "w1")
        .agg(F.sum("n").alias("n_prefix"))
    )
    lm = counts.withColumn(
        "w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    ).join(prefix, ["lang", "w1"]).select(
        "lang", "bigram", (-F.log(F.col("n") / F.col("n_prefix"))).alias("nll")
    )
    per_doc = (
        bg_doc.join(lm, ["lang", "bigram"])
        .groupBy("doc_id", "lang")
        .agg(
            (F.sum(F.col("cnt") * F.col("nll")) / F.sum("cnt")).alias("mean_nll")
        )
    )
    return (
        per_doc.select("lang", F.floor("mean_nll").cast("int").alias("nll_bucket"))
        .groupBy("lang", "nll_bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "nll_bucket")
    )


def doc_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document fingerprint: min/max portable hash over distinct word
    3-gram shingles (the winnowing primitive used by near-dup pipelines).
    Shingling via transform over an index sequence — no explode, no
    shuffle; the document row count is preserved."""
    docs = table(spark, sf, "documents")
    # token array materialized as a column: the shingle lambda slices it
    # per element, and lambda bodies re-evaluate non-attribute
    # subexpressions once per ELEMENT — inlining split() would re-split
    # the text once per shingle (plans.nested_hof_filters class)
    tokd = docs.select("doc_id", _tokens().alias("toks"))
    toks = F.col("toks")
    # guard: Spark's sequence(0, n) DESCENDS when n < 0 (docs with < 3
    # tokens), unlike DuckDB's generate_series which returns empty
    shingles = F.array_distinct(
        F.when(
            F.size(toks) >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    # ... and the hash array too, so min/max/size read an attribute
    # instead of re-hashing the shingles three times per row
    hashed = tokd.select(
        "doc_id", F.transform(shingles, lambda s: _h64_spark(s)).alias("hs")
    )
    return hashed.select(
        "doc_id",
        F.array_min(F.col("hs")).alias("fp_min"),
        F.array_max(F.col("hs")).alias("fp_max"),
        F.size(F.col("hs")).alias("n_shingles"),
    )


def repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition-based quality signals (the duplicate-text family of
    web-corpus filters): per document the most-frequent-token fraction
    and most-frequent-bigram fraction, rolled up by repetition bucket
    (rounded duplicate-token fraction).

    All signals are row-local higher-order-function expressions — the
    max-frequency count runs over each doc's own token list, so the only
    shuffle in the whole plan is the final small hash aggregate. At
    100 TB this is scan-bound, embarrassingly parallel, and prunes to
    the single ``text`` column."""
    docs = widen_small_scan(table(spark, sf, "documents"))

    def max_freq_frac(arr: Column) -> Column:
        top = F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda t: F.size(F.filter(arr, lambda x: x == t)),
            )
        )
        return top / F.size(arr)

    # token and bigram arrays materialized as columns before the
    # frequency lambdas: max_freq_frac filters the array once per
    # DISTINCT element, and a lambda body re-evaluates non-attribute
    # subexpressions per element — inlining split() would re-split the
    # text once per distinct token (plans.nested_hof_filters class)
    tokd = docs.select(_tokens().alias("toks"))
    toks = F.col("toks")
    n_tok = F.size(toks)
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(0), n_tok - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    arrd = tokd.select("toks", bigrams.alias("bigrams"))
    # integer decile: floor(((n - distinct) * 10) / n). Exact in both
    # engines — operands are small exact integers, so the FP quotient
    # can't straddle an integer — unlike round(double, 1), whose halfway
    # behavior diverges cross-engine.
    dup_decile = F.floor(((n_tok - F.size(F.array_distinct(toks))) * 10) / n_tok)
    per_doc = arrd.select(
        dup_decile.cast("int").alias("rep_bucket"),
        max_freq_frac(toks).alias("top_tok_frac"),
        max_freq_frac(F.col("bigrams")).alias("top_bigram_frac"),
    )
    return (
        per_doc.groupBy("rep_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("top_tok_frac"), 4).alias("avg_top_tok_frac"),
            F.round(F.avg("top_bigram_frac"), 4).alias("avg_top_bigram_frac"),
        )
        .orderBy("rep_bucket")
    )


# Per-language keep-thresholds on the first md5 hex byte: 0x80/0x100 = 50%
# for the over-represented language, 0xcc/0x100 ~ 80% for the rest.
SAMPLE_THRESHOLDS: dict[str, str] = {"en": "80"}
SAMPLE_DEFAULT_THRESHOLD = "cc"


def stratified_sample_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling for corpus rebalancing: keep a
    per-language fraction decided by a content-stable hash (first md5
    byte of doc_id vs a per-stratum threshold), then account per stratum.

    Hash-gated Bernoulli sampling is the scale idiom: map-only, no
    shuffle, reproducible across runs/engines (unlike ``df.sample``,
    whose RNG is partition-layout-dependent), and the same row set is
    kept on re-execution — what a curation pipeline needs for auditable
    dataset cards."""
    docs = table(spark, sf, "documents")
    hex2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thr = F.lit(SAMPLE_DEFAULT_THRESHOLD)
    for lang, t in SAMPLE_THRESHOLDS.items():
        thr = F.when(F.col("lang") == lang, t).otherwise(thr)
    kept = (hex2 < thr).cast("int")
    return (
        docs.select("lang", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("kept").alias("n_sampled"),
            F.round(F.sum("kept") / F.count("*"), 4).alias("sample_frac"),
        )
        .orderBy("lang")
    )


TOP_TERMS_K = 5


def top_terms_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary top-k: the five most frequent terms per
    language with occurrence and document-frequency counts — the
    term-statistics pass of a TF-IDF / vocabulary-build stage.

    One explode + ONE partial+final hash aggregate on (lang, term)
    (map-side combine collapses each partition's term counts before the
    shuffle — the shuffle carries the vocabulary, not the corpus), then
    a per-lang top-k window over the tiny aggregated relation. Ranking
    uses only exact integers with a term tiebreak, so the result is
    deterministic cross-engine."""
    from pyspark.sql.window import Window

    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = docs.select("lang", "doc_id", F.explode(_tokens()).alias("term"))
    counts = toks.groupBy("lang", "term").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_occurrences"), F.asc("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_TERMS_K)
        .select("lang", "rank", "term", "n_occurrences", "n_docs")
        .orderBy("lang", "rank")
    )


CHUNK_TOKENS = 10


def udtf_chunk_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF (table function — one input row yields N output
    rows): split each document into fixed-size token chunks, the unit a
    context-window-bounded training pipeline feeds downstream. The UDTF
    runs per-row in Python (lateral join); the aggregate after it is
    Catalyst-native. For hot paths the same fan-out is expressible with
    explode+sequence (see sliding_window_agg) — the UDTF form is the
    escape hatch for chunkers with real tokenizer state that SQL can't
    express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int")
    class ChunkSplit:
        def eval(self, text: str):
            if text is None:  # null document: zero chunks, like LATERAL over empty
                return
            n = len(text.split(" "))
            for i in range(0, n, CHUNK_TOKENS):
                yield i // CHUNK_TOKENS, min(CHUNK_TOKENS, n - i)

    # register once per session: re-registration is harmless but logs a
    # replaced-function WARN per call, and bench sweeps call this 200+
    # times — the flag rides the session object so a fresh session
    # (tests, driver) still registers
    if not getattr(spark, "_pdp6_chunk_split_registered", False):
        spark.udtf.register("chunk_split", ChunkSplit)
        spark._pdp6_chunk_split_registered = True
    # sf-derived view name: interleaved calls against different sf dirs
    # must not clobber each other's table (same rule as
    # sql_udf_pricing_bands)
    import hashlib

    view = f"udtf_docs_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    table(spark, sf, "documents").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT chunk_idx, COUNT(*) AS n_chunks, SUM(n_tokens) AS sum_tokens
        FROM {view}, LATERAL chunk_split(text)
        GROUP BY chunk_idx ORDER BY chunk_idx
        """
    )


TFIDF_K = 3


def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Full TF-IDF: per document, the top-3 terms by tf·idf with
    smoothed idf = ln((N+1)/(df+1)). Completes the vocabulary pass of
    ``top_terms_per_lang`` into per-document term weighting.

    Plan: one explode → (doc, term) tf hash agg → term-level df agg
    (both with map-side combine; the shuffles carry the vocabulary, not
    the corpus) → broadcast the corpus size scalar → per-doc top-k
    window over the scored (doc, term) relation. Ranking keys are
    (round(score,6) DESC, term ASC): rounding pins the float compare
    cross-engine, the term tiebreak makes equal-score ranks stable."""
    from pyspark.sql.window import Window

    docs = widen_small_scan(table(spark, sf, "documents"))
    n_docs = docs.count()  # corpus-size scalar, one tiny job
    toks = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TFIDF_K)
        .select("doc_id", "rank", "term", "score")
        .orderBy("doc_id", "rank")
    )


BIGRAM_K = 3


def bigram_lm_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram language-model counts: per language, the top-3 bigrams
    with their conditional probability p(w2|w1) = n(w1 w2)/n(w1·) —
    the count pass of n-gram LM training / contamination fingerprints.

    The prefix denominator n(w1·) is derived FROM the bigram relation
    (sum of bigram counts grouped by first token), so numerator and
    denominator come out of one explode + one hash agg; ranking uses
    exact integers with a bigram tiebreak."""
    from pyspark.sql.window import Window

    docs = widen_small_scan(table(spark, sf, "documents"))
    # codegen bigram construction: explode the start index, slice in a
    # plain projection (a transform() lambda would evaluate interpreted
    # per element — see dedup._exploded_shingles for the rationale)
    bg = (
        docs.select("lang", _tokens().alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "lang", "toks", F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i")
        )
        .select("lang", F.concat_ws(" ", F.slice("toks", F.col("i"), 2)).alias("bigram"))
    )
    counts = bg.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    prefix = (
        counts.select(
            "lang", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"), "n"
        )
        .groupBy("lang", "w1")
        .agg(F.sum("n").alias("n_prefix"))
    )
    scored = counts.withColumn(
        "w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    ).join(prefix, ["lang", "w1"])
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= BIGRAM_K)
        .select(
            "lang",
            "rank",
            "bigram",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_prefix"), 6).alias("p_cond"),
        )
        .orderBy("lang", "rank")
    )


def _markers_sql(markers: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{m}'" for m in markers) + "]"


_LANGS_SORTED = sorted(LANG_MARKERS)


def _lang_pred_sql() -> str:
    """DuckDB expression chain replicating the Spark argmax fold."""
    score_defs = ",\n               ".join(
        f"len(list_filter(toks, t -> list_contains({_markers_sql(LANG_MARKERS[lg])}, t))) AS s_{lg}"
        for lg in _LANGS_SORTED
    )
    pred = f"'{_LANGS_SORTED[0]}'"
    best = f"s_{_LANGS_SORTED[0]}"
    for lg in _LANGS_SORTED[1:]:
        pred = f"CASE WHEN s_{lg} > {best} THEN '{lg}' ELSE {pred} END"
        best = f"CASE WHEN s_{lg} > {best} THEN s_{lg} ELSE {best} END"
    return f"""
        SELECT lang, {pred} AS pred_lang
        FROM (SELECT lang, {score_defs}
              FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents))
    """


def token_entropy_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document unigram Shannon entropy (the information-density
    quality signal: low entropy = repetitive/templated text), rolled up
    per language. Entirely row-local higher-order functions — the only
    shuffle is the final per-language aggregate.

    Cross-engine determinism: the per-doc fold runs over the SORTED
    distinct token list (DuckDB's ``list_distinct`` does not preserve
    order, so an unsorted fold would sum in a different order), and the
    per-doc entropy is rounded to 6 decimals before min/max/avg. The
    ``+ 0.0`` normalizes IEEE ``-0.0`` (single-distinct-token docs) so
    both engines emit the same sign."""
    docs = table(spark, sf, "documents")
    # token array materialized as a column: the per-term fold filters it
    # once per DISTINCT term, and lambda bodies re-evaluate non-attribute
    # subexpressions per element — inlining split() would re-split the
    # text once per distinct term (plans.nested_hof_filters class)
    tokd = docs.select("lang", _tokens().alias("toks"))
    toks = F.col("toks")
    n = F.size(toks).cast("double")
    terms = F.array_sort(F.array_distinct(toks))

    def _term(t: Column) -> Column:
        p = F.size(F.filter(toks, lambda x: x == t)) / n
        return p * F.log2(p)

    ent = F.round(-F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + _term(t)), 6) + 0.0
    return (
        tokd.select("lang", ent.alias("ent"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ent"), 4).alias("avg_entropy"),
            F.min("ent").alias("min_entropy"),
            F.max("ent").alias("max_entropy"),
        )
        .orderBy("lang")
    )


ZIPF_TOP_TERMS = 100


def zipf_slope_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf rank-frequency fit per language: regress ln(frequency) on
    ln(rank) over the top-100 terms — natural text sits near slope -1,
    so a drifting slope is a cheap corpus-health monitor (templated or
    machine-generated text flattens it).

    Shape at scale: one explode + term-count hash agg (the classic
    wordcount), a per-language window for ranks (each language's term
    table shuffles once, top-100 filter immediately after), then the
    built-in ``regr_slope``/``regr_intercept``/``regr_r2`` aggregates —
    single-pass moment sketches that merge associatively, so the
    regression itself is one partial+final agg over 100 rows per
    language."""
    from pyspark.sql.window import Window

    docs = table(spark, sf, "documents")
    tf = (
        docs.select("lang", F.explode(_tokens()).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), "term")
    ranked = tf.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= ZIPF_TOP_TERMS
    )
    ln_c = F.log(F.col("c").cast("double"))
    ln_r = F.log(F.col("r").cast("double"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.regr_slope(ln_c, ln_r), 4).alias("zipf_slope"),
            F.round(F.regr_intercept(ln_c, ln_r), 4).alias("zipf_intercept"),
            F.round(F.regr_r2(ln_c, ln_r), 4).alias("fit_r2"),
        )
        .orderBy("lang")
    )


NUCLEUS_MASS = 0.9


def nucleus_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Nucleus (top-p) vocabulary coverage per language: how many
    distinct terms, ranked by frequency, cover 90% of all token
    occurrences — the head/tail split a tokenizer-vocabulary or
    sampling-truncation decision is based on.

    One explode + term-count agg, then a per-language running-total
    window (shuffles once per language partition, never globally); a
    term belongs to the nucleus while the mass BEFORE it is still under
    the threshold, so the boundary term is included exactly once on
    both engines."""
    from pyspark.sql.window import Window

    docs = table(spark, sf, "documents")
    tf = (
        docs.select("lang", F.explode(_tokens()).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("c"))
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.desc("c"), "term")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("lang")
    cum = F.sum("c").over(w_cum)
    tot = F.sum("c").over(w_tot)
    in_nucleus = ((cum - F.col("c")).cast("double") < NUCLEUS_MASS * tot).cast("bigint")
    return (
        tf.select("lang", "c", cum.alias("cum"), tot.alias("tot"), in_nucleus.alias("nuc"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("vocab_size"),
            F.max("tot").alias("total_tokens"),
            F.sum("nuc").alias("nucleus_terms"),
            F.round(F.sum("nuc") / F.count("*"), 4).alias("nucleus_frac"),
        )
        .orderBy("lang")
    )


RAG_CHUNK_TOKENS = 64
RAG_CHUNK_STRIDE = 48


def chunk_overlap_stats(spark: SparkSession, sf: str) -> DataFrame:
    """RAG-style sliding-window chunking accounting (64-token chunks,
    stride 48 → 16-token overlap): chunks per doc, overlap volume, and
    the token-expansion factor re-emitting overlapped chunks costs.

    The chunk count and emitted-token total have closed integer forms
    (every non-final chunk is full, the final chunk is the remainder;
    emitted = n + 16·(chunks−1)), so the whole operator is row-local
    64-bit arithmetic + one aggregate — zero shuffles before the rollup,
    and nothing about it changes at 100 TB."""
    docs = table(spark, sf, "documents")
    n = F.size(_tokens())
    extra = F.greatest(n - RAG_CHUNK_TOKENS, F.lit(0))
    n_chunks = (F.lit(1) + F.floor((extra + RAG_CHUNK_STRIDE - 1) / F.lit(RAG_CHUNK_STRIDE))).cast(
        "bigint"
    )
    emitted = n + (RAG_CHUNK_TOKENS - RAG_CHUNK_STRIDE) * (n_chunks - 1)
    return (
        docs.select(
            "source",
            n.alias("n_tokens"),
            n_chunks.alias("n_chunks"),
            emitted.alias("emitted"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chunks").alias("total_chunks"),
            F.sum(F.col("emitted") - F.col("n_tokens")).alias("overlap_tokens"),
            F.round(F.sum("emitted") / F.sum("n_tokens"), 4).alias("expansion"),
            F.round(
                F.avg(F.col("emitted") / (F.col("n_chunks") * F.lit(float(RAG_CHUNK_TOKENS)))),
                4,
            ).alias("avg_fill"),
        )
        .orderBy("source")
    )


# BM25 query-term set: two common terms plus one rare ('dup' appears in
# ~5% of docs) so the idf spread is visible in the score buckets.
BM25_TERMS = ("hash", "scan", "dup")


def bm25_doc_ranking(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 relevance scoring (Lucene idf variant, k1=1.2, b=0.75) of
    every document against a fixed query-term set, histogrammed per
    (terms-matched, integer score bucket).

    The textbook formula divides by ``avgdl`` — a double average that
    two engines would round differently. Here every rational piece is
    cross-multiplied into int64 form first:

      idf_t        = ln((2N+2) / (2·df_t+1))
      tf-part      = 22·tf·L / (10·tf·L + 3·L + 9·dl·N)   (k1=6/5, b=3/4)

    with N = doc count and L = total token count, so the only floating
    ops are one correctly-rounded division, one ln, one multiply, and a
    ≤|terms| sum per doc — and the output buckets on floor(10·score),
    making the compare immune to last-ulp libm drift (the
    bigram_perplexity_buckets trick). int64 headroom: 22·tf·L needs
    tf·L < 4e17 — safe past 100-TB corpora (L ~ 1e13, tf ≤ 1e3).

    Shuffle shape: one explode→filter (the IN-list prunes to query
    terms BEFORE the tf aggregate, so the shuffle carries only matched
    term rows), one 3-row df aggregate (broadcast back), one 1-row
    (N, L) aggregate (broadcast), one final histogram agg. The document
    text itself never crosses a shuffle.
    """
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = docs.select(
        "doc_id", F.explode(_tokens()).alias("t"), F.size(_tokens()).alias("dl")
    ).filter(F.col("t").isin(*BM25_TERMS))
    tf = toks.groupBy("doc_id", "t").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df = tf.groupBy("t").agg(F.count("*").alias("df"))
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens())).alias("total_len"),
    )
    term_score = (
        F.log(
            (2 * F.col("n_docs") + 2).cast("double") / (2 * F.col("df") + 1)
        )
        * (F.lit(22.0) * F.col("tf") * F.col("total_len"))
        / (
            F.lit(10.0) * F.col("tf") * F.col("total_len")
            + F.lit(3.0) * F.col("total_len")
            + F.lit(9.0) * F.col("dl") * F.col("n_docs")
        )
    )
    scored = (
        tf.join(F.broadcast(df), "t")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_query_terms"),
            F.sum(term_score).alias("score"),
        )
    )
    return (
        scored.groupBy(
            "n_query_terms",
            F.floor(F.col("score") * 10).cast("int").alias("score_bucket"),
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy("n_query_terms", "score_bucket")
    )


READ_SIMPLE_SPW = 140  # syllables-per-100-words band edges (corpus
READ_MODERATE_SPW = 150  # quartiles sit near 138/143/148)


def readability_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Readability banding: a Flesch-style complexity signal from the
    syllable rate (vowel-cluster heuristic — each ``[aeiouy]+`` run is
    one syllable, minimum one per word), banded on the INTEGER
    syllables-per-100-words rate so the cut is exact on both engines.
    Per (lang, band): docs and total words — the reading-level mixture
    report a curation pass uses to balance training difficulty.

    Row-local higher-order functions only (no UDF, no shuffle before
    the final rollup); the regexp runs inside whole-stage codegen, and
    the 100×syl // words floor-division keeps every banded quantity in
    exact integer arithmetic."""
    docs = table(spark, sf, "documents")
    syl = F.expr(
        "aggregate(transform(split(text, ' '), "
        "w -> greatest(1L, cast(size(regexp_extract_all(w, '[aeiouy]+', 0)) as long))), "
        "0L, (a, x) -> a + x)"
    )
    per_doc = docs.select(
        "lang",
        F.size(_tokens()).cast("bigint").alias("n_words"),
        syl.alias("syl"),
    ).select(
        "lang",
        "n_words",
        F.expr("100 * syl div n_words").alias("spw"),
    )
    band = (
        F.when(F.col("spw") < READ_SIMPLE_SPW, "simple")
        .when(F.col("spw") < READ_MODERATE_SPW, "moderate")
        .otherwise("complex")
    )
    return (
        per_doc.groupBy("lang", band.alias("band"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
        .orderBy("lang", "band")
    )


def hapax_legomena_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-richness accounting per language: corpus token mass,
    type count (distinct tokens), hapax legomena (types occurring
    exactly once), type/token ratio and hapax share — the
    vocabulary-growth diagnostic that sizes tokenizer vocabularies and
    flags synthetic/templated corpora (repetitive text shows an
    abnormally low hapax share).

    Explode is linear in token count; the (lang, token) frequency pass
    is ONE partial+final count agg whose shuffle carries (lang, token)
    pairs once each after map-side combine, and the per-lang rollup
    aggregates one row per type — strictly shrinking. Ratios divide
    exact integers, so both engines compute the identical IEEE double."""
    docs = table(spark, sf, "documents")
    freq = (
        docs.select("lang", F.explode(_tokens()).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count("*").alias("c"))
    )
    return (
        freq.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum((F.col("c") == 1).cast("bigint")).alias("n_hapax"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
            F.round(F.col("n_hapax") / F.col("n_types"), 6).alias("hapax_share"),
        )
        .orderBy("lang")
    )


ORACLE: dict[str, str] = {
    "bpe_token_counts": f"""
        SELECT lang,
               CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
               CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
               ROUND(AVG(bpe_tokens), 4) AS avg_bpe_tokens
        FROM (SELECT lang,
                     len(string_split(text, ' ')) AS ws_tokens,
                     len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe_tokens
              FROM documents)
        GROUP BY lang
    """,
    "token_count_stats": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(AVG(n_tokens), 4) AS avg_tokens,
               ROUND(AVG(CAST(n_distinct AS DOUBLE) / n_tokens), 4) AS avg_distinct_ratio
        FROM (SELECT lang,
                     len(string_split(text, ' ')) AS n_tokens,
                     len(list_distinct(string_split(text, ' '))) AS n_distinct
              FROM documents)
        GROUP BY lang
    """,
    "lang_id_confusion": f"""
        SELECT lang, pred_lang, COUNT(*) AS n_docs
        FROM ({_lang_pred_sql()})
        GROUP BY lang, pred_lang
    """,
    "quality_score_buckets": """
        SELECT CAST(LEAST(FLOOR(score * 10), 9) AS INT) AS q_bucket,
               COUNT(*) AS n_docs
        FROM (
            SELECT ROUND(
                0.4 * LEAST(n_chars / 400.0, 1.0)
              + 0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
              + 0.2 * LEAST(((n_chars - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE)) / 6.0, 1.0),
              6) AS score
            FROM (SELECT n_chars, string_split(text, ' ') AS toks FROM documents)
        )
        GROUP BY q_bucket
    """,
    "curriculum_deciles": """
        WITH scored AS (
            SELECT doc_id, ROUND(
                0.4 * LEAST(n_chars / 400.0, 1.0)
              + 0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
              + 0.2 * LEAST(((n_chars - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE)) / 6.0, 1.0),
              6) AS score
            FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents)
        )
        SELECT decile, COUNT(*) AS n_docs,
               MIN(score) AS min_score, MAX(score) AS max_score
        FROM (SELECT doc_id, score,
                     NTILE(10) OVER (ORDER BY score, doc_id) AS decile
              FROM scored)
        GROUP BY decile
    """,
    "doc_fingerprints": f"""
        SELECT doc_id,
               list_min(hashes) AS fp_min,
               list_max(hashes) AS fp_max,
               CAST(len(hashes) AS INT) AS n_shingles
        FROM (
            SELECT doc_id,
                   list_transform(
                       list_distinct(
                           list_transform(generate_series(1, len(toks) - 2),
                                          i -> array_to_string(toks[i:i+2], ' '))),
                       s -> {H64_SQL.format(expr="s")}) AS hashes
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        )
    """,
    "repetition_stats": """
        SELECT rep_bucket, COUNT(*) AS n_docs,
               ROUND(AVG(top_tok_frac), 4) AS avg_top_tok_frac,
               ROUND(AVG(top_bigram_frac), 4) AS avg_top_bigram_frac
        FROM (
            SELECT CAST(FLOOR(((len(toks) - len(list_distinct(toks))) * 10.0) / len(toks)) AS INT) AS rep_bucket,
                   CAST(list_max(list_transform(list_distinct(toks),
                        t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE)
                       / len(toks) AS top_tok_frac,
                   CAST(list_max(list_transform(list_distinct(bigrams),
                        t -> len(list_filter(bigrams, x -> x = t)))) AS DOUBLE)
                       / len(bigrams) AS top_bigram_frac
            FROM (
                SELECT toks,
                       list_transform(generate_series(1, len(toks) - 1),
                                      i -> array_to_string(toks[i:i+1], ' ')) AS bigrams
                FROM (SELECT string_split(text, ' ') AS toks FROM documents)
            )
        )
        GROUP BY rep_bucket
    """,
    "top_terms_per_lang": f"""
        SELECT lang, rank, term, n_occurrences, n_docs
        FROM (
            SELECT lang, term, n_occurrences, n_docs,
                   CAST(ROW_NUMBER() OVER (PARTITION BY lang
                        ORDER BY n_occurrences DESC, term ASC) AS INT) AS rank
            FROM (
                SELECT lang, term, COUNT(*) AS n_occurrences,
                       COUNT(DISTINCT doc_id) AS n_docs
                FROM (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term
                      FROM documents)
                GROUP BY lang, term
            )
        )
        WHERE rank <= {TOP_TERMS_K}
    """,
    "stratified_sample_counts": """
        SELECT lang, COUNT(*) AS n_total,
               CAST(SUM(kept) AS BIGINT) AS n_sampled,
               ROUND(CAST(SUM(kept) AS DOUBLE) / COUNT(*), 4) AS sample_frac
        FROM (
            SELECT lang,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                             < (CASE WHEN lang = 'en' THEN '80' ELSE 'cc' END)
                        THEN 1 ELSE 0 END AS kept
            FROM documents
        )
        GROUP BY lang
    """,
    "udtf_chunk_stats": """
        SELECT chunk_idx, COUNT(*) AS n_chunks,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
        FROM (
            SELECT CAST(k AS INT) AS chunk_idx,
                   LEAST(10, len(string_split(text, ' ')) - 10 * k) AS n_tok
            FROM documents,
                 UNNEST(generate_series(0,
                     CAST(CEIL(len(string_split(text, ' ')) / 10.0) AS INT) - 1)) AS t(k)
        )
        GROUP BY chunk_idx
    """,
    "tfidf_top_terms": f"""
        WITH tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
            GROUP BY doc_id, term
        ),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, term,
                   ROUND(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS score
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, rank, term, score
        FROM (
            SELECT doc_id, term, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, term ASC) AS INT) AS rank
            FROM scored
        )
        WHERE rank <= {TFIDF_K}
    """,
    "bigram_lm_counts": f"""
        WITH bg AS (
            SELECT lang, unnest(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')
                   )) AS bigram
            FROM documents
        ),
        counts AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram),
        prefix AS (
            SELECT lang, string_split(bigram, ' ')[1] AS w1, SUM(n) AS n_prefix
            FROM counts GROUP BY lang, w1
        )
        SELECT lang, rank, bigram, n, p_cond
        FROM (
            SELECT c.lang, c.bigram, c.n,
                   ROUND(CAST(c.n AS DOUBLE) / p.n_prefix, 6) AS p_cond,
                   CAST(ROW_NUMBER() OVER (PARTITION BY c.lang
                        ORDER BY c.n DESC, c.bigram ASC) AS INT) AS rank
            FROM counts c
            JOIN prefix p ON c.lang = p.lang
                         AND string_split(c.bigram, ' ')[1] = p.w1
        )
        WHERE rank <= {BIGRAM_K}
    """,
    "sequence_packing_bins": f"""
        WITH toks AS (
            SELECT lang,
                   doc_id,
                   {H64_SQL.format(expr="CAST(doc_id AS VARCHAR)")} % {PACK_SHARDS} AS shard,
                   len(string_split(text, ' ')) AS n_tok
            FROM documents
        ),
        cum AS (
            SELECT lang, shard, n_tok,
                   SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum_end
            FROM toks
        ),
        per_shard AS (
            SELECT lang, shard,
                   SUM(n_tok) AS shard_tokens,
                   SUM(CASE WHEN FLOOR((cum_end - n_tok) / {PACK_BUDGET})
                             <> FLOOR((cum_end - 1) / {PACK_BUDGET})
                        THEN 1 ELSE 0 END) AS n_straddle,
                   COUNT(*) AS n_docs
            FROM cum GROUP BY lang, shard
        )
        SELECT lang,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(shard_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CEIL(CAST(shard_tokens AS DOUBLE) / {PACK_BUDGET})) AS BIGINT)
                   AS n_bins,
               CAST(SUM(n_straddle) AS BIGINT) AS n_straddle,
               ROUND(CAST(SUM(n_straddle) AS DOUBLE) / SUM(n_docs), 4) AS straddle_frac,
               ROUND(CAST(SUM(shard_tokens) AS DOUBLE)
                     / (SUM(CEIL(CAST(shard_tokens AS DOUBLE) / {PACK_BUDGET})) * {PACK_BUDGET}),
                     4) AS fill_ratio
        FROM per_shard
        GROUP BY lang
        ORDER BY lang
    """,
    "bigram_perplexity_buckets": """
        WITH bg AS (
            SELECT doc_id, lang, unnest(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')
                   )) AS bigram
            FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        bg_doc AS (
            SELECT doc_id, lang, bigram, COUNT(*) AS cnt
            FROM bg GROUP BY doc_id, lang, bigram
        ),
        counts AS (
            SELECT lang, bigram, SUM(cnt) AS n FROM bg_doc GROUP BY lang, bigram
        ),
        prefix AS (
            SELECT lang, string_split(bigram, ' ')[1] AS w1, SUM(n) AS n_prefix
            FROM counts GROUP BY lang, w1
        ),
        lm AS (
            SELECT c.lang, c.bigram,
                   -ln(CAST(c.n AS DOUBLE) / p.n_prefix) AS nll
            FROM counts c
            JOIN prefix p ON c.lang = p.lang
                         AND string_split(c.bigram, ' ')[1] = p.w1
        ),
        per_doc AS (
            SELECT b.doc_id, b.lang,
                   SUM(b.cnt * lm.nll) / SUM(b.cnt) AS mean_nll
            FROM bg_doc b JOIN lm ON b.lang = lm.lang AND b.bigram = lm.bigram
            GROUP BY b.doc_id, b.lang
        )
        SELECT lang, CAST(FLOOR(mean_nll) AS INT) AS nll_bucket,
               COUNT(*) AS n_docs
        FROM per_doc
        GROUP BY lang, nll_bucket
        ORDER BY lang, nll_bucket
    """,
    "tokenizer_vocab_coverage": f"""
        WITH counts AS (
            SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        agg AS (
            SELECT lang, term, COUNT(*) AS n FROM counts GROUP BY lang, term
        ),
        ranked AS (
            SELECT lang, n,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY n DESC, term ASC) AS rank
            FROM agg
        )
        SELECT lang,
               COUNT(*) AS n_distinct_terms,
               CAST(SUM(CASE WHEN rank <= {VOCAB_K} THEN 1 ELSE 0 END) AS BIGINT)
                   AS vocab_size,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN rank > {VOCAB_K} THEN n ELSE 0 END) AS BIGINT)
                   AS oov_tokens,
               ROUND(CAST(SUM(CASE WHEN rank > {VOCAB_K} THEN n ELSE 0 END) AS DOUBLE)
                     / SUM(n), 4) AS oov_rate
        FROM ranked
        GROUP BY lang
        ORDER BY lang
    """,
    "token_entropy_stats": """
        SELECT lang, COUNT(*) AS n_docs,
               ROUND(AVG(ent), 4) AS avg_entropy,
               MIN(ent) AS min_entropy,
               MAX(ent) AS max_entropy
        FROM (
            SELECT lang,
                   ROUND(-list_reduce(
                       list_transform(list_sort(list_distinct(toks)),
                           t -> (CAST(len(list_filter(toks, x -> x = t)) AS DOUBLE)
                                 / len(toks))
                                * log2(CAST(len(list_filter(toks, x -> x = t)) AS DOUBLE)
                                       / len(toks))),
                       (x, y) -> x + y), 6) + 0.0 AS ent
            FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
        )
        GROUP BY lang
    """,
    "zipf_slope_per_lang": f"""
        WITH tf AS (
            SELECT lang, term, COUNT(*) AS c
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
            GROUP BY lang, term
        ),
        ranked AS (
            SELECT lang, c,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, term) AS r
            FROM tf
        )
        SELECT lang, COUNT(*) AS n_terms,
               ROUND(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
                   AS zipf_slope,
               ROUND(regr_intercept(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
                   AS zipf_intercept,
               ROUND(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
                   AS fit_r2
        FROM ranked
        WHERE r <= {ZIPF_TOP_TERMS}
        GROUP BY lang
    """,
    "nucleus_vocab_coverage": f"""
        WITH tf AS (
            SELECT lang, term, COUNT(*) AS c
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
            GROUP BY lang, term
        ),
        ranked AS (
            SELECT lang, c,
                   SUM(c) OVER (PARTITION BY lang ORDER BY c DESC, term
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   SUM(c) OVER (PARTITION BY lang) AS tot
            FROM tf
        )
        SELECT lang, COUNT(*) AS vocab_size,
               CAST(MAX(tot) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN CAST(cum - c AS DOUBLE) < {NUCLEUS_MASS} * tot
                             THEN 1 ELSE 0 END) AS BIGINT) AS nucleus_terms,
               ROUND(CAST(SUM(CASE WHEN CAST(cum - c AS DOUBLE) < {NUCLEUS_MASS} * tot
                                   THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
                   AS nucleus_frac
        FROM ranked
        GROUP BY lang
    """,
    "chunk_overlap_stats": f"""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_chunks) AS BIGINT) AS total_chunks,
               CAST(SUM(emitted - n_tokens) AS BIGINT) AS overlap_tokens,
               ROUND(CAST(SUM(emitted) AS DOUBLE) / SUM(n_tokens), 4) AS expansion,
               ROUND(AVG(CAST(emitted AS DOUBLE)
                         / (n_chunks * {float(RAG_CHUNK_TOKENS)})), 4) AS avg_fill
        FROM (
            SELECT source, n AS n_tokens,
                   1 + extra_chunks AS n_chunks,
                   n + {RAG_CHUNK_TOKENS - RAG_CHUNK_STRIDE} * extra_chunks AS emitted
            FROM (
                SELECT source, n,
                       CASE WHEN n > {RAG_CHUNK_TOKENS}
                            THEN (n - {RAG_CHUNK_TOKENS} + {RAG_CHUNK_STRIDE - 1}) // {RAG_CHUNK_STRIDE}
                            ELSE 0 END AS extra_chunks
                FROM (SELECT source, len(string_split(text, ' ')) AS n FROM documents)
            )
        )
        GROUP BY source
    """,
}

def skyline_docs(spark: SparkSession, sf: str) -> DataFrame:
    """2-D Pareto skyline of documents over (n_chars, n_tokens): the
    docs no other doc strictly dominates (>= on both metrics, > on at
    least one) — the frontier a curation UI shows when trading length
    against token density.

    Aggregate-first formulation so the global sort never touches the
    corpus: (1) one hash agg to max-tokens per distinct n_chars value —
    a table bounded by the length-metric cardinality, not corpus size;
    (2) the running-max dominance window runs over THAT tiny aggregate
    (single-partition, but on #distinct-lengths rows); (3) the skyline
    (n_chars, max_tokens) set — small by construction — broadcast-joins
    back to the metric rows to recover doc ids. A naive NOT EXISTS
    self-join is O(n^2) at scale; this is one agg + one tiny window +
    one broadcast join."""
    from pyspark.sql.window import Window

    docs = table(spark, sf, "documents")
    m = docs.select(
        "doc_id",
        F.col("n_chars").alias("m1"),
        F.size(F.split(F.col("text"), " ")).alias("m2"),
    )
    agg = m.groupBy("m1").agg(F.max("m2").alias("mx2"))
    w = (
        Window.orderBy(F.desc("m1"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = (
        agg.withColumn("best_above", F.max("mx2").over(w))
        .where(F.col("mx2") > F.coalesce(F.col("best_above"), F.lit(-1)))
        .select(F.col("m1").alias("sky_m1"), F.col("mx2").alias("sky_mx2"))
    )
    return (
        m.join(
            F.broadcast(sky),
            (F.col("m1") == F.col("sky_m1")) & (F.col("m2") == F.col("sky_mx2")),
        )
        .select("doc_id", F.col("m1").alias("n_chars"), F.col("m2").alias("n_tokens"))
        .orderBy("doc_id")
    )


ORACLE["readability_bands"] = f"""
    SELECT lang,
           CASE WHEN spw < {READ_SIMPLE_SPW} THEN 'simple'
                WHEN spw < {READ_MODERATE_SPW} THEN 'moderate'
                ELSE 'complex' END AS band,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM (
        SELECT lang,
               len(string_split(text, ' ')) AS n_words,
               (100 * list_sum(list_transform(string_split(text, ' '),
                    w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))))
                 // len(string_split(text, ' ')) AS spw
        FROM documents
    )
    GROUP BY 1, 2
    ORDER BY lang, band
"""

ORACLE["hapax_legomena_stats"] = """
    WITH freq AS (
        SELECT lang, t, COUNT(*) AS c
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
        GROUP BY lang, t
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS type_token_ratio,
           ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_share
    FROM freq
    GROUP BY lang
    ORDER BY lang
"""

ORACLE["skyline_docs"] = """
    WITH m AS (
        SELECT doc_id, n_chars AS m1, len(string_split(text, ' ')) AS m2
        FROM documents
    ),
    agg AS (SELECT m1, MAX(m2) AS mx2 FROM m GROUP BY m1),
    sky AS (
        SELECT m1, mx2
        FROM (
            SELECT m1, mx2,
                   MAX(mx2) OVER (ORDER BY m1 DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS best_above
            FROM agg
        )
        WHERE mx2 > COALESCE(best_above, -1)
    )
    SELECT m.doc_id, m.m1 AS n_chars, m.m2 AS n_tokens
    FROM m JOIN sky s ON m.m1 = s.m1 AND m.m2 = s.mx2
    ORDER BY m.doc_id
"""


INDEX_TOP_TERMS = 20  # posting lists emitted for the top-N terms by df
POSTINGS_CAP = 5  # capped posting-list prefix carried per term


def inverted_index_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Search-index construction: term → document frequency + the first
    POSTINGS_CAP doc ids of the sorted posting list, for the
    INDEX_TOP_TERMS highest-df terms (ties broken by term). The
    bounded-prefix posting array is what an index shard would persist
    per term block; the cap keeps driver/oracle comparison exact while
    the plan is the real inverted-index build.

    Shape at 100 TB: tokens deduplicate IN-DOCUMENT (array_distinct —
    row-local, shuffle-free) before the explode, so the emitted
    (term, doc_id) pairs are globally unique by construction and the
    plan needs exactly ONE exchange: the term-keyed aggregate. The
    first formulation deduplicated after the explode with a global
    distinct — a second full shuffle of the pair stream that measured
    19x slower at 10x corpus scale. collect_list materializes each
    term's posting group before the slice, so for web-scale head terms
    the production variant instead range-partitions by (term, doc_id)
    and writes postings as sorted partitioned parquet runs (the
    ``write_training_shards`` pattern) — the in-plan array form here
    is for the bounded top-N sample."""
    docs = table(spark, sf, "documents")
    pairs = docs.select(
        F.col("doc_id"), F.explode(F.array_distinct(_tokens())).alias("term")
    ).where(F.col("term") != "")
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            # postings travel as a canonical comma-joined STRING: an
            # array<bigint> output column has never crossed the external
            # gate, and the driver's pandas canonicalization of list
            # cells (numpy array vs python list repr) is exactly the
            # divergence class that produced round-3's HUGEINT false
            # reds — a string column is repr-stable in every layer
            F.array_join(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, POSTINGS_CAP),
                ",",
            ).alias("postings"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(INDEX_TOP_TERMS)
    )


ORACLE["inverted_index_sample"] = f"""
    WITH pairs AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    )
    SELECT term, COUNT(*) AS df,
           array_to_string(list_sort(list(doc_id))[1:{POSTINGS_CAP}], ',') AS postings
    FROM pairs
    WHERE term <> ''
    GROUP BY term
    ORDER BY df DESC, term ASC
    LIMIT {INDEX_TOP_TERMS}
"""


ORACLE["token_gini_per_lang"] = """
    WITH ranked AS (
        SELECT lang, len(string_split(text, ' ')) AS t,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY len(string_split(text, ' ')), doc_id) AS i
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(t) AS BIGINT) AS total_tokens,
           ROUND(CAST(2 * SUM(i * t) - (COUNT(*) + 1) * SUM(t) AS DOUBLE)
                 / (COUNT(*) * SUM(t)), 6) AS gini
    FROM ranked GROUP BY lang
"""

ORACLE["bpe_merge_candidates"] = f"""
    WITH words AS (
        SELECT w, COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    ),
    pairs AS (
        SELECT substr(w, i, 1) AS left_sym, substr(w, i + 1, 1) AS right_sym, freq
        FROM (
            SELECT w, freq, unnest(generate_series(1, len(w) - 1)) AS i
            FROM words WHERE len(w) >= 2
        )
    )
    SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY left_sym, right_sym
    ORDER BY pair_count DESC, left_sym, right_sym
    LIMIT {BPE_TOP_MERGES}
"""

_BM25_IN = "('" + "', '".join(BM25_TERMS) + "')"
ORACLE["bm25_doc_ranking"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t,
               len(string_split(text, ' ')) AS dl
        FROM documents
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_len
        FROM documents
    ),
    tf AS (
        SELECT doc_id, t, COUNT(*) AS tf, MIN(dl) AS dl
        FROM tok WHERE t IN {_BM25_IN}
        GROUP BY doc_id, t
    ),
    df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    scored AS (
        SELECT tf.doc_id,
               COUNT(*) AS n_query_terms,
               SUM(
                   ln(CAST(2 * s.n_docs + 2 AS DOUBLE) / (2 * df.df + 1))
                   * (22.0 * tf.tf * s.total_len)
                   / (10.0 * tf.tf * s.total_len + 3.0 * s.total_len
                      + 9.0 * tf.dl * s.n_docs)
               ) AS score
        FROM tf JOIN df USING (t) CROSS JOIN stats s
        GROUP BY tf.doc_id
    )
    SELECT n_query_terms, CAST(FLOOR(score * 10) AS INT) AS score_bucket,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY n_query_terms, score_bucket
    ORDER BY n_query_terms, score_bucket
"""

def tokenizer_fertility_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer fertility audit per language: chars-per-token,
    bytes-per-token (multibyte scripts inflate bytes, not chars), and
    the BPE-vs-whitespace fertility ratio — the numbers that decide
    how much compute a language actually costs per unit of text and
    whether a tokenizer under-serves non-Latin scripts.

    Row-local projections (length / octet_length / regexp_count) +
    one partial-aggregatable hash aggregate on ``lang`` — corpus text
    never crosses a shuffle, only per-lang sums do.  Exact integer
    sums; the three ratios are single double divisions of those sums,
    so they are bit-identical cross-engine before ROUND(.., 6)."""
    docs = table(spark, sf, "documents")
    per = docs.select(
        "lang",
        F.length("text").alias("chars"),
        F.octet_length("text").alias("bytes"),
        F.size(_tokens()).alias("ws"),
        F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).alias("bpe"),
    )
    bpe_d = F.nullif(F.sum("bpe").cast("double"), F.lit(0.0))
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("chars").alias("total_chars"),
            F.sum("bytes").alias("total_bytes"),
            F.sum("bpe").alias("total_bpe_tokens"),
            F.round(F.sum("chars") / bpe_d, 6).alias("chars_per_token"),
            F.round(F.sum("bytes") / bpe_d, 6).alias("bytes_per_token"),
            F.round(
                F.sum("bpe") / F.nullif(F.sum("ws").cast("double"), F.lit(0.0)), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


# fixed-shape padding buckets (powers of two) and the truncation cap —
# the static batch shapes a training stack compiles kernels for
PAD_BUCKETS = (64, 128, 256, 512, 1024, 2048)
PAD_CAP = 2048


def padding_waste_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Padding-waste accounting under fixed power-of-two batch shapes:
    each document is truncated to the max sequence length, routed to
    the smallest bucket that holds it, and padded up to the bucket
    size.  Reports per-bucket docs, kept tokens, padded slots, the
    waste fraction, and truncation losses — the trade study behind
    choosing bucket boundaries (vs the concat-and-chunk scheme that
    ``sequence_packing_bins`` accounts for, which wastes nothing but
    lets documents straddle boundaries).

    Pure row-local CASE routing + one hash aggregate on the 6-value
    bucket key: partial aggregation collapses each map task to <=6
    rows before the exchange, so raw rows never shuffle.  All sums are
    exact integers; the one ratio is a single rounded division."""
    docs = table(spark, sf, "documents")
    t = F.size(_tokens())
    kept = F.least(t, F.lit(PAD_CAP))
    bucket = F.when(kept.isNull(), F.lit(None).cast("int"))
    for b in PAD_BUCKETS[:-1]:
        bucket = bucket.when(kept <= b, F.lit(b))
    bucket = bucket.otherwise(F.lit(PAD_CAP))
    per = docs.select(
        bucket.alias("bucket"),
        kept.alias("kept"),
        (t > PAD_CAP).cast("int").alias("trunc"),
        F.greatest(t - PAD_CAP, F.lit(0)).alias("lost"),
    )
    slots = (F.col("bucket").cast("bigint") * F.col("n_docs")).alias("padded_slots")
    return (
        per.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("kept_tokens"),
            F.sum("trunc").alias("n_truncated"),
            F.sum("lost").alias("truncated_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "kept_tokens",
            slots,
            F.round(
                F.lit(1.0)
                - F.col("kept_tokens")
                / F.nullif(
                    (F.col("bucket") * F.col("n_docs")).cast("double"), F.lit(0.0)
                ),
                6,
            ).alias("pad_waste_pct"),
            "n_truncated",
            "truncated_tokens",
        )
        .orderBy("bucket")
    )


CODE_SWITCH_MIN_HITS = 2


def code_switch_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Code-switching / language-mixture detection: a document is
    flagged as mixed when marker tokens of two or more languages each
    appear at least CODE_SWITCH_MIN_HITS times — the multilingual-
    contamination signal that decides whether a doc can carry a single
    language tag (mislabeled or mixed docs poison per-language
    tokenizer and mixture-weight decisions downstream).

    Same row-local marker scoring as ``lang_id_confusion`` (size of a
    filtered token array per lexicon, all whole-stage codegen), plus a
    static 5-term fold counting evidenced languages; the only shuffle
    is the per-label rollup."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = _tokens()
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = docs.select("lang", *scores)
    n_evid = sum(
        (F.col(f"s_{lg}") >= CODE_SWITCH_MIN_HITS).cast("int")
        for lg in _LANGS_SORTED
    )
    flagged = scored.select(
        "lang",
        n_evid.alias("n_evid"),
        (n_evid >= 2).cast("int").alias("mixed"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("mixed").alias("n_code_switched"),
            F.round(F.avg("mixed"), 6).alias("switch_rate"),
            F.round(F.avg("n_evid"), 4).alias("avg_evidenced_langs"),
        )
        .orderBy("lang")
    )


def _code_switch_oracle() -> str:
    score_defs = ",\n               ".join(
        f"len(list_filter(toks, t -> list_contains({_markers_sql(LANG_MARKERS[lg])}, t))) AS s_{lg}"
        for lg in _LANGS_SORTED
    )
    n_evid = " + ".join(
        f"CASE WHEN s_{lg} >= {CODE_SWITCH_MIN_HITS} THEN 1 ELSE 0 END"
        for lg in _LANGS_SORTED
    )
    return f"""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(mixed) AS BIGINT) AS n_code_switched,
               ROUND(AVG(CAST(mixed AS DOUBLE)), 6) AS switch_rate,
               ROUND(AVG(CAST(n_evid AS DOUBLE)), 4) AS avg_evidenced_langs
        FROM (
            SELECT lang, n_evid,
                   CASE WHEN n_evid >= 2 THEN 1 ELSE 0 END AS mixed
            FROM (
                SELECT lang, ({n_evid}) AS n_evid
                FROM (SELECT lang, {score_defs}
                      FROM (SELECT lang, string_split(text, ' ') AS toks
                            FROM documents))
            )
        )
        GROUP BY lang
    """


QUERIES = {
    "bm25_doc_ranking": bm25_doc_ranking,
    "bpe_token_counts": bpe_token_counts,
    "bpe_merge_candidates": bpe_merge_candidates,
    "token_gini_per_lang": token_gini_per_lang,
    "token_count_stats": token_count_stats,
    "lang_id_confusion": lang_id_confusion,
    "quality_score_buckets": quality_score_buckets,
    "curriculum_deciles": curriculum_deciles,
    "doc_fingerprints": doc_fingerprints,
    "repetition_stats": repetition_stats,
    "stratified_sample_counts": stratified_sample_counts,
    "top_terms_per_lang": top_terms_per_lang,
    "udtf_chunk_stats": udtf_chunk_stats,
    "tfidf_top_terms": tfidf_top_terms,
    "bigram_lm_counts": bigram_lm_counts,
    "sequence_packing_bins": sequence_packing_bins,
    "tokenizer_vocab_coverage": tokenizer_vocab_coverage,
    "bigram_perplexity_buckets": bigram_perplexity_buckets,
    "token_entropy_stats": token_entropy_stats,
    "zipf_slope_per_lang": zipf_slope_per_lang,
    "nucleus_vocab_coverage": nucleus_vocab_coverage,
    "chunk_overlap_stats": chunk_overlap_stats,
    "skyline_docs": skyline_docs,
    "inverted_index_sample": inverted_index_sample,
    "readability_bands": readability_bands,
    "hapax_legomena_stats": hapax_legomena_stats,
    "tokenizer_fertility_stats": tokenizer_fertility_stats,
    "padding_waste_bins": padding_waste_bins,
    "code_switch_stats": code_switch_stats,
}

ORACLE["code_switch_stats"] = _code_switch_oracle()

ORACLE["tokenizer_fertility_stats"] = f"""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS total_chars,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(bpe) AS BIGINT) AS total_bpe_tokens,
           ROUND(SUM(chars) / CAST(NULLIF(SUM(bpe), 0) AS DOUBLE), 6)
               AS chars_per_token,
           ROUND(SUM(bytes) / CAST(NULLIF(SUM(bpe), 0) AS DOUBLE), 6)
               AS bytes_per_token,
           ROUND(SUM(bpe) / CAST(NULLIF(SUM(ws), 0) AS DOUBLE), 6)
               AS fertility
    FROM (SELECT lang,
                 length(text) AS chars,
                 strlen(text) AS bytes,
                 len(string_split(text, ' ')) AS ws,
                 len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe
          FROM documents)
    GROUP BY lang
"""

ORACLE["padding_waste_bins"] = f"""
    WITH per AS (
        SELECT CASE WHEN kept IS NULL THEN NULL
                    {" ".join(f"WHEN kept <= {b} THEN {b}" for b in PAD_BUCKETS[:-1])}
                    ELSE {PAD_CAP} END AS bucket,
               kept,
               CASE WHEN t > {PAD_CAP} THEN 1 ELSE 0 END AS trunc,
               GREATEST(t - {PAD_CAP}, 0) AS lost
        FROM (SELECT len(string_split(text, ' ')) AS t,
                     LEAST(len(string_split(text, ' ')), {PAD_CAP}) AS kept
              FROM documents)
    )
    SELECT bucket, n_docs,
           CAST(kept_tokens AS BIGINT) AS kept_tokens,
           CAST(bucket * n_docs AS BIGINT) AS padded_slots,
           ROUND(1.0 - kept_tokens
                       / CAST(NULLIF(bucket * n_docs, 0) AS DOUBLE), 6)
               AS pad_waste_pct,
           CAST(n_truncated AS BIGINT) AS n_truncated,
           CAST(truncated_tokens AS BIGINT) AS truncated_tokens
    FROM (SELECT bucket, COUNT(*) AS n_docs, SUM(kept) AS kept_tokens,
                 SUM(trunc) AS n_truncated, SUM(lost) AS truncated_tokens
          FROM per GROUP BY bucket)
"""


# Gopher-style rule bounds, tuned so each rule splits the synthetic
# corpus non-trivially (word counts run 10-99 with mean 54; mean word
# length runs 3.7-5.3; 'the' appears in ~3/4 of docs; distinct-token
# ratio centers on 0.5). Real deployments would widen these to the
# published Gopher thresholds (50-100k words, mean word length 3-10).
GOPHER_WC_MIN = 25
GOPHER_WC_MAX = 80
GOPHER_MWL_MIN = 4   # mean word length lower bound (x wc, integer math)
GOPHER_MWL_MAX = 5   # upper bound
GOPHER_STOPWORD = "the"
GOPHER_TTR_NUM = 2   # pass when TTR >= 1/TTR_NUM (2 -> ratio >= 0.5)


def gopher_quality_flags(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models", appendix A — word-count bounds, mean-word-length
    bounds, stopword presence, and a repetition proxy via the
    distinct-token ratio), reported as a per-language rule-pass ledger:
    the go/no-go audit a corpus curation run prints before filtering.

    Every rule is a row-local boolean over the token array; the only
    shuffle carries (lang, five 0/1 flags) partially aggregated — text
    never crosses the exchange, and the output is |langs| rows. All
    comparisons are integer cross-multiplications (mean word length in
    [4, 5] tests ``4*wc <= letters <= 5*wc``), so both engines agree
    exactly with no double division anywhere.
    """
    docs = table(spark, sf, "documents")
    toks = _tokens()
    wc = F.size(toks)
    # chars minus the single spaces between tokens = total word letters
    letters = F.length(F.regexp_replace(F.col("text"), " ", ""))
    dt = F.size(F.array_distinct(toks))
    pass_wc = wc.between(GOPHER_WC_MIN, GOPHER_WC_MAX)
    pass_mwl = (letters >= GOPHER_MWL_MIN * wc) & (letters <= GOPHER_MWL_MAX * wc)
    pass_stop = F.array_contains(toks, GOPHER_STOPWORD)
    pass_ttr = GOPHER_TTR_NUM * dt >= wc
    flag = lambda c: F.sum(c.cast("int"))  # noqa: E731
    return (
        docs.select("lang", pass_wc.alias("p1"), pass_mwl.alias("p2"),
                    pass_stop.alias("p3"), pass_ttr.alias("p4"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            flag(F.col("p1")).alias("n_pass_wordcount"),
            flag(F.col("p2")).alias("n_pass_wordlen"),
            flag(F.col("p3")).alias("n_pass_stopword"),
            flag(F.col("p4")).alias("n_pass_ttr"),
            flag(F.col("p1") & F.col("p2") & F.col("p3") & F.col("p4")).alias(
                "n_pass_all"
            ),
        )
        .orderBy("lang")
    )


QUERIES["gopher_quality_flags"] = gopher_quality_flags
ORACLE["gopher_quality_flags"] = f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN wc BETWEEN {GOPHER_WC_MIN} AND {GOPHER_WC_MAX}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_wordcount,
           CAST(SUM(CASE WHEN letters >= {GOPHER_MWL_MIN} * wc
                          AND letters <= {GOPHER_MWL_MAX} * wc
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_wordlen,
           CAST(SUM(CASE WHEN has_stop THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_stopword,
           CAST(SUM(CASE WHEN {GOPHER_TTR_NUM} * dt >= wc
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_ttr,
           CAST(SUM(CASE WHEN wc BETWEEN {GOPHER_WC_MIN} AND {GOPHER_WC_MAX}
                          AND letters >= {GOPHER_MWL_MIN} * wc
                          AND letters <= {GOPHER_MWL_MAX} * wc
                          AND has_stop
                          AND {GOPHER_TTR_NUM} * dt >= wc
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
    FROM (
        SELECT lang,
               len(string_split(text, ' ')) AS wc,
               length(replace(text, ' ', '')) AS letters,
               list_contains(string_split(text, ' '), '{GOPHER_STOPWORD}')
                   AS has_stop,
               len(list_distinct(string_split(text, ' '))) AS dt
        FROM documents
    )
    GROUP BY lang
    ORDER BY lang
"""


# --- winnowing (local document fingerprinting) -------------------------------

WINNOW_W = 4  # winnowing window: consecutive shingle-hash positions per window
WINNOW_N = 3  # shingle width in words (same as doc_fingerprints)


def winnowing_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm) — the LOCAL fingerprinting guarantee that
    ``doc_fingerprints``' global min/max hash lacks: slide a window of
    ``WINNOW_W`` consecutive word-3-gram hashes over each document and
    keep the window minimum, so every match of at least
    ``WINNOW_N + WINNOW_W - 1`` words is guaranteed to share a selected
    fingerprint (min/max-of-document gives no such locality). Per
    source: docs fingerprinted, total hash windows, selected
    fingerprints (distinct within doc), corpus-distinct fingerprints,
    and the selection density (theory: ~2/(W+1)).

    100 TB shape: shingling, hashing, the sliding min, and the
    in-document distinct are ALL row-local array expressions — the text
    column never crosses a shuffle. Only two tiny aggregates move data:
    a per-source partial+final rollup of three integers, and the
    corpus-distinct count, whose shuffle carries (source, fp_hash)
    pairs — 12 bytes a row, pre-shrunk map-side by partial distinct.
    The map-only subtree is deliberately recomputed for the two
    branches rather than cached: re-scanning a columnar text column
    through codegen is cheaper at scale than materializing per-doc hash
    arrays.

    Evaluation-order notes (both measured, both catastrophic when
    violated):

    - the hash array MUST be materialized as its own projected column
      before the sliding-min transform. Spark evaluates non-lambda
      subexpressions inside a higher-order-function lambda once PER
      ELEMENT, so inlining ``hs`` into ``slice(hs, i, W)`` recomputes
      every shingle md5 once per window. With ``hs`` bound as an
      attribute the slice is a field read, and the multi-reference
      projection survives CollapseProject (which never merges a
      projection whose non-cheap expressions are consumed more than
      once).
    - the short-doc cutoff MUST be a predicate on the raw token count,
      NOT a null/size test on the fingerprint array: PushDownPredicate
      rewrites a ``fps IS NOT NULL`` filter by substituting the ENTIRE
      fps expression tree — hash pipeline inlined back inside the
      window lambda — into a Filter node below the repartition
      (measured: 260 s at sf0.1 for a ~5000-doc corpus; 2 s with the
      cheap predicate). ``size(split(text)) >= N + W - 1`` is
      equivalent (n_windows >= 1) and costs one split.
    - the corpus-distinct branch MUST use ``explode_outer``, not
      ``explode``: InferFiltersFromGenerate adds ``size(fps) > 0 AND
      fps IS NOT NULL`` to a plain explode and PushDownPredicate then
      performs the same full-tree substitution as above (measured:
      13 s at sf0.01 from the inferred filter alone). The outer
      variant infers nothing, and the token-count predicate already
      guarantees every array is non-empty, so the rows are
      identical."""
    docs = widen_small_scan(table(spark, sf, "documents")).filter(
        F.size(_tokens()) >= WINNOW_N + WINNOW_W - 1
    )
    # token array materialized as a column for the same reason as hs
    # below: the shingle lambda slices it per element
    tokd = docs.select("doc_id", "source", _tokens().alias("toks"))
    toks = F.col("toks")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(toks) - WINNOW_N),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, WINNOW_N)),
    )
    hashed = tokd.select(
        "doc_id",
        "source",
        F.transform(shingles, lambda s: _h64_spark(s)).alias("hs"),
    )
    n_sh = F.size(F.col("hs"))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_sh - (WINNOW_W - 1)),
            lambda i: F.array_min(F.slice(F.col("hs"), i, WINNOW_W)),
        )
    )
    per_doc = hashed.select(
        "doc_id",
        "source",
        (n_sh - (WINNOW_W - 1)).alias("n_windows"),
        fps.alias("fps"),
        F.size(fps).alias("n_fp"),
    )
    rollup = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_windows").alias("n_windows"),
        F.sum("n_fp").alias("n_fp"),
    )
    distinct_fp = (
        per_doc.select("source", F.explode_outer("fps").alias("fp"))
        .groupBy("source")
        .agg(F.count_distinct("fp").alias("n_fp_distinct"))
    )
    return (
        rollup.join(F.broadcast(distinct_fp), "source")
        .select(
            "source",
            "n_docs",
            "n_windows",
            "n_fp",
            "n_fp_distinct",
            F.round(F.col("n_fp") / F.col("n_windows"), 4).alias("density"),
        )
        .orderBy("source")
    )


ORACLE["winnowing_fingerprints"] = f"""
    WITH hashed AS (
        SELECT doc_id, source,
               list_transform(
                   list_transform(
                       generate_series(1, len(string_split(text, ' ')) - {WINNOW_N - 1}),
                       i -> array_to_string(string_split(text, ' ')[i:i+{WINNOW_N - 1}], ' ')),
                   s -> {H64_SQL.format(expr="s")}) AS hs
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, source,
               len(hs) - {WINNOW_W - 1} AS n_windows,
               list_distinct(list_transform(
                   generate_series(1, len(hs) - {WINNOW_W - 1}),
                   i -> list_aggregate(hs[i:i+{WINNOW_W - 1}], 'min'))) AS fps
        FROM hashed WHERE len(hs) >= {WINNOW_W}
    )
    SELECT r.source, r.n_docs, r.n_windows, r.n_fp, d.n_fp_distinct,
           ROUND(r.n_fp / CAST(r.n_windows AS DOUBLE), 4) AS density
    FROM (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_windows) AS BIGINT) AS n_windows,
               CAST(SUM(len(fps)) AS BIGINT) AS n_fp
        FROM per_doc GROUP BY source
    ) r
    JOIN (
        SELECT source, COUNT(DISTINCT fp) AS n_fp_distinct
        FROM (SELECT source, unnest(fps) AS fp FROM per_doc)
        GROUP BY source
    ) d USING (source)
    ORDER BY source
"""
QUERIES["winnowing_fingerprints"] = winnowing_fingerprints


# --- LM-prep wave (r6 window): KN continuation + PMI collocations ------------

KN_TOP = 5  # words reported per language
PMI_MIN_COUNT = 3  # collocation support floor (classic PMI junk filter)
PMI_TOP = 5  # collocations reported per language


def kn_continuation_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Kneser-Ney continuation statistics — the count pass that
    distinguishes KN smoothing from plain Katz/add-k (Kneser & Ney
    1995): a word's continuation probability is driven by how many
    DISTINCT left contexts it follows, not how often it occurs
    (the canonical example: 'Francisco' is frequent but follows almost
    nothing but 'San', so its continuation mass is tiny). Per language:
    the ``KN_TOP`` words with the most distinct left contexts, with
    p_continuation(w) = N1+(·w) / |distinct bigram types|.

    100 TB shape: bigrams come from one index-explode in a plain
    codegen projection (no per-element lambda recompute); the distinct
    bigram-type reduction is the only corpus-sized shuffle and
    partial-aggregates map-side (dup bigrams collapse before the
    exchange). Everything after runs on the (lang, word)-aggregated
    relation: the per-lang type total is a 5-row broadcast, and the
    top-k window compiles to WindowGroupLimit over aggregate rows."""
    from pyspark.sql.window import Window

    docs = widen_small_scan(table(spark, sf, "documents"))
    bg = (
        docs.select("lang", _tokens().alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "lang",
            "toks",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i"),
        )
        .select(
            "lang",
            F.element_at("toks", F.col("i")).alias("w1"),
            F.element_at("toks", F.col("i") + 1).alias("w2"),
        )
    )
    types = bg.distinct()
    cont = types.groupBy("lang", "w2").agg(F.count("*").alias("cont_types"))
    tot = types.groupBy("lang").agg(F.count("*").alias("total_types"))
    w = Window.partitionBy("lang").orderBy(F.desc("cont_types"), F.asc("w2"))
    return (
        cont.join(F.broadcast(tot), "lang")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= KN_TOP)
        .select(
            "lang",
            "rank",
            F.col("w2").alias("word"),
            "cont_types",
            F.round(
                F.col("cont_types").cast("double") / F.col("total_types"), 6
            ).alias("p_continuation"),
        )
        .orderBy("lang", "rank")
    )


def pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """PMI collocation extraction (Church & Hanks 1990): per language,
    the ``PMI_TOP`` adjacent word pairs with the highest pointwise
    mutual information log2(p(ab) / (p(a)·p(b))) among pairs seen at
    least ``PMI_MIN_COUNT`` times — the classic corpus-linguistics pass
    for multi-word expressions (and, in a training pipeline, for
    tokenizer-merge and stop-phrase candidates). Unigram probabilities
    use occurrence counts over all tokens; the pair probability uses
    adjacent-pair occurrences.

    100 TB shape: two corpus-sized reductions, both partial-aggregating
    map-side (token occurrences; adjacent-pair occurrences from the
    same index-explode idiom as ``bigram_lm_counts``). The unigram
    joins key on (lang, word) against aggregated relations; the per-
    lang totals are 5-row broadcasts; ranking windows over aggregate
    rows only. Ties in rounded PMI break on the pair text."""
    from pyspark.sql.window import Window

    docs = widen_small_scan(table(spark, sf, "documents"))
    tokd = docs.select("lang", _tokens().alias("toks"))
    uni = (
        tokd.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("n_w"))
    )
    n_uni = uni.groupBy("lang").agg(F.sum("n_w").alias("n_uni"))
    pairs = (
        tokd.filter(F.size("toks") >= 2)
        .select(
            "lang",
            "toks",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i"),
        )
        .select(
            "lang",
            F.element_at("toks", F.col("i")).alias("w1"),
            F.element_at("toks", F.col("i") + 1).alias("w2"),
        )
        .groupBy("lang", "w1", "w2")
        .agg(F.count("*").alias("n_pair"))
    )
    n_bi = pairs.groupBy("lang").agg(F.sum("n_pair").alias("n_bi"))
    scored = (
        pairs.filter(F.col("n_pair") >= PMI_MIN_COUNT)
        .join(uni.select("lang", F.col("w").alias("w1"), F.col("n_w").alias("n_w1")),
              ["lang", "w1"])
        .join(uni.select("lang", F.col("w").alias("w2"), F.col("n_w").alias("n_w2")),
              ["lang", "w2"])
        .join(F.broadcast(n_uni), "lang")
        .join(F.broadcast(n_bi), "lang")
        .select(
            "lang",
            F.concat_ws(" ", F.col("w1"), F.col("w2")).alias("pair"),
            "n_pair",
            F.round(
                F.log2(
                    (F.col("n_pair") / F.col("n_bi"))
                    / ((F.col("n_w1") / F.col("n_uni"))
                       * (F.col("n_w2") / F.col("n_uni")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("pmi"), F.asc("pair"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= PMI_TOP)
        .select("lang", "rank", "pair", "n_pair", "pmi")
        .orderBy("lang", "rank")
    )


ORACLE["kn_continuation_stats"] = f"""
    WITH types AS (
        SELECT DISTINCT lang,
               string_split(text, ' ')[i] AS w1,
               string_split(text, ' ')[i + 1] AS w2
        FROM (SELECT lang, text,
                     unnest(generate_series(1, len(string_split(text, ' ')) - 1)) AS i
              FROM documents
              WHERE len(string_split(text, ' ')) >= 2)
    ),
    cont AS (
        SELECT lang, w2, COUNT(*) AS cont_types FROM types GROUP BY lang, w2
    ),
    tot AS (
        SELECT lang, COUNT(*) AS total_types FROM types GROUP BY lang
    ),
    ranked AS (
        SELECT c.lang, c.w2, c.cont_types, t.total_types,
               ROW_NUMBER() OVER (PARTITION BY c.lang
                                  ORDER BY c.cont_types DESC, c.w2 ASC) AS rank
        FROM cont c JOIN tot t ON c.lang = t.lang
    )
    SELECT lang, CAST(rank AS INT) AS rank, w2 AS word,
           CAST(cont_types AS BIGINT) AS cont_types,
           ROUND(CAST(cont_types AS DOUBLE) / total_types, 6) AS p_continuation
    FROM ranked WHERE rank <= {KN_TOP}
    ORDER BY lang, rank
"""

ORACLE["pmi_collocations"] = f"""
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    uni AS (SELECT lang, w, COUNT(*) AS n_w FROM toks GROUP BY lang, w),
    n_uni AS (SELECT lang, SUM(n_w) AS n_uni FROM uni GROUP BY lang),
    pairs AS (
        SELECT lang,
               string_split(text, ' ')[i] AS w1,
               string_split(text, ' ')[i + 1] AS w2,
               COUNT(*) AS n_pair
        FROM (SELECT lang, text,
                     unnest(generate_series(1, len(string_split(text, ' ')) - 1)) AS i
              FROM documents
              WHERE len(string_split(text, ' ')) >= 2)
        GROUP BY lang, w1, w2
    ),
    n_bi AS (SELECT lang, SUM(n_pair) AS n_bi FROM pairs GROUP BY lang),
    scored AS (
        SELECT p.lang, p.w1 || ' ' || p.w2 AS pair, p.n_pair,
               ROUND(log2((p.n_pair / CAST(b.n_bi AS DOUBLE))
                          / ((u1.n_w / CAST(n.n_uni AS DOUBLE))
                             * (u2.n_w / CAST(n.n_uni AS DOUBLE)))), 6) AS pmi
        FROM pairs p
        JOIN uni u1 ON p.lang = u1.lang AND p.w1 = u1.w
        JOIN uni u2 ON p.lang = u2.lang AND p.w2 = u2.w
        JOIN n_uni n ON p.lang = n.lang
        JOIN n_bi b ON p.lang = b.lang
        WHERE p.n_pair >= {PMI_MIN_COUNT}
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY pmi DESC, pair ASC) AS rank
        FROM scored
    )
    SELECT lang, CAST(rank AS INT) AS rank, pair,
           CAST(n_pair AS BIGINT) AS n_pair, pmi
    FROM ranked WHERE rank <= {PMI_TOP}
    ORDER BY lang, rank
"""

QUERIES["kn_continuation_stats"] = kn_continuation_stats
QUERIES["pmi_collocations"] = pmi_collocations


# --- exact weighted quantiles (r6 window) ------------------------------------

WQ_QUANTILES = (("0.25", 1, 4), ("0.5", 1, 2), ("0.75", 3, 4), ("0.9", 9, 10))


def weighted_length_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT token-weighted document-length quantiles: the smallest
    n_chars value v such that documents of length <= v carry at least
    q of the corpus's TOKEN mass — the statistic a packing/serving
    planner actually needs (the unweighted median answers "half the
    DOCUMENTS are shorter"; the token-weighted median answers "half
    the TRAINING DATA lives in docs this short").

    100 TB shape: the weighted sibling of ``_distributed_rank`` —
    one range shuffle on (n_chars, doc_id), per-partition cumulative
    token sums, and a broadcast prefix-sum of per-partition weight
    totals turn the global cumulative weight into a row-local column;
    all four thresholds then resolve in ONE partial-aggregatable pass
    (min(struct) per threshold — no per-quantile scan, no single-task
    sort). Thresholds are exact integer cross-multiplications
    (cum * den >= num * total), so both engines pick identical rows."""
    from pyspark.sql.window import Window

    spark_ = spark
    docs = table(spark_, sf, "documents").select(
        "doc_id",
        F.col("n_chars").alias("score"),
        F.size(_tokens()).cast("bigint").alias("wt"),
    )
    nparts = int(spark_.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = docs.repartitionByRange(nparts, "score", "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("pid").agg(F.sum("wt").alias("w"))
    w_prev = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = counts.select(
        "pid",
        F.coalesce(F.sum("w").over(w_prev), F.lit(0)).alias("w_offset"),
        F.sum("w").over(w_all).alias("w_total"),
    )
    local = Window.partitionBy("pid").orderBy("score", "doc_id")
    cum = ranged.join(F.broadcast(off), "pid").withColumn(
        "cum_w", F.col("w_offset") + F.sum("wt").over(local)
    )
    picks = [
        F.min(
            F.when(
                F.col("cum_w") * F.lit(den) >= F.lit(num) * F.col("w_total"),
                F.struct(
                    F.col("cum_w").alias("c"),
                    F.col("score").alias("s"),
                    F.col("w_total").alias("t"),
                ),
            )
        ).alias(f"q_{label.replace('.', '_')}")
        for label, num, den in WQ_QUANTILES
    ]
    agg = cum.agg(*picks)
    per_q = [
        agg.select(
            F.lit(label).alias("quantile"),
            F.col(f"q_{label.replace('.', '_')}.s").alias("n_chars"),
            F.col(f"q_{label.replace('.', '_')}.c").alias("cum_tokens"),
            F.col(f"q_{label.replace('.', '_')}.t").alias("total_tokens"),
            F.round(
                F.col(f"q_{label.replace('.', '_')}.c")
                / F.col(f"q_{label.replace('.', '_')}.t"),
                6,
            ).alias("share"),
        )
        for label, _num, _den in WQ_QUANTILES
    ]
    out = per_q[0]
    for df in per_q[1:]:
        out = out.unionByName(df)
    return out.filter(F.col("n_chars").isNotNull()).orderBy("quantile")


_WQ_PICKS_SQL = ",\n               ".join(
    f"MIN(CASE WHEN cum_w * {den} >= {num} * w_total "
    f"THEN ROW(cum_w, score, w_total) END) AS q_{label.replace('.', '_')}"
    for label, num, den in WQ_QUANTILES
)
_WQ_ROWS_SQL = "\n    UNION ALL\n".join(
    f"""    SELECT '{label}' AS quantile,
           q_{label.replace('.', '_')}[2] AS n_chars,
           CAST(q_{label.replace('.', '_')}[1] AS BIGINT) AS cum_tokens,
           CAST(q_{label.replace('.', '_')}[3] AS BIGINT) AS total_tokens,
           ROUND(q_{label.replace('.', '_')}[1]
                 / CAST(q_{label.replace('.', '_')}[3] AS DOUBLE), 6) AS share
    FROM agg WHERE q_{label.replace('.', '_')} IS NOT NULL"""
    for label, _num, _den in WQ_QUANTILES
)

ORACLE["weighted_length_quantiles"] = f"""
    WITH cum AS (
        SELECT n_chars AS score,
               SUM(len(string_split(text, ' ')))
                   OVER (ORDER BY n_chars, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum_w,
               SUM(len(string_split(text, ' '))) OVER () AS w_total
        FROM documents
    ),
    agg AS (
        SELECT {_WQ_PICKS_SQL}
        FROM cum
    )
{_WQ_ROWS_SQL}
    ORDER BY quantile
"""
QUERIES["weighted_length_quantiles"] = weighted_length_quantiles


# ---------------------------------------------------------------------------
# Round 8: ITERATIVE BPE merge training (Sennrich et al. 2016) —
# bpe_merge_candidates does one round of pair counting; this family
# unrolls BPE_MERGE_ROUNDS full train rounds (count pairs -> pick the
# argmax merge -> APPLY it to the vocabulary -> recount), the same
# fixed-round lazy-plan shape as kmeans_embeddings / label propagation.
#
# Representation: each vocabulary word's symbol sequence is a string
# where EVERY symbol carries its own frame: "|c||a||t|" (adjacent
# symbols therefore meet at a double delimiter "||").  Applying merge
# (l, r) is then ONE literal string replace of "|l||r|" with "|lr|":
# a match consumes both symbols' complete frames, so the scan resumes
# exactly at the next symbol's own left frame and non-overlapping
# left-to-right replace IS the tokenizer's greedy left-to-right merge
# application — including self-pair runs ("aaaaa" with merge (a,a)
# becomes [aa, aa, a]).  The earlier shared-delimiter form
# ("|c|a|t|" + double replace) mis-phased self-pair runs >= 5
# (it produced [aa, a, aa]); the per-symbol frame removes the shared
# delimiter that caused the phase slip.  Exact in BOTH engines, with
# no UDF and no per-symbol explode in the apply step; pinned against
# a Python greedy reference by
# tests/test_properties.py::test_bpe_iterative_merges_match_greedy_reference.
#
# Scale shape (the classic BPE-training trick): the corpus collapses to
# its WORD-FREQUENCY table first (one shuffle, vocabulary << corpus);
# every subsequent round runs over the vocabulary only, weighted by
# freq.  At 100 TB the vocab table is a few GB: 3 unrolled rounds are
# 3 hash aggs + 3 broadcast singleton joins over it, corpus touched
# once.

BPE_MERGE_ROUNDS = 3


def _bpe_word_vocab(docs: DataFrame) -> DataFrame:
    """(w, freq, s): word-frequency vocabulary with the per-symbol
    framed string s = '|c||a||t|' (each symbol wrapped in its own
    '|...|'; see the module comment for why this framing makes single
    replace exactly greedy)."""
    return (
        docs.select(F.explode(_tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            "w",
            "freq",
            F.regexp_replace("w", "(.)", r"|$1|").alias("s"),
        )
    )


def _bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts over the framed vocab.

    Splitting '|c||a||t|' on '|' yields ['', c, '', a, '', t, ''] —
    size 2n+1 with the n symbols at even 1-based positions 2..2n, so
    adjacent pairs sit at (i, i+2) for i = 2, 4, .., 2n-2."""
    syms = F.split("s", "\\|")
    return (
        vocab.select("freq", syms.alias("sy"))
        .filter(F.size("sy") >= 5)  # at least two symbols
        .select(
            "freq",
            "sy",
            F.explode(
                F.sequence(F.lit(2), F.size("sy") - 3, F.lit(2))
            ).alias("i"),
        )
        .select(
            F.element_at("sy", F.col("i").cast("int")).alias("left_sym"),
            F.element_at("sy", F.col("i").cast("int") + 2).alias("right_sym"),
            "freq",
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").alias("pair_count"))
    )


def _bpe_top1(pairs: DataFrame) -> DataFrame:
    """The round's merge: argmax pair_count, ties to the
    lexicographically smallest (left, right) — one deterministic row."""
    return pairs.agg(
        F.min(
            F.struct(
                (-F.col("pair_count")).alias("nc"),
                F.col("left_sym").alias("l"),
                F.col("right_sym").alias("r"),
            )
        ).alias("m")
    ).select(
        F.col("m.l").alias("left_sym"),
        F.col("m.r").alias("right_sym"),
        (-F.col("m.nc")).alias("pair_count"),
    )


def _bpe_apply(vocab: DataFrame, top1: DataFrame) -> DataFrame:
    """Apply the merge to every vocab word: ONE literal replace of
    '|l||r|' -> '|lr|' (exactly greedy under the per-symbol framing;
    see module comment)."""
    pat = F.concat(
        F.lit("|"), "left_sym", F.lit("||"), "right_sym", F.lit("|")
    )
    rep = F.concat(F.lit("|"), "left_sym", "right_sym", F.lit("|"))
    return vocab.crossJoin(F.broadcast(top1)).select(
        "w", "freq", F.replace("s", pat, rep).alias("s")
    )


def _bpe_chain(docs: DataFrame):
    """Unrolled train chain: returns ([top1_round1.., top1_roundK],
    [vocab_round0.., vocab_roundK])."""
    vocab = _bpe_word_vocab(docs)
    tops, vocabs = [], [vocab]
    for _ in range(BPE_MERGE_ROUNDS):
        top1 = _bpe_top1(_bpe_pair_counts(vocab))
        vocab = _bpe_apply(vocab, top1)
        tops.append(top1)
        vocabs.append(vocab)
    return tops, vocabs


def _bpe_sql_ctes(src: str = "documents") -> str:
    """DuckDB twin of ``_bpe_chain``: CTEs v0..vK (framed vocab after k
    merges) and t1..tK (the round-k merge row)."""
    ctes = [
        f"""v0 AS (
            SELECT w, COUNT(*) AS freq,
                   regexp_replace(w, '(.)', '|\\1|', 'g') AS s
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {src})
            GROUP BY w
        )"""
    ]
    for k in range(1, BPE_MERGE_ROUNDS + 1):
        ctes.append(
            f"""p{k} AS (
            SELECT sy[i] AS left_sym, sy[i + 2] AS right_sym,
                   CAST(SUM(freq) AS BIGINT) AS pair_count
            FROM (
                SELECT freq, sy,
                       unnest(generate_series(2, len(sy) - 3, 2)) AS i
                FROM (SELECT freq, string_split(s, '|') AS sy
                      FROM v{k - 1})
                WHERE len(sy) >= 5
            )
            GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"""t{k} AS (
            SELECT left_sym, right_sym, pair_count FROM p{k}
            ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1
        )"""
        )
        ctes.append(
            f"""v{k} AS (
            SELECT w, freq,
                   replace(s,
                       '|' || left_sym || '||' || right_sym || '|',
                       '|' || left_sym || right_sym || '|') AS s
            FROM v{k - 1} CROSS JOIN t{k}
        )"""
        )
    return ",\n".join(ctes)


def bpe_iterative_merges(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer training, rounds 1..3: the merge each round
    greedily picks (argmax weighted adjacent-pair count over the
    CURRENT vocabulary, i.e. after applying all earlier merges) and its
    count — the actual head of a merges.txt. Each round's count is
    computed on the merged vocab of the previous round, which is what
    separates training from bpe_merge_candidates' single snapshot."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    tops, _ = _bpe_chain(docs)
    out = None
    for k, t in enumerate(tops, start=1):
        row = t.select(
            F.lit(k).alias("round"), "left_sym", "right_sym", "pair_count"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


ORACLE["bpe_iterative_merges"] = (
    "WITH " + _bpe_sql_ctes() + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {k} AS round, left_sym, right_sym, pair_count FROM t{k}"
        for k in range(1, BPE_MERGE_ROUNDS + 1)
    )
    + "\nORDER BY round"
)

QUERIES["bpe_iterative_merges"] = bpe_iterative_merges


def bpe_compression_curve(spark: SparkSession, sf: str) -> DataFrame:
    """What each merge buys: corpus symbol count (vocab symbol count
    weighted by word frequency) after 0..3 merges, plus symbols per
    word — the compression curve that justifies (or caps) a vocab
    budget. Round 0 is the character baseline.

    The weighted totals are exact integer sums; symbols_per_token is
    the one final double division."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    _, vocabs = _bpe_chain(docs)
    # '|c||a||t|' splits on '|' into 2n+1 elements for n symbols.
    n_sym = ((F.size(F.split("s", "\\|")) - 1) / 2).cast("long")
    out = None
    for k, v in enumerate(vocabs):
        row = v.agg(
            F.lit(k).alias("round"),
            F.sum("freq").alias("n_words"),
            F.sum(F.col("freq") * n_sym).alias("total_symbols"),
            F.round(
                F.sum(F.col("freq") * n_sym).cast("double")
                / F.sum("freq").cast("double"),
                6,
            ).alias("symbols_per_token"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


ORACLE["bpe_compression_curve"] = (
    "WITH " + _bpe_sql_ctes() + "\n"
    + "\nUNION ALL\n".join(
        f"""SELECT {k} AS round, CAST(SUM(freq) AS BIGINT) AS n_words,
               CAST(SUM(freq * ((len(string_split(s, '|')) - 1) // 2))
                   AS BIGINT) AS total_symbols,
               ROUND(CAST(SUM(freq * ((len(string_split(s, '|')) - 1) // 2))
                          AS DOUBLE) / CAST(SUM(freq) AS DOUBLE), 6)
                   AS symbols_per_token
        FROM v{k}"""
        for k in range(0, BPE_MERGE_ROUNDS + 1)
    )
    + "\nORDER BY round"
)

QUERIES["bpe_compression_curve"] = bpe_compression_curve


def bpe_fertility_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer fairness audit: per language, symbols-per-word under
    the corpus-trained 3-merge BPE — merges trained on the pooled
    corpus favor the dominant language's pair statistics, and this is
    the number that quantifies who pays for it (the trained-merge
    counterpart of the static fertility entry).

    The per-language word table joins the merged vocabulary on the
    word — a hash-equi join against the (small) vocab, no per-language
    retraining."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    _, vocabs = _bpe_chain(docs)
    final = vocabs[-1].select(
        "w",
        ((F.size(F.split("s", "\\|")) - 1) / 2).cast("long").alias("n_sym"),
    )
    lang_words = (
        docs.select("lang", F.explode(_tokens()).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("freq"))
    )
    return (
        lang_words.join(final, "w")
        .groupBy("lang")
        .agg(
            F.sum("freq").alias("n_words"),
            F.sum(F.col("freq") * F.col("n_sym")).alias("total_symbols"),
            F.round(
                F.sum(F.col("freq") * F.col("n_sym")).cast("double")
                / F.sum("freq").cast("double"),
                6,
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


ORACLE["bpe_fertility_by_lang"] = (
    "WITH " + _bpe_sql_ctes() + f""",
    final AS (
        SELECT w, (len(string_split(s, '|')) - 1) // 2 AS n_sym
        FROM v{BPE_MERGE_ROUNDS}
    ),
    lang_words AS (
        SELECT lang, w, COUNT(*) AS freq
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY lang, w
    )
    SELECT lang, CAST(SUM(freq) AS BIGINT) AS n_words,
           CAST(SUM(freq * n_sym) AS BIGINT) AS total_symbols,
           ROUND(CAST(SUM(freq * n_sym) AS DOUBLE)
                 / CAST(SUM(freq) AS DOUBLE), 6) AS fertility
    FROM lang_words JOIN final USING (w)
    GROUP BY lang ORDER BY lang"""
)

QUERIES["bpe_fertility_by_lang"] = bpe_fertility_by_lang


def lang_confidence_margin(spark: SparkSession, sf: str) -> DataFrame:
    """Confidence profile of the heuristic language-ID: per TRUE label,
    the distribution of the classifier's decision margin (best marker
    count minus second best — integers, so exactly portable). The
    confusion matrix says WHERE it errs; the margin histogram says how
    often it decides on a knife edge (margin 0 = coin toss between two
    languages), which is what calibrates an abstain threshold.

    Row-local scoring identical to lang_id_confusion; the margin is
    a sort over the fixed 5-score array per row (no shuffle), then one
    aggregate per (lang, margin-bucket)."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = _tokens()
    scores = F.array(
        *[
            F.size(F.filter(toks, lambda t: t.isin(*markers)))
            for _, markers in sorted(LANG_MARKERS.items())
        ]
    )
    sorted_scores = F.array_sort(scores)  # ascending
    best = F.element_at(sorted_scores, -1)
    second = F.element_at(sorted_scores, -2)
    margin = best - second
    bucket = (
        F.when(margin == 0, "m0_tie")
        .when(margin <= 2, "m1_narrow")
        .when(margin <= 5, "m2_clear")
        .otherwise("m3_strong")
    )
    return (
        docs.select("lang", bucket.alias("margin_bucket"), margin.alias("m"))
        .groupBy("lang", "margin_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum("m").cast("double") / F.count("*").cast("double"), 4
            ).alias("avg_margin"),
        )
        .orderBy("lang", "margin_bucket")
    )


def _lang_margin_oracle() -> str:
    score_exprs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        inlist = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            "len(list_filter(string_split(text, ' '), "
            f"t -> t IN ({inlist})))"
        )
    arr = "[" + ", ".join(score_exprs) + "]"
    return f"""
    WITH scored AS (
        SELECT lang,
               list_sort({arr}) AS ss
        FROM documents
    ),
    m AS (
        SELECT lang, ss[-1] - ss[-2] AS margin FROM scored
    )
    SELECT lang,
           CASE WHEN margin = 0 THEN 'm0_tie'
                WHEN margin <= 2 THEN 'm1_narrow'
                WHEN margin <= 5 THEN 'm2_clear'
                ELSE 'm3_strong' END AS margin_bucket,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(margin) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
               AS avg_margin
    FROM m GROUP BY 1, 2 ORDER BY lang, margin_bucket
"""


ORACLE["lang_confidence_margin"] = _lang_margin_oracle()
QUERIES["lang_confidence_margin"] = lang_confidence_margin


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-class) tokenizer: Viterbi-EM training +
# Viterbi segmentation, fully Catalyst-native (Kudo 2018, "Subword
# Regularization"; the hard-EM variant where the E-step keeps only the
# Viterbi segmentation).  Beyond-reference LLM-pipeline surface — the
# reference (a notebook ETL over ~11k-row Pinterest tables) has no
# tokenizer; this is the second tokenizer architecture next to
# ``bpe_iterative_merges`` above.
#
# Determinism contract (cross-engine, the HLL/KMV convention): piece
# log-probabilities are quantized to INTEGER MILLI-NATS —
# cost(piece) = round(1000*ln(total)) - round(1000*ln(cnt)), both
# BIGINT — so every Viterbi comparison is exact integer arithmetic in
# both engines; a divergence would need libm's ln to land within ~1
# ulp of a 0.5e-3 rounding boundary (~4e-12 per distinct count).  Ties
# break on the lexicographically smallest segmentation string via
# (ns, seg) struct ordering, identical in Spark and DuckDB.
#
# Scale shape (the same trick as BPE training): the corpus collapses
# to its distinct-WORD frequency table in one scan; seeding, every EM
# round, and every Viterbi pass then run over the vocabulary only,
# weighted by freq.  At 100 TB the word table is GBs; the piece table
# (substrings <= 4 chars) is MBs and broadcasts into the per-word cost
# map, so one EM round is one broadcast join + one fold projection +
# one hash agg — no all-pairs, no driver loop.  (A production trainer
# would also cap the seed vocabulary to the top-V substrings by count
# — one rank window — before the first E-step; the corpora here are
# well under any such cap, so the cap is documented, not applied.)
# Bounded inter-round state (the piece-count tables) is
# ``localCheckpoint``-ed between rounds per the bradley_terry
# convention, so unrolled EM rounds never re-derive earlier rounds'
# lineage (the r8 lazy-unroll pitfall).

UNI_MAX_PIECE = 4
UNI_EM_ROUNDS = 2
_UNI_INV = 10**12  # "piece missing" cost; valid dp totals stay < 1e6


def _uni_words(docs: DataFrame) -> DataFrame:
    """(w, freq, n): distinct-word corpus frequencies + char length."""
    return (
        docs.select(F.explode(_tokens()).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .withColumn("n", F.length("w").cast("int"))
    )


def _uni_substrings(words: DataFrame) -> DataFrame:
    """Every (piece, freq) occurrence: substrings of length 1..4 of
    each vocabulary word, weighted by word frequency.  Also carries
    (w, n, p, l) so ``_uni_cost_maps`` can reuse the same explode."""
    return (
        words.select(
            "w", "freq", "n",
            F.explode(F.sequence(F.lit(1), F.col("n"))).alias("p"),
        )
        .select(
            "w", "freq", "n", "p",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(UNI_MAX_PIECE), F.col("n") - F.col("p") + 1),
                )
            ).alias("l"),
        )
        .withColumn("piece", F.substring("w", F.col("p"), F.col("l")))
    )


def _uni_seed_counts(words: DataFrame) -> DataFrame:
    """Round-0 piece counts: weighted substring occurrences."""
    return _uni_substrings(words).groupBy("piece").agg(
        F.sum("freq").alias("cnt")
    )


def _uni_costs(counts: DataFrame) -> DataFrame:
    """(piece, cost): integer milli-nat Viterbi cost per piece,
    cost = round(1000*ln(sum cnt)) - round(1000*ln(cnt)).  The 1-row
    total aggregate broadcasts (intentional BNLJ, constant probe)."""
    tot = counts.agg(
        F.round(F.lit(1000) * F.log(F.sum("cnt")), 0)
        .cast("long")
        .alias("t_milli")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "piece",
        (
            F.col("t_milli")
            - F.round(F.lit(1000) * F.log("cnt"), 0).cast("long")
        ).alias("cost"),
    )


def _uni_viterbi(words: DataFrame, costs: DataFrame) -> DataFrame:
    """Viterbi-segment every vocabulary word under the given piece
    costs: (w, freq, n, ns, seg, k_pieces) where seg is the optimal
    segmentation as '|p1|p2|...' and ns its total integer cost.

    The DP is ONE ``F.aggregate`` fold per word over positions 1..n,
    carrying the last four dp states (pieces are <= 4 chars) as a
    struct of (ns, seg) pairs; the per-position piece-cost lookups hit
    a per-word map column built by one broadcast join + one hash agg,
    so the fold itself is a pure projection — no join, no UDF, no
    per-row Python.  ``array_min`` over the four candidate structs is
    the argmax (min cost, then lexicographically smallest seg)."""
    wmap = (
        _uni_substrings(words)
        .join(F.broadcast(costs), "piece")
        .groupBy("w", "freq", "n")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("p") * 8 + F.col("l")).alias("k"),
                        F.col("cost").alias("v"),
                    )
                )
            ).alias("m")
        )
    )

    def _d(ns, seg):
        return F.struct(ns.cast("long").alias("ns"), seg.alias("seg"))

    zero = F.struct(
        _d(F.lit(0), F.lit("")).alias("d0"),
        _d(F.lit(_UNI_INV), F.lit("")).alias("d1"),
        _d(F.lit(_UNI_INV), F.lit("")).alias("d2"),
        _d(F.lit(_UNI_INV), F.lit("")).alias("d3"),
    )

    def _step(acc, j):
        cands = []
        for piece_len in range(1, UNI_MAX_PIECE + 1):
            prev = acc.getField(f"d{piece_len - 1}")
            start = j - F.lit(piece_len) + 1
            piece = F.substring(F.col("w"), start, F.lit(piece_len))
            cost = F.element_at(F.col("m"), start * 8 + F.lit(piece_len))
            cands.append(
                F.when(
                    j >= F.lit(piece_len),
                    _d(
                        prev.getField("ns")
                        + F.coalesce(cost, F.lit(_UNI_INV)),
                        F.concat(prev.getField("seg"), F.lit("|"), piece),
                    ),
                ).otherwise(_d(F.lit(4 * _UNI_INV), F.lit("")))
            )
        best = F.array_min(F.array(*cands))
        return F.struct(
            best.alias("d0"),
            acc.getField("d0").alias("d1"),
            acc.getField("d1").alias("d2"),
            acc.getField("d2").alias("d3"),
        )

    return wmap.select(
        "w", "freq", "n",
        F.aggregate(F.sequence(F.lit(1), F.col("n")), zero, _step)
        .getField("d0")
        .alias("d"),
    ).select(
        "w", "freq", "n",
        F.col("d.ns").alias("ns"),
        F.col("d.seg").alias("seg"),
        (
            F.length("d.seg") - F.length(F.replace("d.seg", F.lit("|"), F.lit("")))
        ).cast("long").alias("k_pieces"),
    )


def _uni_next_counts(vit: DataFrame, seed: DataFrame) -> DataFrame:
    """M-step: piece counts = Viterbi usage (weighted by word freq)
    plus add-one smoothing for every single-char seed piece, so no
    word is ever unsegmentable in the next round; unused multi-char
    candidates drop out (the EM pruning step)."""
    usage = (
        vit.select(
            "freq",
            F.explode(F.split("seg", "\\|")).alias("piece"),
        )
        .filter(F.col("piece") != "")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    singles = seed.filter(F.length("piece") == 1).select(
        "piece", F.lit(1).cast("long").alias("cnt")
    )
    return (
        usage.unionByName(singles)
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _uni_chain(docs: DataFrame, final_vit: bool = True):
    """Unrolled Viterbi-EM chain: returns (counts, vits) with
    counts[r] the piece table entering round r (len EM_ROUNDS+1) and
    vits[r] the Viterbi segmentation under counts[r] (vits[-1], the
    final tokenizer's segmentation, is built only when ``final_vit`` —
    the train ledger needs the piece tables, not the last E-step).

    Every bounded state table — the word vocabulary, the seed piece
    table, and each round's Viterbi output — is eagerly
    ``localCheckpoint``-ed, so the corpus is scanned exactly once
    (into ``words``) and each Viterbi pass executes exactly once no
    matter how many downstream branches reference it (the r8
    lazy-unroll pitfall; consumers like the compression curve read
    every round's vit)."""
    words = _uni_words(docs).localCheckpoint(eager=True)
    seed = _uni_seed_counts(words).localCheckpoint(eager=True)
    counts, vits = [seed], []
    for r in range(UNI_EM_ROUNDS):
        vit = _uni_viterbi(words, _uni_costs(counts[r])).localCheckpoint(
            eager=True
        )
        vits.append(vit)
        counts.append(_uni_next_counts(vit, seed))
    if final_vit:
        vits.append(
            _uni_viterbi(words, _uni_costs(counts[-1])).localCheckpoint(
                eager=True
            )
        )
    return counts, vits


def unigram_lm_train(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM tokenizer training ledger: per EM round, the piece
    inventory entering the round — candidate count, multi-char count,
    total weighted count, and the argmax piece (ties to the
    lexicographically smallest).  Round 0 is the seeded candidate
    vocabulary (all substrings <= 4 chars); rounds 1..2 are after each
    Viterbi E-step + add-one-smoothed M-step, so the shrinking
    n_multi_pieces column IS the EM pruning at work."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    counts, _ = _uni_chain(docs, final_vit=False)
    out = None
    for r, c in enumerate(counts):
        row = c.agg(
            F.count("*").alias("n_pieces"),
            F.sum((F.length("piece") > 1).cast("long")).alias(
                "n_multi_pieces"
            ),
            F.sum("cnt").alias("total_count"),
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("nc"), F.col("piece").alias("p")
                )
            ).alias("m"),
        ).select(
            F.lit(r).alias("round"),
            "n_pieces",
            "n_multi_pieces",
            "total_count",
            F.col("m.p").alias("top_piece"),
            (-F.col("m.nc")).alias("top_count"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


def unigram_viterbi_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language fertility of the TRAINED unigram tokenizer (the
    round-2 piece table): words, Viterbi pieces per word, chars per
    piece.  The corpus-wide tokenizer is applied to each language's
    own word frequencies — the standard multilingual-fertility audit
    (languages whose words the shared vocab covers poorly show higher
    pieces_per_word)."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    _, vits = _uni_chain(docs)
    by_lang = (
        docs.select("lang", F.explode(_tokens()).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count("*").alias("freq_l"))
    )
    return (
        by_lang.join(vits[-1].select("w", "n", "k_pieces"), "w")
        .groupBy("lang")
        .agg(
            F.sum("freq_l").alias("n_words"),
            F.sum(F.col("freq_l") * F.col("k_pieces")).alias("total_pieces"),
            F.sum(F.col("freq_l") * F.col("n")).alias("total_chars"),
        )
        .select(
            "lang",
            "n_words",
            "total_pieces",
            F.round(F.col("total_pieces") / F.col("n_words"), 6).alias(
                "pieces_per_word"
            ),
            F.round(F.col("total_chars") / F.col("total_pieces"), 6).alias(
                "chars_per_piece"
            ),
        )
        .orderBy("lang")
    )


def unigram_compression_curve(spark: SparkSession, sf: str) -> DataFrame:
    """What each EM round buys: corpus Viterbi piece count under the
    round-r model (r = 0..2), pieces per 100 chars, and chars per
    piece — the unigram twin of ``bpe_compression_curve``."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    _, vits = _uni_chain(docs)
    out = None
    for r, v in enumerate(vits):
        row = v.agg(
            F.sum(F.col("freq") * F.col("k_pieces")).alias("total_pieces"),
            F.sum(F.col("freq") * F.col("n")).alias("total_chars"),
        ).select(
            F.lit(r).alias("round"),
            "total_pieces",
            "total_chars",
            F.round(
                F.lit(100) * F.col("total_pieces") / F.col("total_chars"), 6
            ).alias("pieces_per_100_chars"),
            F.round(
                F.col("total_chars") / F.col("total_pieces"), 6
            ).alias("chars_per_piece"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


def _uni_sql_ctes(src: str = "documents") -> str:
    """DuckDB twin of ``_uni_chain``: CTE chain uw / us / uc0 and, per
    round r, usc{r} (integer milli-nat costs), udp{r} (the Viterbi DP
    as a recursive CTE carrying the last four dp states — the exact
    mirror of the Spark fold, incl. the (ns, seg) struct tie-break via
    ``list_min``), uv{r} (final segmentations) and ucnt{r+1} (usage +
    single-char smoothing).  Must be used under ``WITH RECURSIVE``."""
    inv = _UNI_INV
    ctes = [
        f"""uw AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, length(w) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {src})
            WHERE w <> '' GROUP BY w
        )""",
        f"""us AS (
            SELECT w[p : p + l - 1] AS piece, freq
            FROM (
                SELECT w, freq, n, p,
                       unnest(generate_series(1, least({UNI_MAX_PIECE}, n - p + 1))) AS l
                FROM (SELECT w, freq, n, unnest(generate_series(1, n)) AS p
                      FROM uw)
            )
        )""",
        """uc0 AS (
            SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
            FROM us GROUP BY piece
        )""",
    ]
    for r in range(UNI_EM_ROUNDS + 1):
        cnt_src = "uc0" if r == 0 else f"ucnt{r}"
        ctes.append(
            f"""usc{r} AS (
            SELECT piece,
                   (SELECT CAST(ROUND(1000 * ln(SUM(cnt)), 0) AS BIGINT)
                    FROM {cnt_src})
                   - CAST(ROUND(1000 * ln(cnt), 0) AS BIGINT) AS cost
            FROM {cnt_src}
        )"""
        )
        # candidate piece costs come in via four hash LEFT JOINs (one
        # per piece length) — a correlated scalar subquery here would
        # rescan the piece table per row per iteration
        cands, joins = [], []
        for piece_len in range(1, UNI_MAX_PIECE + 1):
            lo = f"j + {2 - piece_len}"
            joins.append(
                f"LEFT JOIN usc{r} s{piece_len}"
                f" ON s{piece_len}.piece = w[{lo} : j + 1]"
            )
            cands.append(
                f"""CASE WHEN j + 1 >= {piece_len} THEN
                {{'ns': d{piece_len - 1}.ns + COALESCE(
                     s{piece_len}.cost, CAST({inv} AS BIGINT)),
                 'seg': d{piece_len - 1}.seg || '|' || w[{lo} : j + 1]}}
                ELSE {{'ns': CAST({4 * inv} AS BIGINT), 'seg': ''}} END"""
            )
        cand_list = ",\n               ".join(cands)
        join_list = "\n            ".join(joins)
        ctes.append(
            f"""udp{r} AS (
            SELECT w, freq, n, 0 AS j,
                   {{'ns': CAST(0 AS BIGINT), 'seg': ''}} AS d0,
                   {{'ns': CAST({inv} AS BIGINT), 'seg': ''}} AS d1,
                   {{'ns': CAST({inv} AS BIGINT), 'seg': ''}} AS d2,
                   {{'ns': CAST({inv} AS BIGINT), 'seg': ''}} AS d3
            FROM uw
            UNION ALL
            SELECT w, freq, n, j + 1,
                   list_min([{cand_list}]) AS d0,
                   d0 AS d1, d1 AS d2, d2 AS d3
            FROM udp{r}
            {join_list}
            WHERE j < n
        )"""
        )
        ctes.append(
            f"""uv{r} AS (
            SELECT w, freq, n, d0.ns AS ns, d0.seg AS seg,
                   CAST(length(d0.seg)
                        - length(replace(d0.seg, '|', '')) AS BIGINT)
                       AS k_pieces
            FROM udp{r} WHERE j = n
        )"""
        )
        if r < UNI_EM_ROUNDS:
            ctes.append(
                f"""ucnt{r + 1} AS (
            SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
                SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT freq, unnest(string_split(seg, '|')) AS piece
                      FROM uv{r})
                WHERE piece <> '' GROUP BY piece
                UNION ALL
                SELECT piece, CAST(1 AS BIGINT) AS cnt
                FROM uc0 WHERE length(piece) = 1
            ) GROUP BY piece
        )"""
            )
    return ",\n".join(ctes)


def _uni_count_cte(r: int) -> str:
    return "uc0" if r == 0 else f"ucnt{r}"


ORACLE["unigram_lm_train"] = (
    "WITH RECURSIVE " + _uni_sql_ctes() + "\n"
    + "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS INT) AS round,
               COUNT(*) AS n_pieces,
               CAST(SUM(CASE WHEN length(piece) > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_multi_pieces,
               CAST(SUM(cnt) AS BIGINT) AS total_count,
               struct_extract(MIN({{'nc': -cnt, 'p': piece}}), 'p')
                   AS top_piece,
               -struct_extract(MIN({{'nc': -cnt, 'p': piece}}), 'nc')
                   AS top_count
        FROM {_uni_count_cte(r)}"""
        for r in range(UNI_EM_ROUNDS + 1)
    )
    + "\nORDER BY round"
)
QUERIES["unigram_lm_train"] = unigram_lm_train


ORACLE["unigram_viterbi_fertility"] = (
    "WITH RECURSIVE " + _uni_sql_ctes() + f""",
    ubl AS (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS freq_l
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w <> '' GROUP BY lang, w
    )
    SELECT lang,
           CAST(SUM(freq_l) AS BIGINT) AS n_words,
           CAST(SUM(freq_l * k_pieces) AS BIGINT) AS total_pieces,
           ROUND(CAST(SUM(freq_l * k_pieces) AS DOUBLE)
                 / CAST(SUM(freq_l) AS DOUBLE), 6) AS pieces_per_word,
           ROUND(CAST(SUM(freq_l * n) AS DOUBLE)
                 / CAST(SUM(freq_l * k_pieces) AS DOUBLE), 6)
               AS chars_per_piece
    FROM ubl JOIN uv{UNI_EM_ROUNDS} USING (w)
    GROUP BY lang ORDER BY lang"""
)
QUERIES["unigram_viterbi_fertility"] = unigram_viterbi_fertility


ORACLE["unigram_compression_curve"] = (
    "WITH RECURSIVE " + _uni_sql_ctes() + "\n"
    + "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS INT) AS round,
               CAST(SUM(freq * k_pieces) AS BIGINT) AS total_pieces,
               CAST(SUM(freq * n) AS BIGINT) AS total_chars,
               ROUND(100.0 * CAST(SUM(freq * k_pieces) AS DOUBLE)
                     / CAST(SUM(freq * n) AS DOUBLE), 6)
                   AS pieces_per_100_chars,
               ROUND(CAST(SUM(freq * n) AS DOUBLE)
                     / CAST(SUM(freq * k_pieces) AS DOUBLE), 6)
                   AS chars_per_piece
        FROM uv{r}"""
        for r in range(UNI_EM_ROUNDS + 1)
    )
    + "\nORDER BY round"
)
QUERIES["unigram_compression_curve"] = unigram_compression_curve


# ---------------------------------------------------------------------------
# Round 10 (slot 2): WordPiece tokenizer training — the third tokenizer
# architecture next to BPE and unigram-LM (Schuster & Nakajima 2012 /
# BERT's trainer).  Identical machinery to BPE (framed vocab, pair
# counts, single-replace greedy apply) with ONE change: the merge each
# round maximizes the LIKELIHOOD score count(l,r)/(count(l)*count(r))
# instead of the raw pair count.  The score is one correctly-rounded
# double division of exact BIGINT operands (pair and symbol counts),
# so both engines compute the identical double and the argmax is
# deterministic; ties break lexicographically on (left, right).


def _wp_sym_counts(vocab: DataFrame) -> DataFrame:
    """(sym, sym_count): weighted symbol occurrences over the framed
    vocab — the denominator terms of the WordPiece score.  Same
    even-position split convention as ``_bpe_pair_counts``."""
    syms = F.split("s", "\\|")
    return (
        vocab.select("freq", syms.alias("sy"))
        .select(
            "freq",
            "sy",
            F.explode(
                F.sequence(F.lit(2), F.size("sy") - 1, F.lit(2))
            ).alias("i"),
        )
        .select(
            F.element_at("sy", F.col("i").cast("int")).alias("sym"), "freq"
        )
        .groupBy("sym")
        .agg(F.sum("freq").alias("sym_count"))
    )


def _wp_top1(pairs: DataFrame, syms: DataFrame) -> DataFrame:
    """The round's WordPiece merge: argmax of
    pair_count/(left_count*right_count), ties to the smallest
    (left, right).  Symbol counts broadcast (vocab-bounded)."""
    j = pairs.join(
        F.broadcast(
            syms.withColumnRenamed("sym", "left_sym").withColumnRenamed(
                "sym_count", "left_count"
            )
        ),
        "left_sym",
    ).join(
        F.broadcast(
            syms.withColumnRenamed("sym", "right_sym").withColumnRenamed(
                "sym_count", "right_count"
            )
        ),
        "right_sym",
    )
    score = F.col("pair_count").cast("double") / (
        F.col("left_count") * F.col("right_count")
    ).cast("double")
    return j.agg(
        F.min(
            F.struct(
                (-score).alias("ns"),
                F.col("left_sym").alias("l"),
                F.col("right_sym").alias("r"),
                F.col("pair_count").alias("c"),
                F.col("left_count").alias("lc"),
                F.col("right_count").alias("rc"),
            )
        ).alias("m")
    ).select(
        F.col("m.l").alias("left_sym"),
        F.col("m.r").alias("right_sym"),
        F.col("m.c").alias("pair_count"),
        F.col("m.lc").alias("left_count"),
        F.col("m.rc").alias("right_count"),
    )


def wordpiece_iterative_merges(spark: SparkSession, sf: str) -> DataFrame:
    """WordPiece training rounds 1..3: the likelihood-scored merge per
    round with its pair and symbol counts and the score itself — the
    head of a BERT-style vocab, trained on the same word-frequency
    table as BPE (one corpus scan, all rounds vocabulary-sized; the
    flat-scaling argument of the unigram family applies verbatim)."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    # each round reads the previous vocab THREE times (pair counts,
    # symbol counts, apply) — without the lineage cut the plan tree
    # grows 3x per round (the r8 lazy-unroll pitfall; BPE's 2-ref
    # chain tolerates laziness, this one measured ~2x slower lazy).
    # The 1-row merge is ALSO checkpointed (r11): it feeds both the
    # apply and the output row, so left lazy its pair+symbol
    # aggregations re-ran in the final union — and the LAST round's
    # vocab is never read, so its apply job is skipped outright
    # (same-session A/B 2.19 → 1.82 s, identical rows).
    vocab = _bpe_word_vocab(docs).localCheckpoint(eager=True)
    out = None
    for k in range(1, BPE_MERGE_ROUNDS + 1):
        top1 = _wp_top1(
            _bpe_pair_counts(vocab), _wp_sym_counts(vocab)
        ).localCheckpoint(eager=True)
        if k < BPE_MERGE_ROUNDS:
            vocab = _bpe_apply(vocab, top1).localCheckpoint(eager=True)
        row = top1.select(
            F.lit(k).alias("round"),
            "left_sym",
            "right_sym",
            "pair_count",
            "left_count",
            "right_count",
            F.round(
                F.col("pair_count").cast("double")
                / (F.col("left_count") * F.col("right_count")).cast(
                    "double"
                ),
                9,
            ).alias("score"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


def _wp_sql_ctes(src: str = "documents") -> str:
    """DuckDB twin of the WordPiece chain: wv0..wvK framed vocabs,
    wsym/wp/wt per round (symbol counts, pair counts, the
    likelihood-argmax merge)."""
    ctes = [
        f"""wv0 AS (
            SELECT w, COUNT(*) AS freq,
                   regexp_replace(w, '(.)', '|\\1|', 'g') AS s
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {src})
            GROUP BY w
        )"""
    ]
    for k in range(1, BPE_MERGE_ROUNDS + 1):
        ctes.append(
            f"""wsym{k} AS (
            SELECT sy[i] AS sym, CAST(SUM(freq) AS BIGINT) AS sym_count
            FROM (
                SELECT freq, sy,
                       unnest(generate_series(2, len(sy) - 1, 2)) AS i
                FROM (SELECT freq, string_split(s, '|') AS sy
                      FROM wv{k - 1})
            )
            GROUP BY 1
        )"""
        )
        ctes.append(
            f"""wp{k} AS (
            SELECT sy[i] AS left_sym, sy[i + 2] AS right_sym,
                   CAST(SUM(freq) AS BIGINT) AS pair_count
            FROM (
                SELECT freq, sy,
                       unnest(generate_series(2, len(sy) - 3, 2)) AS i
                FROM (SELECT freq, string_split(s, '|') AS sy
                      FROM wv{k - 1})
                WHERE len(sy) >= 5
            )
            GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"""wt{k} AS (
            SELECT p.left_sym, p.right_sym, p.pair_count,
                   l.sym_count AS left_count, r.sym_count AS right_count
            FROM wp{k} p
            JOIN wsym{k} l ON l.sym = p.left_sym
            JOIN wsym{k} r ON r.sym = p.right_sym
            ORDER BY CAST(p.pair_count AS DOUBLE)
                     / CAST(l.sym_count * r.sym_count AS DOUBLE) DESC,
                     p.left_sym, p.right_sym
            LIMIT 1
        )"""
        )
        ctes.append(
            f"""wv{k} AS (
            SELECT w, freq,
                   replace(s,
                       '|' || left_sym || '||' || right_sym || '|',
                       '|' || left_sym || right_sym || '|') AS s
            FROM wv{k - 1} CROSS JOIN wt{k}
        )"""
        )
    return ",\n".join(ctes)


ORACLE["wordpiece_iterative_merges"] = (
    "WITH " + _wp_sql_ctes() + "\n"
    + "\nUNION ALL\n".join(
        f"""SELECT {k} AS round, left_sym, right_sym, pair_count,
               left_count, right_count,
               ROUND(CAST(pair_count AS DOUBLE)
                     / CAST(left_count * right_count AS DOUBLE), 9)
                   AS score
        FROM wt{k}"""
        for k in range(1, BPE_MERGE_ROUNDS + 1)
    )
    + "\nORDER BY round"
)
QUERIES["wordpiece_iterative_merges"] = wordpiece_iterative_merges
