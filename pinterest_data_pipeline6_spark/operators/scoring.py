"""Model-scored quality filtering: a hashed-feature linear classifier
(the fastText-class architecture of Joulin et al. 2016, as used for
quality filtering in GPT-3/CCNet-style pipelines) expressed entirely
in Catalyst.

The model: every token hashes into one of ``QC_BUCKETS`` feature
buckets (the hashing trick); the document score is the mean bucket
weight over its tokens.  Weights here are a deterministic fixture
(integer milli-units derived from a Knuth multiplicative hash of the
bucket index) standing in for trained parameters — a real deployment
swaps the literal array for trained weights without touching any
plumbing, exactly as ``multimodal._decode_image`` documents for
codecs.

Scale shape (the reason this architecture is THE standard for
100 TB-scale filtering): inference is a row-local projection — token
explode, modulo, literal-array lookup — with NO join against any
weight table and no Python; the only shuffles are the per-document
partial-aggregating sum (map-side combine on doc_id) and the bounded
per-lang/source rollups.  Integer weight sums keep every aggregate
exact; the single double division per document happens last.

Beyond-reference scope sanctioned by SURVEY.md §2 (LLM-pipeline
operators); no counterpart exists in the reference notebooks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline6_spark.operators.textops import (
    H64_SQL,
    _h64_spark,
    _tokens,
)
from pinterest_data_pipeline6_spark.sources.readers import (
    table,
    widen_small_scan,
)

QC_BUCKETS = 64

# Deterministic fixture weights, integer milli-units in [-1000, 1000]:
# w_b = (b * 2654435761) mod 2001 - 1000 (Knuth's multiplicative
# constant spreads consecutive buckets).  Embedded as the SAME literal
# array in the Spark plan and the DuckDB oracle.
QC_WEIGHTS_MILLI: list[int] = [
    ((b * 2654435761) % 2001) - 1000 for b in range(QC_BUCKETS)
]

_QCW_SQL = "[" + ", ".join(str(w) for w in QC_WEIGHTS_MILLI) + "]"

ORACLE: dict[str, str] = {}
QUERIES: dict = {}


def _doc_scores(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, lang, source, n_chars, n_tok, total_milli): exact
    integer classifier state per document.  total_milli = sum over
    token OCCURRENCES of the hashed bucket's milli-weight."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    warr = F.array(*[F.lit(w) for w in QC_WEIGHTS_MILLI])
    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.explode(_tokens()).alias("tok"),
    )
    scored = toks.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.element_at(
            warr, (_h64_spark(F.col("tok")) % QC_BUCKETS).cast("int") + 1
        ).alias("w"),
    )
    return scored.groupBy("doc_id", "lang", "source", "n_chars").agg(
        F.count("*").alias("n_tok"),
        F.sum("w").cast("bigint").alias("total_milli"),
    )


_DOC_SCORES_SQL = f"""
        SELECT doc_id, lang, source, n_chars,
               COUNT(*) AS n_tok,
               CAST(SUM({_QCW_SQL}[
                   CAST({H64_SQL.format(expr="tok")} % {QC_BUCKETS} AS INT) + 1
               ]) AS BIGINT) AS total_milli
        FROM (
            SELECT doc_id, lang, source, n_chars,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
        GROUP BY doc_id, lang, source, n_chars
"""


def quality_classifier_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Classifier score profile per language: documents, pass rate at
    the zero threshold (total weight > 0 — threshold comparisons stay
    on the exact integer sum), and the mean per-document score in
    milli-units (each document's one double division rounded to 9
    decimals into DECIMAL before averaging — the reid_risk_entropy
    accumulation convention)."""
    ds = _doc_scores(spark, sf)
    per_doc = F.round(
        F.col("total_milli").cast("double") / F.col("n_tok").cast("double"),
        9,
    ).cast("decimal(28,9)")
    return (
        ds.select("lang", "total_milli", per_doc.alias("score_milli"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("total_milli") > 0).cast("bigint")).alias("n_pass"),
            F.round(
                F.sum((F.col("total_milli") > 0).cast("bigint")).cast(
                    "double"
                )
                / F.count("*").cast("double"),
                6,
            ).alias("pass_rate"),
            F.round(
                F.sum("score_milli").cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("avg_score_milli"),
        )
        .orderBy("lang")
    )


ORACLE["quality_classifier_scores"] = f"""
    WITH ds AS ({_DOC_SCORES_SQL})
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN total_milli > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass,
           ROUND(CAST(SUM(CASE WHEN total_milli > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS pass_rate,
           ROUND(CAST(SUM(CAST(ROUND(CAST(total_milli AS DOUBLE)
                                     / CAST(n_tok AS DOUBLE), 9)
                          AS DECIMAL(28,9))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_score_milli
    FROM ds GROUP BY lang ORDER BY lang
"""

QUERIES["quality_classifier_scores"] = quality_classifier_scores


def quality_classifier_gate_ledger(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based filtering ledger per source: documents and token
    mass kept vs removed at the zero-score gate — the accounting a
    curation team signs off before a classifier gate ships (the
    model-scored twin of the heuristic dq_gate_ledger).  Exact integer
    masses; one final division for the kept fraction."""
    ds = _doc_scores(spark, sf)
    kept = (F.col("total_milli") > 0).cast("bigint")
    return (
        ds.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.sum("n_tok").alias("tokens_total"),
            F.sum(F.col("n_tok") * kept).alias("tokens_kept"),
            F.round(
                F.sum(F.col("n_tok") * kept).cast("double")
                / F.sum("n_tok").cast("double"),
                6,
            ).alias("kept_token_frac"),
        )
        .orderBy("source")
    )


ORACLE["quality_classifier_gate_ledger"] = f"""
    WITH ds AS ({_DOC_SCORES_SQL})
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN total_milli > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN total_milli > 0 THEN n_tok ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           ROUND(CAST(SUM(CASE WHEN total_milli > 0 THEN n_tok ELSE 0 END)
                      AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE), 6)
               AS kept_token_frac
    FROM ds GROUP BY source ORDER BY source
"""

QUERIES["quality_classifier_gate_ledger"] = quality_classifier_gate_ledger


def quality_classifier_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Score-band calibration against a cheap weak label (document
    length > 300 chars): per score band, how often the weak label
    agrees — the sanity curve read before trusting a filter model
    (monotone long-doc fraction across bands = the score orders
    quality; flat = the model learned noise).  Band edges are +-100
    milli on the PER-TOKEN mean, tested as exact integer
    cross-multiplications (total vs +-100 * n_tok) — no float
    thresholds."""
    ds = _doc_scores(spark, sf)
    t, n = F.col("total_milli"), F.col("n_tok")
    band = (
        F.when(t < -100 * n, "b0_strong_neg")
        .when(t < 0, "b1_weak_neg")
        .when(t < 100 * n, "b2_weak_pos")
        .otherwise("b3_strong_pos")
    )
    return (
        ds.select(
            band.alias("score_band"),
            (F.col("n_chars") > 300).cast("bigint").alias("is_long"),
        )
        .groupBy("score_band")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("is_long").alias("n_long"),
            F.round(
                F.sum("is_long").cast("double") / F.count("*").cast("double"),
                6,
            ).alias("long_frac"),
        )
        .orderBy("score_band")
    )


ORACLE["quality_classifier_calibration"] = f"""
    WITH ds AS ({_DOC_SCORES_SQL})
    SELECT CASE WHEN total_milli < -100 * n_tok THEN 'b0_strong_neg'
                WHEN total_milli < 0 THEN 'b1_weak_neg'
                WHEN total_milli < 100 * n_tok THEN 'b2_weak_pos'
                ELSE 'b3_strong_pos' END AS score_band,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_long,
           ROUND(CAST(SUM(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS long_frac
    FROM ds GROUP BY 1 ORDER BY score_band
"""

QUERIES["quality_classifier_calibration"] = quality_classifier_calibration


def hashed_feature_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Hashing-trick collision audit: per feature bucket, the distinct
    vocabulary colliding into it, its token mass, and its net signed
    contribution to corpus score — the table that decides whether
    QC_BUCKETS is big enough (heavy multi-token buckets with large
    |weight| are where hash collisions actually distort scores).
    Bounded output (QC_BUCKETS rows); one aggregate keyed on the
    bucket id."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    warr = F.array(*[F.lit(w) for w in QC_WEIGHTS_MILLI])
    toks = docs.select(F.explode(_tokens()).alias("tok")).select(
        "tok",
        (_h64_spark(F.col("tok")) % QC_BUCKETS).cast("int").alias("bucket"),
    )
    return (
        toks.groupBy("bucket")
        .agg(
            F.count_distinct("tok").alias("n_distinct_tokens"),
            F.count("*").alias("token_mass"),
        )
        .select(
            "bucket",
            F.element_at(warr, F.col("bucket") + 1).alias("weight_milli"),
            "n_distinct_tokens",
            "token_mass",
            (
                F.element_at(warr, F.col("bucket") + 1) * F.col("token_mass")
            ).alias("contribution_milli"),
        )
        .orderBy("bucket")
    )


ORACLE["hashed_feature_buckets"] = f"""
    WITH toks AS (
        SELECT tok,
               CAST({H64_SQL.format(expr="tok")} % {QC_BUCKETS} AS INT)
                   AS bucket
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    agg AS (
        SELECT bucket, COUNT(DISTINCT tok) AS n_distinct_tokens,
               COUNT(*) AS token_mass
        FROM toks GROUP BY bucket
    )
    SELECT bucket, {_QCW_SQL}[bucket + 1] AS weight_milli,
           CAST(n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
           token_mass,
           CAST({_QCW_SQL}[bucket + 1] * token_mass AS BIGINT)
               AS contribution_milli
    FROM agg ORDER BY bucket
"""

QUERIES["hashed_feature_buckets"] = hashed_feature_buckets


def quality_classifier_lang_bias(spark: SparkSession, sf: str) -> DataFrame:
    """Disparate-impact audit of the classifier gate: per language,
    its pass rate against the corpus pass rate and the bias ratio
    (the four-fifths-rule number — a filter model trained on the
    dominant language silently strips minority languages, and this is
    the table that catches it before the gate ships; the model-scored
    twin of bpe_fertility_by_lang's tokenizer-fairness audit).

    The bias ratio is computed from exact integer cross-products
    (n_pass * corpus_docs) / (n_docs * corpus_pass) with ONE final
    double division; the corpus totals join back as a broadcast
    singleton."""
    ds = _doc_scores(spark, sf)
    flagged = ds.select(
        "lang", (F.col("total_milli") > 0).cast("bigint").alias("p")
    )
    corpus = flagged.agg(
        F.count("*").alias("c_docs"), F.sum("p").alias("c_pass")
    )
    return (
        flagged.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("p").alias("n_pass"))
        .crossJoin(F.broadcast(corpus))
        .select(
            "lang",
            "n_docs",
            "n_pass",
            F.round(
                F.col("n_pass").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("pass_rate"),
            F.round(
                F.col("c_pass").cast("double") / F.col("c_docs").cast("double"),
                6,
            ).alias("corpus_pass_rate"),
            F.round(
                (F.col("n_pass") * F.col("c_docs")).cast("double")
                / (F.col("n_docs") * F.col("c_pass")).cast("double"),
                6,
            ).alias("bias_ratio"),
        )
        .orderBy("lang")
    )


ORACLE["quality_classifier_lang_bias"] = f"""
    WITH ds AS ({_DOC_SCORES_SQL}),
    flagged AS (
        SELECT lang, CASE WHEN total_milli > 0 THEN 1 ELSE 0 END AS p
        FROM ds
    ),
    corpus AS (
        SELECT COUNT(*) AS c_docs, CAST(SUM(p) AS BIGINT) AS c_pass
        FROM flagged
    ),
    per_lang AS (
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(p) AS BIGINT) AS n_pass
        FROM flagged GROUP BY lang
    )
    SELECT lang, n_docs, n_pass,
           ROUND(CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
               AS pass_rate,
           ROUND(CAST(c_pass AS DOUBLE) / CAST(c_docs AS DOUBLE), 6)
               AS corpus_pass_rate,
           ROUND(CAST(n_pass * c_docs AS DOUBLE)
                 / CAST(n_docs * c_pass AS DOUBLE), 6) AS bias_ratio
    FROM per_lang CROSS JOIN corpus
    ORDER BY lang
"""

QUERIES["quality_classifier_lang_bias"] = quality_classifier_lang_bias


QC_ROC_THRESHOLDS_MILLI = (-200, -100, 0, 100, 200)


def quality_classifier_roc_points(spark: SparkSession, sf: str) -> DataFrame:
    """ROC operating points for the classifier gate against the weak
    label (document length > 300 chars): at each candidate threshold
    (per-token mean score in milli-units), the exact confusion counts
    and TPR / FPR / precision — the table that picks the shipping
    threshold (quality_classifier_calibration shows monotonicity; this
    prices each cut).

    Threshold comparisons are integer cross-multiplications
    (total_milli >= tau * n_tok) — no float thresholds.  ONE corpus
    scan: each scored document explodes into #thresholds tagged rows
    (a bounded literal array, not a second pass over the data) feeding
    one (#thresholds)-keyed aggregate — a per-threshold union would
    re-scan and re-score the corpus once per operating point."""
    ds = _doc_scores(spark, sf)
    t, n = F.col("total_milli"), F.col("n_tok")
    is_long = (F.col("n_chars") > 300).cast("bigint")
    tagged = ds.select(
        t.alias("total_milli"),
        n.alias("n_tok"),
        is_long.alias("label"),
        F.explode(
            F.array(*[F.lit(tau) for tau in QC_ROC_THRESHOLDS_MILLI])
        ).alias("threshold_milli"),
    )
    pred = (
        F.col("total_milli")
        >= F.col("threshold_milli") * F.col("n_tok")
    ).cast("bigint")
    out = (
        tagged.select("threshold_milli", pred.alias("pred"), "label")
        .groupBy("threshold_milli")
        .agg(
            F.sum(F.col("pred") * F.col("label")).alias("tp"),
            F.sum(F.col("pred") * (1 - F.col("label"))).alias("fp"),
            F.sum((1 - F.col("pred")) * F.col("label")).alias("fn"),
            F.sum((1 - F.col("pred")) * (1 - F.col("label"))).alias("tn"),
        )
    )
    return out.select(
        "threshold_milli",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            F.col("tp").cast("double")
            / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)).cast("double"),
            6,
        ).alias("tpr"),
        F.round(
            F.col("fp").cast("double")
            / F.nullif(F.col("fp") + F.col("tn"), F.lit(0)).cast("double"),
            6,
        ).alias("fpr"),
        F.round(
            F.col("tp").cast("double")
            / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)).cast("double"),
            6,
        ).alias("precision"),
    ).orderBy("threshold_milli")


ORACLE["quality_classifier_roc_points"] = (
    f"WITH ds AS ({_DOC_SCORES_SQL}),\n"
    + "pts AS (\n"
    + "\nUNION ALL\n".join(
        f"""        SELECT {tau} AS threshold_milli,
               CAST(SUM(CASE WHEN total_milli >= {tau} * n_tok
                              AND n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT)
                   AS tp,
               CAST(SUM(CASE WHEN total_milli >= {tau} * n_tok
                              AND n_chars <= 300 THEN 1 ELSE 0 END) AS BIGINT)
                   AS fp,
               CAST(SUM(CASE WHEN total_milli < {tau} * n_tok
                              AND n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT)
                   AS fn,
               CAST(SUM(CASE WHEN total_milli < {tau} * n_tok
                              AND n_chars <= 300 THEN 1 ELSE 0 END) AS BIGINT)
                   AS tn
        FROM ds"""
        for tau in QC_ROC_THRESHOLDS_MILLI
    )
    + """
    )
    SELECT threshold_milli, tp, fp, fn, tn,
           ROUND(CAST(tp AS DOUBLE)
                 / CAST(NULLIF(tp + fn, 0) AS DOUBLE), 6) AS tpr,
           ROUND(CAST(fp AS DOUBLE)
                 / CAST(NULLIF(fp + tn, 0) AS DOUBLE), 6) AS fpr,
           ROUND(CAST(tp AS DOUBLE)
                 / CAST(NULLIF(tp + fp, 0) AS DOUBLE), 6) AS precision
    FROM pts ORDER BY threshold_milli
"""
)

QUERIES["quality_classifier_roc_points"] = quality_classifier_roc_points


def quality_gate_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-gate agreement between the classifier (integer score > 0)
    and an independent Gopher-class heuristic gate (>= 20 tokens AND
    mean word length in [3, 10] — both tested as exact integer
    cross-multiplications): the 2x2 confusion, observed agreement,
    chance agreement, and Cohen's kappa.  Two gates that agree only at
    chance level (kappa ~ 0) are measuring different things, and a
    curation team should not treat one as a cheap proxy for the other
    — this is the one-row table that settles it.

    One map-only tag per document into a constant-size aggregate; all
    rates derive from the four exact cell counts."""
    ds = _doc_scores(spark, sf)
    t, n, c = F.col("total_milli"), F.col("n_tok"), F.col("n_chars")
    clf = t > 0
    # mean word length = (n_chars - (n_tok - 1) spaces) / n_tok
    letters = c - (n - 1)
    heur = (n >= 20) & (letters >= 3 * n) & (letters <= 10 * n)
    cells = ds.agg(
        F.sum((clf & heur).cast("bigint")).alias("both_pass"),
        F.sum((clf & ~heur).cast("bigint")).alias("clf_only"),
        F.sum((~clf & heur).cast("bigint")).alias("heur_only"),
        F.sum((~clf & ~heur).cast("bigint")).alias("both_fail"),
    )
    a, b_, c_, d = (
        F.col("both_pass"),
        F.col("clf_only"),
        F.col("heur_only"),
        F.col("both_fail"),
    )
    nn = (a + b_ + c_ + d).cast("double")
    po = (a + d).cast("double") / nn
    pe = (
        ((a + b_) * (a + c_) + (c_ + d) * (b_ + d)).cast("double") / (nn * nn)
    )
    return cells.select(
        "both_pass",
        "clf_only",
        "heur_only",
        "both_fail",
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("chance_agreement"),
        F.round((po - pe) / (1 - pe), 6).alias("cohens_kappa"),
    )


ORACLE["quality_gate_agreement"] = f"""
    WITH ds AS ({_DOC_SCORES_SQL}),
    cells AS (
        SELECT
            CAST(SUM(CASE WHEN total_milli > 0 AND n_tok >= 20
                           AND n_chars - (n_tok - 1) >= 3 * n_tok
                           AND n_chars - (n_tok - 1) <= 10 * n_tok
                          THEN 1 ELSE 0 END) AS BIGINT) AS both_pass,
            CAST(SUM(CASE WHEN total_milli > 0 AND NOT (n_tok >= 20
                           AND n_chars - (n_tok - 1) >= 3 * n_tok
                           AND n_chars - (n_tok - 1) <= 10 * n_tok)
                          THEN 1 ELSE 0 END) AS BIGINT) AS clf_only,
            CAST(SUM(CASE WHEN total_milli <= 0 AND n_tok >= 20
                           AND n_chars - (n_tok - 1) >= 3 * n_tok
                           AND n_chars - (n_tok - 1) <= 10 * n_tok
                          THEN 1 ELSE 0 END) AS BIGINT) AS heur_only,
            CAST(SUM(CASE WHEN total_milli <= 0 AND NOT (n_tok >= 20
                           AND n_chars - (n_tok - 1) >= 3 * n_tok
                           AND n_chars - (n_tok - 1) <= 10 * n_tok)
                          THEN 1 ELSE 0 END) AS BIGINT) AS both_fail
        FROM ds
    )
    SELECT both_pass, clf_only, heur_only, both_fail,
           ROUND(CAST(both_pass + both_fail AS DOUBLE)
                 / CAST(both_pass + clf_only + heur_only + both_fail
                        AS DOUBLE), 6) AS observed_agreement,
           ROUND(CAST((both_pass + clf_only) * (both_pass + heur_only)
                      + (heur_only + both_fail) * (clf_only + both_fail)
                      AS DOUBLE)
                 / (CAST(both_pass + clf_only + heur_only + both_fail
                         AS DOUBLE)
                    * CAST(both_pass + clf_only + heur_only + both_fail
                           AS DOUBLE)), 6) AS chance_agreement,
           ROUND((CAST(both_pass + both_fail AS DOUBLE)
                  / CAST(both_pass + clf_only + heur_only + both_fail
                         AS DOUBLE)
                  - CAST((both_pass + clf_only) * (both_pass + heur_only)
                         + (heur_only + both_fail) * (clf_only + both_fail)
                         AS DOUBLE)
                    / (CAST(both_pass + clf_only + heur_only + both_fail
                            AS DOUBLE)
                       * CAST(both_pass + clf_only + heur_only + both_fail
                              AS DOUBLE)))
                 / (1 - CAST((both_pass + clf_only) * (both_pass + heur_only)
                             + (heur_only + both_fail)
                               * (clf_only + both_fail)
                             AS DOUBLE)
                        / (CAST(both_pass + clf_only + heur_only + both_fail
                                AS DOUBLE)
                           * CAST(both_pass + clf_only + heur_only
                                  + both_fail AS DOUBLE))), 6)
               AS cohens_kappa
    FROM cells
"""

QUERIES["quality_gate_agreement"] = quality_gate_agreement


# ---------------------------------------------------------------------------
# Round 10: the classifier as a ROW-LOCAL gate expression, shared
# verbatim by the streaming curation funnel (streaming/jobs.py) and
# its batch twin below — the batch/stream parity pattern of the
# cleaners.  The fold form is algebraically identical to the
# explode + groupBy form in ``_doc_scores`` (a sum over the same
# token-occurrence multiset) but needs no shuffle, so it runs in the
# funnel's map-only gate stage ahead of any signature work.


def classifier_total_milli(text_col) -> "F.Column":
    """Exact integer milli-weight classifier total of ``text_col`` as
    ONE fold expression: transform tokens -> hashed-bucket literal
    weights, left-fold sum.  The literal weight array inside the
    lambda is the ``_signature`` precedent (similarity.py): constant
    arrays in HOF lambdas are constant-folded, not per-row work."""
    warr = F.array(*[F.lit(w) for w in QC_WEIGHTS_MILLI])
    weights = F.transform(
        F.split(text_col, " "),
        lambda t: F.element_at(
            warr, (_h64_spark(t) % QC_BUCKETS).cast("int") + 1
        ),
    )
    return F.aggregate(
        weights, F.lit(0).cast("long"), lambda a, v: a + v
    )


def _clf_total_sql(text_expr: str) -> str:
    """DuckDB twin of ``classifier_total_milli`` over ``text_expr``."""
    h = H64_SQL.format(expr="t")
    return (
        f"CAST(list_sum(list_transform(string_split({text_expr}, ' '), "
        f"t -> {_QCW_SQL}[CAST({h} % {QC_BUCKETS} AS INT) + 1])) AS BIGINT)"
    )


def classifier_gate_stream_ledger(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the classifier-gated streaming curation funnel's
    GATE stage (streaming/jobs.py::run_streaming_curation): per
    micro-batch (doc_id % NEARDUP_LEDGER_BATCHES, the
    curation_funnel_batch_ledger arrival-order convention), how many
    raw docs arrive, fail the heuristic gate, pass it but fail the
    classifier (score <= 0 on the NORMALIZED text — the stream gates
    after normalization), and clear both gates.  The classifier
    expression here is the same ``classifier_total_milli`` fold the
    stream runs, so this table is the external correctness contract
    for the streaming gate."""
    from pinterest_data_pipeline6_spark.operators.curation import (
        _quality_flags,
    )
    from pinterest_data_pipeline6_spark.operators.dedup import (
        NEARDUP_LEDGER_BATCHES,
    )

    docs = widen_small_scan(table(spark, sf, "documents"))
    q = _quality_flags(docs).select(
        F.pmod("doc_id", F.lit(NEARDUP_LEDGER_BATCHES)).alias("batch_id"),
        F.coalesce("passed_quality", F.lit(False)).alias("heur_ok"),
        (
            F.coalesce(
                classifier_total_milli(F.col("norm")), F.lit(0)
            )
            > 0
        ).alias("clf_ok"),
    )
    return (
        q.groupBy("batch_id")
        .agg(
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
            F.round(
                F.sum((F.col("heur_ok") & F.col("clf_ok")).cast("long"))
                .cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("gate_pass_rate"),
        )
        .orderBy("batch_id")
    )


def _clf_gate_ledger_sql() -> str:
    from pinterest_data_pipeline6_spark.operators.curation import (
        MIN_DISTINCT_RATIO,
        MIN_TOKENS,
    )
    from pinterest_data_pipeline6_spark.operators.dedup import (
        NEARDUP_LEDGER_BATCHES,
    )

    heur = (
        f"(len(string_split(lower(trim(text)), ' ')) >= {MIN_TOKENS} "
        "AND CAST(len(list_distinct(string_split(lower(trim(text)), ' ')))"
        " AS DOUBLE) / len(string_split(lower(trim(text)), ' '))"
        f" >= {MIN_DISTINCT_RATIO})"
    )
    clf = _clf_total_sql("lower(trim(text))")
    return f"""
    WITH flags AS (
        SELECT doc_id % {NEARDUP_LEDGER_BATCHES} AS batch_id,
               COALESCE({heur}, FALSE) AS heur_ok,
               COALESCE({clf}, 0) > 0 AS clf_ok
        FROM documents
    )
    SELECT batch_id,
           COUNT(*) AS n_raw,
           CAST(SUM(CASE WHEN NOT heur_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_heuristic,
           CAST(SUM(CASE WHEN heur_ok AND NOT clf_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS n_fail_classifier,
           CAST(SUM(CASE WHEN heur_ok AND clf_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gate_pass,
           ROUND(CAST(SUM(CASE WHEN heur_ok AND clf_ok THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS gate_pass_rate
    FROM flags GROUP BY batch_id ORDER BY batch_id
"""


ORACLE["classifier_gate_stream_ledger"] = _clf_gate_ledger_sql()
QUERIES["classifier_gate_stream_ledger"] = classifier_gate_stream_ledger
