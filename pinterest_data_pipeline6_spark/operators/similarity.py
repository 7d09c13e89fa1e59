"""Similarity search over the ``embeddings`` table (array<float>):
brute-force cosine top-k as the correctness baseline, and a
random-hyperplane LSH bucketed variant as the 100 TB scale path.

Spark-first design:
- the query set is tiny and the corpus is huge → the query side is
  broadcast, so the top-k scan is ONE pass over the corpus with no
  shuffle of the embedding column;
- per-query top-k uses a row_number window over (query, cosine) — at
  scale this is a partial top-k per partition via AQE, never a global
  sort of the corpus;
- the LSH variant assigns every vector a deterministic b-bit signature
  (sign of dot(v, h_i) for pseudo-random hyperplanes h_i derived from
  the portable md5 hash); search compares only bucket-mates — the same
  sub-O(n²) shape as dedup.minhash_band_pairs.

All arithmetic is double-precision left-fold (bit-identical to the
DuckDB oracle); hyperplane components are integers in [-1000, 1000]
derived from the portable hash, so both engines build the exact same
hyperplanes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pinterest_data_pipeline6_spark.operators.dedup import _dot64, _norm64
from pinterest_data_pipeline6_spark.operators.textops import H64_SQL, _h64_spark
from pinterest_data_pipeline6_spark.sources.readers import table, widen_small_scan

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10
LSH_BITS = 8
DIM = 64


def knn_brute_force(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-10 for each query vector (vec_id < 5), self
    excluded. Broadcast the 5 queries; one corpus scan, one small
    window."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).withColumn(
        "nrm", _norm64(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    # per-side norms computed once per row; the per-pair expression is
    # one unrolled dot + a multiply (bit-identical to the oracle's fold)
    cos = F.round(
        _dot64(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def _hp_component(i: int, j: int) -> float:
    """Hyperplane i, component j: h64('hp|i|j') % 2001 - 1000 — an
    integer in [-1000, 1000], exactly representable in double. Computed
    ONCE driver-side with hashlib (bit-identical to Spark's md5/conv
    and DuckDB's md5/hex-cast) and embedded as literals: the per-row
    plan does 64 multiply-adds per bit instead of 64 md5 calls."""
    import hashlib

    h = int(hashlib.md5(f"hp|{i}|{j}".encode()).hexdigest()[:15], 16)
    return float(h % 2001 - 1000)


_HYPERPLANES: list[list[float]] = [
    [_hp_component(i, j) for j in range(1, DIM + 1)] for i in range(LSH_BITS)
]


def _signature(v: str = "embedding") -> Column:
    """b-bit sign signature of column ``v`` against the LSH_BITS
    hyperplanes.

    zip_with + left-fold aggregate over the literal hyperplane arrays:
    the fold's term order equals the oracle's explicit left-assoc sum
    (0.0 + p1 ≡ p1). An unrolled 512-term expression tree was measured
    ~4x SLOWER end-to-end here — codegen compilation of the giant tree
    dominates — so the compact lambda form wins at both ends.

    Emitted as ONE ``F.expr`` string (r11): the Column-object form
    built 512 literal Columns + 8 lambda callbacks per construction —
    ~0.4 s of py4j round-trips per bench rep (the perceptual-hash
    construction-tax finding, OPTIMIZATION_r10.md §1). The parsed
    expression tree is identical, so values are unchanged (pinned by
    lsh_bucket_histogram's oracle row and the same-session A/B:
    knn_lsh_bucketed 1.18 → 0.51 s, embedding_neardup_lsh 1.29 →
    0.61 s, identical results)."""
    terms = []
    for i in range(LSH_BITS):
        arr = "array(" + ", ".join(f"{c!r}D" for c in _HYPERPLANES[i]) + ")"
        dot = (
            f"aggregate(zip_with({v}, {arr}, "
            f"(x, h) -> CAST(x AS DOUBLE) * h), 0.0D, (acc, p) -> acc + p)"
        )
        terms.append(f"IF({dot} > 0, {2 ** i}, 0)")
    return F.expr("CAST(" + " + ".join(terms) + " AS INT)")


def lsh_bucket_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Bucket occupancy of the 8-bit hyperplane signature — the data
    layout the bucketed search runs on (and a direct check that both
    engines derive identical signatures for every vector)."""
    emb = widen_small_scan(table(spark, sf, "embeddings"))
    return (
        emb.select(_signature("embedding").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("bucket")
    )


def knn_lsh_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate top-10: candidates limited to the query's signature
    bucket (single-probe). Recall < 1 by construction; at 100 TB the
    bucket join replaces the full-corpus scan — candidates are
    co-partitioned by signature, embeddings never shuffle globally."""
    emb = widen_small_scan(table(spark, sf, "embeddings"))
    signed = emb.select(
        "vec_id",
        "embedding",
        _signature("embedding").alias("bucket"),
        _norm64(F.col("embedding")).alias("nrm"),
    )
    q = signed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.col("nrm").alias("qnrm"),
    )
    cos = F.round(
        _dot64(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    scored = (
        F.broadcast(q)
        .join(
            signed,
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


N_CELLS = 8


def _cell_assignment(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-lite cell assignment: the first N_CELLS vectors (vec_id <
    N_CELLS) are the fixed cell centroids (deterministic — a production
    build would k-means them offline); every vector joins its
    max-cosine centroid, ties to the lower cell id. The centroid side
    broadcasts; assignment is one corpus scan."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).withColumn(
        "nrm", _norm64(F.col("embedding"))
    )
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    cos = _dot64(F.col("cv"), F.col("embedding")) / (F.col("cnrm") * F.col("nrm"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell"))
    return (
        F.broadcast(cents)
        .join(emb, how="cross")
        .select("vec_id", "embedding", "nrm", "cell", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "nrm", F.col("cell").cast("int").alias("cell"))
    )


def ivf_cell_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Cell occupancy of the IVF-lite assignment (cross-engine check
    that both engines derive identical partitions)."""
    return (
        _cell_assignment(spark, sf)
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cell")
    )


def knn_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF single-probe top-10: each query searches only its own cell's
    inverted list. At scale the corpus is stored partitioned by cell,
    so a probe reads one partition — the IVF counterpart of the LSH
    bucket join above."""
    assigned = _cell_assignment(spark, sf)
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("cell").alias("qcell"),
        F.col("nrm").alias("qnrm"),
    )
    cos = F.round(
        _dot64(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    scored = (
        F.broadcast(q)
        .join(
            assigned,
            (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def embedding_neardup_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs blocked by LSH signature (the scale
    path that replaces dedup.embedding_cosine_stats' label blocking):
    only bucket-mates are compared; emits per-bucket pair stats."""
    emb = widen_small_scan(table(spark, sf, "embeddings"))
    signed = emb.select(
        "vec_id",
        "embedding",
        _signature("embedding").alias("bucket"),
        _norm64(F.col("embedding")).alias("nrm"),
    )
    a, b = signed.alias("a"), signed.alias("b")
    cos = _dot64(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.bucket").alias("bucket"), cos.alias("cos"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.max("cos"), 4).alias("max_cos"),
        )
        .orderBy("bucket")
    )


def ann_recall_eval(spark: SparkSession, sf: str) -> DataFrame:
    """ANN quality gate: recall@10 of the LSH-bucketed and IVF
    single-probe searches against the brute-force ground truth, per
    query — the evaluation every ANN deployment runs before swapping
    the exact scan out. Emits hit counts and recall ratios so a recall
    regression (e.g. after re-training centroids or changing LSH bits)
    fails loudly.

    Scale shape: the expensive work is the three underlying searches,
    each already scale-shaped (broadcast queries; bucket/cell-blocked
    candidate joins). The evaluation itself joins top-k RESULT sets —
    n_queries x k rows — so its cost is negligible and independent of
    corpus size."""
    truth = knn_brute_force(spark, sf).select("query_id", "vec_id")
    lsh = knn_lsh_bucketed(spark, sf).select(
        "query_id", "vec_id", F.lit(1).alias("lsh_hit")
    )
    ivf = knn_ivf(spark, sf).select("query_id", "vec_id", F.lit(1).alias("ivf_hit"))
    return (
        truth.join(lsh, ["query_id", "vec_id"], "left")
        .join(ivf, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_truth"),
            F.sum(F.coalesce(F.col("lsh_hit"), F.lit(0))).cast("bigint").alias("lsh_hits"),
            F.sum(F.coalesce(F.col("ivf_hit"), F.lit(0))).cast("bigint").alias("ivf_hits"),
        )
        .select(
            "query_id",
            "n_truth",
            "lsh_hits",
            "ivf_hits",
            F.round(F.col("lsh_hits") / F.col("n_truth"), 4).alias("lsh_recall"),
            F.round(F.col("ivf_hits") / F.col("n_truth"), 4).alias("ivf_recall"),
        )
        .orderBy("query_id")
    )


PAA_HOURS = 24  # piecewise-aggregate buckets (hour-of-day)
PAA_QUERIES = 5  # user_id < 5 are the query users
PAA_TOP_K = 5


def activity_profile_knn(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series similarity search over BEHAVIOR: each user's event
    stream is reduced to a 24-dim hour-of-day activity profile (the
    piecewise-aggregate-approximation idea — fixed-width sketches make
    series comparable and cheap), then the query users' top-5 most
    similar users are found by cosine over the profiles. The pattern
    behind look-alike audiences and anomalous-account detection.

    Scale shape: the sketch step is ONE user-keyed aggregate that
    collapses an unbounded event stream to 24 numbers per user — after
    it, similarity search costs are corpus-sized, not event-sized; the
    query profiles broadcast, and per-pair cost is one 24-term fold.
    Sums ride DECIMAL(18,6) so profiles are exact and identical across
    engines; the cosine fold matches the oracle's list_reduce order."""
    from pinterest_data_pipeline6_spark.operators.dedup import _dot64, _norm64

    ev = table(spark, sf, "events")
    # 24 conditional decimal sums + the 24-cast array, emitted as expr
    # text (construction-tax remedy: one parser call per expression
    # instead of ~8 py4j Column builds; A/B 1.69 → 1.32 s, identical)
    prof = ev.groupBy("user_id").agg(
        *[
            F.expr(
                f"sum(IF(hour(ts) = {h}, CAST(value AS DECIMAL(18,6)),"
                f" CAST(0 AS DECIMAL(18,6)))) AS h_{h}"
            )
            for h in range(PAA_HOURS)
        ]
    )
    arr = "array(" + ", ".join(
        f"CAST(h_{h} AS DOUBLE)" for h in range(PAA_HOURS)
    ) + ")"
    signed = (
        prof.selectExpr("user_id", f"{arr} AS profile")
        .withColumn("nrm", _norm64(F.col("profile")))
        # a zero-norm profile (user with no measurable activity — e.g.
        # all-null values upstream) has no cosine direction; keeping it
        # would divide by zero, which ANSI mode raises. No-op on any
        # corpus with real activity; the oracle carries the same guard.
        .filter(F.col("nrm") > 0)
    )
    q = signed.filter(F.col("user_id") < PAA_QUERIES).select(
        F.col("user_id").alias("query_id"),
        F.col("profile").alias("qp"),
        F.col("nrm").alias("qnrm"),
    )
    cos = F.round(
        _dot64(F.col("qp"), F.col("profile")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    scored = (
        F.broadcast(q)
        .join(signed, F.col("user_id") != F.col("query_id"))
        .select("query_id", "user_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("user_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PAA_TOP_K)
        .select("query_id", "user_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def _cos_sql(a: str, b: str) -> str:
    def _dot(x: str, y: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, {DIM}), "
            f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)), (p, q) -> p + q)"
        )

    return f"({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))"


# signature oracle: hyperplane components embedded as literals (same
# values as _HYPERPLANES); the dot product is an explicit left-assoc
# sum, matching the Spark-side left fold term for term
_SIG_TERMS = []
for _i in range(LSH_BITS):
    _dot_i = " + ".join(
        f"CAST(embedding[{_j + 1}] AS DOUBLE) * ({_HYPERPLANES[_i][_j]!r})"
        for _j in range(DIM)
    )
    _SIG_TERMS.append(f"CASE WHEN ({_dot_i}) > 0 THEN {2**_i} ELSE 0 END")
_SIG_SQL = "CAST(" + " + ".join(_SIG_TERMS) + " AS INT)"

_KNN_BRUTE_SQL = f"""
    SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) DESC,
                            c.vec_id ASC) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE rank <= {TOP_K}
"""

_KNN_LSH_SQL = f"""
    WITH signed AS (
        SELECT vec_id, embedding, {_SIG_SQL} AS bucket FROM embeddings
    )
    SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) DESC,
                            c.vec_id ASC) AS rank
        FROM signed q JOIN signed c
          ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE rank <= {TOP_K}
"""

_ASSIGN_SQL = f"""
    SELECT vec_id, embedding, CAST(cell AS INT) AS cell
    FROM (
        SELECT e.vec_id, e.embedding, c.vec_id AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cos_sql("c.embedding", "e.embedding")} DESC,
                            c.vec_id ASC) AS rn
        FROM embeddings e CROSS JOIN
             (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_CELLS}) c
    ) WHERE rn = 1
"""

_KNN_IVF_SQL = f"""
    WITH assigned AS ({_ASSIGN_SQL})
    SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) DESC,
                            c.vec_id ASC) AS rank
        FROM assigned q JOIN assigned c
          ON c.cell = q.cell AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE rank <= {TOP_K}
"""

def pandas_udf_norms(spark: SparkSession, sf: str) -> DataFrame:
    """Vectorized scalar Pandas UDF (the §2.10 UDF surface, done the
    fast way): per-row L2 norm of the embedding computed in numpy over
    Arrow batches — the pattern for any Python-only per-vector math
    (a real encoder head, a learned scorer) that built-ins can't
    express. ~10-100x over a row-at-a-time Python UDF: one
    serialization per Arrow batch, not per row; numpy does the inner
    loop. The surrounding plan (scan → UDF projection → hash agg) keeps
    Catalyst pruning/pushdown intact. Values are independently
    SQL-expressible, so this entry still oracle-checks."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        # one 2-D reduction per Arrow batch — no per-row Python loop
        # (fixed-dim embeddings stack into a dense matrix; np.stack
        # raises on ragged input, which would mean corrupt data)
        if len(vecs) == 0:
            return pd.Series([], dtype="float64")
        mat = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", mat, mat)), index=vecs.index)

    emb = widen_small_scan(table(spark, sf, "embeddings"))
    return (
        emb.select("label", l2_norm("embedding").alias("norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


def grouped_zscore_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas (the UDAF-shaped §2.10 surface): each
    label group arrives as ONE pandas DataFrame; the function z-scores
    the group's vector norms locally and counts |z| > 2 outliers. The
    group is the unit of distribution — Spark shuffles on the key, each
    group must fit one executor's memory (true for per-label stats;
    for giant groups you'd pre-aggregate or salt). Same math is
    window-expressible, so the oracle checks it exactly."""
    norm_expr = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    )
    emb = widen_small_scan(table(spark, sf, "embeddings")).select(
        "label", norm_expr.alias("norm")
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["norm"].mean()
        sd = pdf["norm"].std(ddof=1)
        z = (pdf["norm"] - mu) / sd
        # a NULL group key arrives as NaN (pandas promotes int+null to
        # float) — int(NaN) raises, so pass the null through instead
        lab = pdf["label"].iloc[0]
        return pd.DataFrame(
            {
                "label": [int(lab) if pd.notna(lab) else None],
                "n_vecs": [len(pdf)],
                "n_outliers": [int((z.abs() > 2).sum())],
                "sd_norm": [round(float(sd), 4)],
            }
        )

    return (
        emb.groupBy("label")
        .applyInPandas(zscore, "label int, n_vecs long, n_outliers long, sd_norm double")
        .orderBy("label")
    )


def pandas_udaf_weighted_price(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPED_AGG Pandas UDF — a true vectorized UDAF (the third leg
    of the §2.10 UDF surface next to the scalar Pandas UDF and
    applyInPandas): quantity-weighted mean price per return flag.
    Each group's columns arrive as whole pandas Series over Arrow;
    the aggregate returns one scalar per group.

    Determinism across engines: sums run over int64 cents (exact,
    order-independent), so the emitted ratio is bit-stable no matter
    how partitions interleave. At scale a GROUPED_AGG UDF cannot
    partial-aggregate (whole group must reach one task — unlike
    built-in aggs); keep groups bounded or pre-reduce with a
    Catalyst agg when cardinality allows."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg_cents(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        q = qty.round().astype("int64")
        return float((cents * q).sum() / (100.0 * q.sum()))

    # Catalyst refuses to mix GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg list — the row count is a pandas UDAF too
    @pandas_udf("long")
    def n_rows(qty: pd.Series) -> int:
        return len(qty)

    li = table(spark, sf, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            n_rows("l_quantity").alias("n"),
            F.round(wavg_cents("l_extendedprice", "l_quantity"), 4).alias("wavg_price"),
        )
        .orderBy("flag")
    )


# Cogroup bucket width: ~256 orders (~1 000 lines) per pandas cogroup —
# large enough to amortize the per-group Python/Arrow round-trip,
# small enough that a group is always a trivial fit in memory.
RECON_BUCKET = 256


def cogroup_order_reconciliation(spark: SparkSession, sf: str) -> DataFrame:
    """Cogrouped applyInPandas — the remaining leg of the §2.10 Python
    UDF surface (scalar Pandas UDF, GROUPED_AGG UDAF, grouped-map,
    UDTF, mapInArrow are covered elsewhere): order headers and their
    line items arrive as TWO pandas frames per cogroup, and the
    function reconciles each header total against the sum of its
    discounted line nets — the ledger-vs-detail audit every billing
    pipeline runs.

    The cogroup key is a FIXED-SIZE key bucket (``o_orderkey DIV 256``), not the raw order key: per-group Python/Arrow
    invocation overhead dominates when every group is one ~4-line
    order (measured 50 s for ~150 k single-order groups at sf0.1 vs
    <1 s bucketed), and a bucket of 256 adjacent keys keeps
    group SIZE constant while group COUNT grows with the data — the
    group-fits-in-memory contract holds at any corpus size. Inside a
    bucket the reconcile is fully vectorized (numpy cents + one pandas
    groupby/merge), emitting the same one-row-per-order frame the
    per-order formulation produced.

    All money moves as int64 CENTS computed by ``floor(x·100 + 0.5)``
    — the identical IEEE sequence DuckDB's ``FLOOR(x*100 + 0.5)``
    runs, so the per-order diff is bit-exact cross-engine (pandas
    ``.round()`` would be half-even and is avoided). The final status
    rollup is Catalyst-side."""
    orders = table(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice",
        F.expr(f"o_orderkey DIV {RECON_BUCKET}").alias("bucket"),
    )
    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount",
        F.expr(f"l_orderkey DIV {RECON_BUCKET}").alias("bucket"),
    )

    def reconcile(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        header = np.floor(odf["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        net = ldf["l_extendedprice"].to_numpy() * (1.0 - ldf["l_discount"].to_numpy())
        cents = np.floor(net * 100 + 0.5).astype("int64")
        detail = (
            pd.DataFrame({"k": ldf["l_orderkey"].to_numpy(), "c": cents})
            .groupby("k")["c"]
            .agg(["sum", "size"])
        )
        out = pd.DataFrame(
            {"o_orderkey": odf["o_orderkey"].to_numpy(), "header": header}
        ).merge(detail, left_on="o_orderkey", right_index=True, how="left")
        return pd.DataFrame(
            {
                "o_orderkey": out["o_orderkey"],
                "n_lines": out["size"].fillna(0).astype("int64"),
                "diff_cents": out["header"] - out["sum"].fillna(0).astype("int64"),
            }
        )

    recon = orders.groupBy("bucket").cogroup(li.groupBy("bucket")).applyInPandas(
        reconcile, "o_orderkey long, n_lines long, diff_cents long"
    )
    status = (
        F.when(F.col("diff_cents") == 0, "exact")
        .when(F.col("diff_cents") > 0, "header_higher")
        .otherwise("detail_higher")
    )
    return (
        recon.groupBy(status.alias("status"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.abs(F.col("diff_cents"))).cast("bigint").alias("abs_diff_cents"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
        )
        .orderBy("status")
    )


KMEANS_K = 8
KMEANS_ITERS = 3


def kmeans_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Lloyd's k-means over the embedding corpus (k=8, 3 fixed
    iterations, deterministic init = the 8 lowest vec_ids) — the
    clustering pass of diversity sampling / cluster-balanced data
    curation. Emits per-cluster size and mean distance.

    Spark-first iteration shape, all Catalyst-native (no Python UDF):
    - ASSIGN: the k centroids are a k-row DataFrame broadcast into a
      crossJoin (corpus × k stays one scan, no shuffle of embeddings);
      squared distance is a zip_with/aggregate fold; argmin per vector
      via min(struct(d2, cid)) in a hash agg keyed on vec_id.
    - UPDATE: per-dimension means via posexplode → (cid, dim) hash agg
      → collect back to array ordered by dim index. The shuffle
      carries k×dim cells, not the corpus.
    - LINEAGE: with a FIXED small iteration count the loop stays fully
      lazy — all three rounds compile into ONE job (one optimizer pass,
      exchange reuse dedups the repeated corpus scans) instead of a
      checkpoint job per round; fewer sequential jobs is also less
      exposure to host stalls. Beyond ~5 iterations (or with a
      convergence loop) re-enable periodic ``localCheckpoint`` as in
      dedup_clusters, or plan/optimizer time grows superlinearly.
      At 100 TB the same loop runs with the corpus in cache and only
      the k×dim centroid table crossing the driver.
    - DETERMINISM: every mean (centroid update, final avg distance) is
      a DECIMAL(28,12)-exact sum divided by the count — double
      summation is accumulation-order-dependent across partitions, so
      a raw F.avg would make the whole trajectory non-reproducible
      run-to-run AND unmatchable cross-engine.  Exact sums make the
      3-round trajectory bit-stable, which is what lets the fixed
      (k=8, 3-iteration, lowest-vec_id init) configuration unroll into
      a DuckDB oracle of 3 nested CTE rounds (same trick as
      pagerank_bipartite's unrolled-CTE oracle)."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        emb.orderBy("vec_id")
        .limit(KMEANS_K)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("c"))
    )
    # zip_with/aggregate left-fold squared distance: on Spark 4 the
    # higher-order-function form measured ~30% faster than a 64-term
    # unrolled element_at sum (same finding as _dot64 in dedup.py —
    # the giant unrolled tree loses its codegen advantage to per-term
    # overhead), and the fold keeps the plan compact as DIM grows.
    d2 = F.aggregate(
        F.zip_with("v", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    assigned = None
    for _ in range(KMEANS_ITERS):
        scored = emb.crossJoin(F.broadcast(cent)).select("vec_id", "cid", d2.alias("d2"))
        # argmin groups on the ID alone — never on the vector array
        # (array hashing/compare per row dominated the agg before);
        # the vector is joined back only for the centroid update
        assigned = (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("d2", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2"))
        )
        cent = (
            assigned.join(emb, "vec_id")
            .select("cid", F.posexplode("v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
            .select("cid", F.transform("pairs", lambda p: p["m"]).alias("c"))
        )
    return (
        assigned.groupBy("cid")
        .agg(
            F.count("*").alias("n_points"),
            F.round(
                F.sum(F.sqrt("d2").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_dist"),
        )
        .orderBy("cid")
    )


ORACLE: dict[str, str] = {
    # the FULL OUTER of per-key aggregates is exactly cogroup's key
    # universe; FLOOR(x*100 + 0.5) is the identical IEEE sequence the
    # numpy side runs
    "cogroup_order_reconciliation": """
        WITH header AS (
            SELECT o_orderkey AS k,
                   SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS header_cents
            FROM orders GROUP BY 1
        ),
        detail AS (
            SELECT l_orderkey AS k, COUNT(*) AS n_lines,
                   SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                                  + 0.5) AS BIGINT)) AS detail_cents
            FROM lineitem GROUP BY 1
        ),
        recon AS (
            SELECT COALESCE(h.header_cents, 0) - COALESCE(d.detail_cents, 0)
                       AS diff_cents,
                   COALESCE(d.n_lines, 0) AS n_lines
            FROM header h FULL OUTER JOIN detail d ON h.k = d.k
        )
        SELECT CASE WHEN diff_cents = 0 THEN 'exact'
                    WHEN diff_cents > 0 THEN 'header_higher'
                    ELSE 'detail_higher' END AS status,
               COUNT(*) AS n_orders,
               CAST(SUM(ABS(diff_cents)) AS BIGINT) AS abs_diff_cents,
               CAST(SUM(n_lines) AS BIGINT) AS n_lines
        FROM recon GROUP BY 1 ORDER BY status
    """,
    # integer-cents arithmetic mirrors the UDAF exactly (exact sums,
    # then one double division)
    "pandas_udaf_weighted_price": """
        SELECT l_returnflag AS flag, COUNT(*) AS n,
               ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND(l_quantity) AS BIGINT))
                     / (100.0 * SUM(CAST(ROUND(l_quantity) AS BIGINT))), 4) AS wavg_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "grouped_zscore_outliers": """
        SELECT label, COUNT(*) AS n_vecs,
               CAST(SUM(CASE WHEN ABS((norm - mu) / sd) > 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               ROUND(ANY_VALUE(sd), 4) AS sd_norm
        FROM (
            SELECT label, norm,
                   AVG(norm) OVER (PARTITION BY label) AS mu,
                   STDDEV_SAMP(norm) OVER (PARTITION BY label) AS sd
            FROM (
                SELECT label,
                       sqrt(list_reduce(list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                            (a, b) -> a + b)) AS norm
                FROM embeddings
            )
        )
        GROUP BY label
    """,
    "pandas_udf_norms": """
        SELECT label, COUNT(*) AS n_vecs,
               ROUND(AVG(norm), 4) AS avg_norm,
               ROUND(MAX(norm), 4) AS max_norm
        FROM (
            SELECT label,
                   sqrt(list_reduce(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                        (a, b) -> a + b)) AS norm
            FROM embeddings
        )
        GROUP BY label
    """,
    "knn_brute_force": _KNN_BRUTE_SQL,
    "lsh_bucket_histogram": f"""
        SELECT {_SIG_SQL} AS bucket, COUNT(*) AS n_vectors
        FROM embeddings GROUP BY bucket
    """,
    "knn_lsh_bucketed": _KNN_LSH_SQL,
    "ivf_cell_histogram": f"""
        WITH assigned AS ({_ASSIGN_SQL})
        SELECT cell, COUNT(*) AS n_vectors FROM assigned GROUP BY cell
    """,
    "knn_ivf": _KNN_IVF_SQL,
    "embedding_neardup_lsh": f"""
        WITH signed AS (
            SELECT vec_id, embedding, {_SIG_SQL} AS bucket FROM embeddings
        )
        SELECT a.bucket AS bucket, COUNT(*) AS n_pairs,
               ROUND(MAX({_cos_sql("a.embedding", "b.embedding")}), 4) AS max_cos
        FROM signed a JOIN signed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        GROUP BY a.bucket
    """,
    "embedding_quantization_error": """
        WITH v AS (
            SELECT label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd,
                   GREATEST(list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS scale
            FROM embeddings
        ),
        per_vec AS (
            SELECT label, scale,
                   list_reduce(list_transform(xd,
                       x -> pow(x - round(x / scale) * scale, 2)),
                       (a, b) -> a + b) / len(xd) AS mse
            FROM v
        )
        SELECT label, COUNT(*) AS n_vecs,
               ROUND(AVG(mse), 10) AS avg_mse,
               ROUND(AVG(scale), 6) AS avg_scale
        FROM per_vec
        GROUP BY label
        ORDER BY label
    """,
}

def embedding_quantization_error(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 symmetric-quantization accounting: per label, the mean
    squared dequantization error and mean scale when each vector is
    quantized to round(x/scale) with scale = max|x|/127 — the size/
    recall tradeoff every vector index (IVF-PQ, scalar-quantized HNSW)
    measures before committing to a codec.

    All math is row-local left-fold arithmetic (same fold order as the
    cosine paths, so the DuckDB twin is bit-compatible); the only
    shuffle is the final per-label aggregate."""
    emb = widen_small_scan(table(spark, sf, "embeddings"))
    xd = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(xd, lambda v: F.abs(v))), F.lit(1e-30)
    ) / F.lit(127.0)
    vecs = emb.select("label", xd.alias("xd"), scale.alias("scale"))
    sq_err = F.aggregate(
        F.col("xd"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.pow(x - F.round(x / F.col("scale"), 0) * F.col("scale"), 2),
    )
    per_vec = vecs.select(
        "label",
        (sq_err / F.size(F.col("xd"))).alias("mse"),
        F.col("scale").alias("scale"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("mse"), 10).alias("avg_mse"),
            F.round(F.avg("scale"), 6).alias("avg_scale"),
        )
        .orderBy("label")
    )


RP_OUT = 8  # Johnson-Lindenstrauss target dimensionality (64 → 8)


def _rp_sign(j: int, i: int) -> float:
    """±1 entry (projection j, input dim i) of the deterministic
    Rademacher projection matrix, derived from md5 exactly like the
    LSH hyperplanes so both engines embed identical literals."""
    import hashlib

    h = int(hashlib.md5(f"rp|{j}|{i}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 0 else -1.0


_RP_SIGNS: list[list[float]] = [
    [_rp_sign(j, i) for i in range(1, DIM + 1)] for j in range(RP_OUT)
]


def random_projection_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson-Lindenstrauss sketching: project each 64-d embedding to
    8-d with a deterministic ±1 (Rademacher) matrix and report, for a
    1-in-25 sample of vectors, the original L2 norm, the 1/sqrt(k)-
    rescaled projected norm, and their ratio (the JL distortion that a
    dimensionality-reduced ANN index would see).

    Row-local only: each projection is a zip_with left-fold against a
    literal sign array (constant-folded, whole-stage codegen, term
    order identical to the oracle's explicit left-assoc sum), so at
    100 TB this is a map-only pass — no shuffle at all; the sample
    filter prunes rows before any compute the optimizer can't push."""
    emb = widen_small_scan(table(spark, sf, "embeddings"))
    sample = emb.where(F.col("vec_id") % 25 == 0)

    def _fold_dot(signs: list[float]) -> Column:
        return F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )

    sq_norm = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    proj_sq = F.lit(0.0)
    for j in range(RP_OUT):
        d = _fold_dot(_RP_SIGNS[j])
        proj_sq = proj_sq + d * d
    norm = F.sqrt(sq_norm)
    pnorm = F.sqrt(proj_sq / RP_OUT)
    return sample.select(
        "vec_id",
        "label",
        F.round(norm, 6).alias("norm"),
        F.round(pnorm, 6).alias("proj_norm"),
        F.round(pnorm / norm, 6).alias("distortion"),
    ).orderBy("vec_id")


def arrow_batch_norms(spark: SparkSession, sf: str) -> DataFrame:
    """mapInArrow surface (the RecordBatch-level sibling of the Pandas
    UDF paths — zero pandas materialization, the batch stays an Arrow
    buffer end-to-end): per-vector L2 norm computed with numpy over the
    Arrow FixedSizeList values, emitted for the 1-in-25 vec_id sample.

    Same scale posture as ``pandas_udf_norms``: Arrow-batched transfer,
    vectorized math, one narrow projection — but without the
    Arrow→pandas→Arrow conversion tax, which is the right default for
    numeric-only batch transforms at 100 TB."""
    import pyarrow as pa

    emb = widen_small_scan(table(spark, sf, "embeddings"))
    sample = emb.where(F.col("vec_id") % 25 == 0).select("vec_id", "label", "embedding")

    def norms(batches):
        import numpy as np

        for batch in batches:
            vec_id = batch.column(0)
            label = batch.column(1)
            embs = batch.column(2)
            # list<float> -> (n, dim) float64 matrix without pandas
            # (flatten respects slice offsets, unlike .values)
            flat = np.asarray(embs.flatten(), dtype=np.float64)
            mat = flat.reshape(len(embs), -1)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            yield pa.RecordBatch.from_arrays(
                [vec_id, label, pa.array(np.round(nrm, 6), type=pa.float64())],
                ["vec_id", "label", "norm"],
            )

    out = sample.mapInArrow(norms, "vec_id long, label int, norm double")
    return out.orderBy("vec_id")


def embedding_centroid_shift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding drift: the L2 distance between each label's
    centroid and the global corpus centroid — the cluster-separation /
    subpopulation-shift monitor a curation pipeline tracks when a new
    source or crawl lands (a label whose centroid sits far from the
    corpus mean dominates its region of embedding space; one that sits
    on top of it adds no diversity).

    Shape: one posexplode -> (label, dim) hash aggregate — the only
    shuffle carries labels x dim partially-aggregated cells, never the
    corpus. The global centroid derives from those same cells (a
    second tiny agg, broadcast back), so the corpus is scanned ONCE.
    Determinism is the kmeans recipe: DECIMAL(28,12)-exact sums (float
    double-summation is accumulation-order-dependent across
    partitions), then an array_sort'd struct fold so the 64-term sum
    of squares accumulates in dimension order in both engines."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cells = (
        emb.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(
            F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
            F.count("*").alias("n"),
        )
    )
    glob = cells.groupBy("i").agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("g")
    )
    diff = cells.join(F.broadcast(glob), "i").select(
        "label",
        "n",
        "i",
        (F.col("s").cast("double") / F.col("n") - F.col("g")).alias("dm"),
    )
    return (
        diff.groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("i"), (F.col("dm") * F.col("dm")).alias("d2"))
                )
            ).alias("pairs"),
        )
        .select(
            "label",
            "n_vecs",
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.transform("pairs", lambda p: p["d2"]),
                        F.lit(0.0),
                        lambda a, b: a + b,
                    )
                ),
                6,
            ).alias("centroid_shift"),
        )
        .orderBy("label")
    )


QUERIES = {
    "knn_brute_force": knn_brute_force,
    "lsh_bucket_histogram": lsh_bucket_histogram,
    "knn_lsh_bucketed": knn_lsh_bucketed,
    "ivf_cell_histogram": ivf_cell_histogram,
    "knn_ivf": knn_ivf,
    "embedding_neardup_lsh": embedding_neardup_lsh,
    "pandas_udf_norms": pandas_udf_norms,
    "grouped_zscore_outliers": grouped_zscore_outliers,
    "kmeans_embeddings": kmeans_embeddings,
    "pandas_udaf_weighted_price": pandas_udaf_weighted_price,
    "cogroup_order_reconciliation": cogroup_order_reconciliation,
    "embedding_quantization_error": embedding_quantization_error,
    "random_projection_stats": random_projection_stats,
    "arrow_batch_norms": arrow_batch_norms,
    "ann_recall_eval": ann_recall_eval,
    "activity_profile_knn": activity_profile_knn,
    "embedding_centroid_shift": embedding_centroid_shift,
}


def _centroid_shift_oracle() -> str:
    """Oracle for embedding_centroid_shift — same determinism recipe
    as the kmeans oracle: DECIMAL(28,12)-exact per-(label,dim) sums
    (order-independent), identical double divisions for the means, and
    an ORDER BY i left fold for the cross-dimension sum of squares so
    both engines accumulate in the same association."""
    return f"""
    WITH cells AS (
        SELECT label, i,
               SUM(CAST(x AS DECIMAL(28,12))) AS s, COUNT(*) AS n
        FROM (
            SELECT label,
                   unnest(list_transform(generate_series(1, {DIM}),
                       j -> {{'i': j, 'x': CAST(embedding[j] AS DOUBLE)}}),
                       recursive := true)
            FROM embeddings
        )
        GROUP BY label, i
    ),
    gcent AS (
        SELECT i, CAST(SUM(s) AS DOUBLE) / SUM(n) AS g FROM cells GROUP BY i
    ),
    diff AS (
        SELECT label, n, c.i,
               (CAST(s AS DOUBLE) / n - g) AS dm
        FROM cells c JOIN gcent USING (i)
    )
    SELECT label, MAX(n) AS n_vecs,
           ROUND(sqrt(list_reduce(list(dm * dm ORDER BY i), (a, b) -> a + b)), 6)
               AS centroid_shift
    FROM diff
    GROUP BY label
    ORDER BY label
    """


ORACLE["embedding_centroid_shift"] = _centroid_shift_oracle()


def _rp_oracle_sql() -> str:
    """Oracle for random_projection_stats: explicit left-assoc sums
    over the same literal ±1 matrix (see _SIG_SQL for the precedent —
    fold order matches Spark's zip_with/aggregate term for term)."""
    sq_norm = " + ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST(embedding[{i + 1}] AS DOUBLE)"
        for i in range(DIM)
    )
    dots = []
    for j in range(RP_OUT):
        dot = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * ({_RP_SIGNS[j][i]!r})"
            for i in range(DIM)
        )
        dots.append(f"({dot})")
    proj_sq = " + ".join(f"{d} * {d}" for d in dots)
    return f"""
        SELECT vec_id, label,
               ROUND(sqrt({sq_norm}), 6) AS norm,
               ROUND(sqrt(({proj_sq}) / {RP_OUT}), 6) AS proj_norm,
               ROUND(sqrt(({proj_sq}) / {RP_OUT}) / sqrt({sq_norm}), 6) AS distortion
        FROM embeddings
        WHERE vec_id % 25 = 0
        ORDER BY vec_id
    """


ORACLE["random_projection_stats"] = _rp_oracle_sql()

_SQ_NORM_SQL = " + ".join(
    f"CAST(embedding[{_i + 1}] AS DOUBLE) * CAST(embedding[{_i + 1}] AS DOUBLE)"
    for _i in range(DIM)
)
ORACLE["arrow_batch_norms"] = f"""
    SELECT vec_id, label, ROUND(sqrt({_SQ_NORM_SQL}), 6) AS norm
    FROM embeddings
    WHERE vec_id % 25 = 0
    ORDER BY vec_id
"""

def _paa_oracle_sql() -> str:
    """Oracle for activity_profile_knn: 24 decimal CASE-sums per user,
    profile as a double list, cosine via the same list_reduce left
    fold as the embedding oracles (0.0-seeded Spark fold ≡ first-
    element-seeded list_reduce)."""
    cols = ", ".join(
        f"SUM(CASE WHEN EXTRACT(hour FROM ts) = {h} "
        f"THEN CAST(value AS DECIMAL(18,6)) "
        f"ELSE CAST(0 AS DECIMAL(18,6)) END) AS h_{h}"
        for h in range(PAA_HOURS)
    )
    plist = "[" + ", ".join(f"CAST(h_{h} AS DOUBLE)" for h in range(PAA_HOURS)) + "]"

    def dot(x: str, y: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, {PAA_HOURS}), "
            f"i -> {x}[i] * {y}[i]), (p, q) -> p + q)"
        )

    cos = (
        f"({dot('q.profile', 'c.profile')} / "
        f"(sqrt({dot('q.profile', 'q.profile')}) * sqrt({dot('c.profile', 'c.profile')})))"
    )
    self_dot = dot("s.profile", "s.profile")
    return f"""
        WITH prof AS (SELECT user_id, {cols} FROM events GROUP BY user_id),
        all_signed AS (SELECT user_id, {plist} AS profile FROM prof),
        signed AS (SELECT * FROM all_signed s WHERE {self_dot} > 0)
        SELECT query_id, user_id, cos, CAST(rank AS INT) AS rank
        FROM (
            SELECT q.user_id AS query_id, c.user_id AS user_id,
                   ROUND({cos}, 6) AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.user_id
                       ORDER BY ROUND({cos}, 6) DESC, c.user_id ASC) AS rank
            FROM signed q JOIN signed c ON c.user_id <> q.user_id
            WHERE q.user_id < {PAA_QUERIES}
        ) WHERE rank <= {PAA_TOP_K}
    """


ORACLE["activity_profile_knn"] = _paa_oracle_sql()

ORACLE["ann_recall_eval"] = f"""
    WITH truth AS ({_KNN_BRUTE_SQL}),
    lsh AS ({_KNN_LSH_SQL}),
    ivf AS ({_KNN_IVF_SQL}),
    hits AS (
        SELECT t.query_id,
               COUNT(*) AS n_truth,
               CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS lsh_hits,
               CAST(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS ivf_hits
        FROM truth t
        LEFT JOIN lsh l ON l.query_id = t.query_id AND l.vec_id = t.vec_id
        LEFT JOIN ivf v ON v.query_id = t.query_id AND v.vec_id = t.vec_id
        GROUP BY t.query_id
    )
    SELECT query_id, n_truth, lsh_hits, ivf_hits,
           ROUND(CAST(lsh_hits AS DOUBLE) / n_truth, 4) AS lsh_recall,
           ROUND(CAST(ivf_hits AS DOUBLE) / n_truth, 4) AS ivf_recall
    FROM hits
"""


def _kmeans_oracle_sql() -> str:
    """Oracle for kmeans_embeddings: Lloyd's with fixed k=8, 3
    iterations, lowest-vec_id init unrolls into 3 nested CTE rounds
    (assign -> update), the same trick as pagerank_bipartite's
    unrolled-CTE oracle.  Cross-engine bit-stability rests on the
    operator's decimal-exact means (order-independent sums) plus an
    identical left-fold for the squared distance: DuckDB's list_reduce
    folds left like Spark's F.aggregate, and 0.0 + x == x exactly, so
    the missing initial accumulator cannot diverge."""
    k, iters = KMEANS_K, KMEANS_ITERS
    d2 = (
        "list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])), (a, b) -> a + b)"
    ).format(dim=DIM)
    rounds = []
    prev = "c0"
    for r in range(1, iters + 1):
        rounds.append(f"""
    s{r} AS (
        SELECT e.vec_id, c.cid, {d2} AS d2
        FROM emb e CROSS JOIN {prev} c
    ),
    a{r} AS (
        SELECT vec_id, cid, d2 FROM (
            SELECT vec_id, cid, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cid) AS rn
            FROM s{r}
        ) WHERE rn = 1
    ),
    c{r} AS (
        SELECT cid, list(m ORDER BY i) AS c FROM (
            SELECT cid, i,
                   CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                       / COUNT(*) AS m
            FROM (
                SELECT a.cid,
                       unnest(list_transform(generate_series(1, {DIM}),
                           j -> {{'i': j, 'x': e.v[j]}}),
                           recursive := true)
                FROM a{r} a JOIN emb e ON a.vec_id = e.vec_id
            )
            GROUP BY cid, i
        )
        GROUP BY cid
    )""")
        prev = f"c{r}"
    body = ",".join(rounds)
    return f"""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c0 AS (
        SELECT vec_id AS cid, v AS c FROM emb ORDER BY vec_id LIMIT {k}
    ),{body}
    SELECT cid, COUNT(*) AS n_points,
           ROUND(CAST(SUM(CAST(sqrt(d2) AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_dist
    FROM a{iters}
    GROUP BY cid
    ORDER BY cid
    """


ORACLE["kmeans_embeddings"] = _kmeans_oracle_sql()


def embedding_dim_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension corpus health profile: n / mean / variance / min /
    max for each of the 64 embedding dimensions — the first monitor an
    embedding pipeline grows (a collapsed dimension means the encoder
    head died; a runaway variance means a normalization bug upstream).

    Shape: one posexplode -> per-dim hash aggregate. The shuffle
    carries 64 partially-aggregated cells per map task, never vectors;
    output is DIM rows at any corpus size. Determinism is the
    centroid-shift recipe: sums and sums-of-squares accumulate in
    DECIMAL(28,12) (float double-summation is partition-order
    dependent); mean and variance then derive via IDENTICAL single
    double expressions in both engines, and min/max are exact.
    """
    emb = widen_small_scan(table(spark, sf, "embeddings")).select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    cells = emb.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,12)")).alias("s2"),
        F.round(F.min("x"), 6).alias("min_x"),
        F.round(F.max("x"), 6).alias("max_x"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    return cells.select(
        "dim",
        "n",
        F.round(mean, 6).alias("mean_x"),
        F.round(
            F.col("s2").cast("double") / F.col("n") - mean * mean, 6
        ).alias("var_x"),
        "min_x",
        "max_x",
    ).orderBy("dim")


QUERIES["embedding_dim_profile"] = embedding_dim_profile
ORACLE["embedding_dim_profile"] = f"""
    WITH cells AS (
        SELECT i - 1 AS dim,
               COUNT(*) AS n,
               SUM(CAST(x AS DECIMAL(28,12))) AS s,
               SUM(CAST(x * x AS DECIMAL(28,12))) AS s2,
               ROUND(MIN(x), 6) AS min_x,
               ROUND(MAX(x), 6) AS max_x
        FROM (
            SELECT unnest(list_transform(generate_series(1, {DIM}),
                       j -> {{'i': j, 'x': CAST(embedding[j] AS DOUBLE)}}),
                   recursive := true)
            FROM embeddings
        )
        GROUP BY i
    )
    SELECT dim, n,
           ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_x,
           ROUND(CAST(s2 AS DOUBLE) / n
                 - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 6)
               AS var_x,
           min_x, max_x
    FROM cells
    ORDER BY dim
"""


# SemDeDup within-cell cosine threshold: the synthetic embeddings are
# near-orthogonal (within-cell pairwise cosine: p50 0.04, p99 0.32,
# max 0.49 at every SF), so the paper's 0.95+ would drop nothing —
# 0.30 keeps the top ~1% of pairs and yields a non-degenerate dropped
# set at each SF. Production corpora with real near-dups tune this up.
SEMDEDUP_TAU = 0.30


def semdedup_prune(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus (the IVF-lite cell
    assignment), compare pairs ONLY within a cell, and drop the
    higher-id member of any pair whose cosine exceeds tau —
    keep-lowest-id survivorship, the embedding-space counterpart of
    dedup.py's MinHash pipeline. Reports the per-cell dedup ledger
    (vectors, dropped, kept).

    Scale shape: the quadratic comparison is confined within cells —
    exactly the paper's trick; cell count grows with the corpus so the
    per-cell inverted list stays bounded, and the pair join is a cell-
    keyed equijoin (never a corpus cross join). Dropped ids dedup via
    (cell, id) distinct BEFORE counting (a vector above tau with many
    partners must drop once). Cosines round to 6 dp before the
    threshold compare so both engines make identical keep decisions.
    """
    assigned = _cell_assignment(spark, sf)
    a = assigned.select(
        F.col("cell"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        F.col("cell").alias("cell_b"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.round(_dot64(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    dropped = (
        a.join(b, (a.cell == b.cell_b) & (a.id_a < b.id_b))
        .filter(cos >= SEMDEDUP_TAU)
        .select("cell", "id_b")
        .distinct()
        .groupBy("cell")
        .agg(F.count("*").alias("n_dropped"))
    )
    per_cell = assigned.groupBy("cell").agg(F.count("*").alias("n_vectors"))
    return (
        per_cell.join(dropped, "cell", "left_outer")
        .select(
            "cell",
            "n_vectors",
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
            (F.col("n_vectors") - F.coalesce(F.col("n_dropped"), F.lit(0))).alias(
                "n_kept"
            ),
        )
        .orderBy("cell")
    )


QUERIES["semdedup_prune"] = semdedup_prune
ORACLE["semdedup_prune"] = f"""
    WITH assign AS ({_ASSIGN_SQL}),
    dropped AS (
        SELECT cell, COUNT(*) AS n_dropped
        FROM (
            SELECT DISTINCT a.cell, b.vec_id
            FROM assign a JOIN assign b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE ROUND({_cos_sql("a.embedding", "b.embedding")}, 6)
                  >= {SEMDEDUP_TAU}
        )
        GROUP BY cell
    ),
    per_cell AS (
        SELECT cell, COUNT(*) AS n_vectors FROM assign GROUP BY cell
    )
    SELECT p.cell, p.n_vectors,
           COALESCE(d.n_dropped, 0) AS n_dropped,
           p.n_vectors - COALESCE(d.n_dropped, 0) AS n_kept
    FROM per_cell p LEFT JOIN dropped d ON p.cell = d.cell
    ORDER BY p.cell
"""


HN_K = 5  # hard negatives mined per query


def hard_negative_mining(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training (the
    DPR / contrastive-learning preparation step): for each query
    vector, the top-k most similar corpus vectors with a DIFFERENT
    label — near the query in embedding space yet wrong, exactly the
    negatives a contrastive loss learns most from.

    Scale shape: knn_ivf's single-probe plan with a label guard — the
    query side broadcasts, candidates come from the query's IVF cell
    only (cell-keyed equijoin), and the label filter rides the join
    condition so mismatches never materialize. Labels attach to the
    assignment via a vec_id equijoin (co-partitioned with the corpus
    at scale). The query's own row is excluded for free (its label
    equals itself). Cosines round to 6 dp before ranking so both
    engines pick identical negatives.
    """
    assigned = _cell_assignment(spark, sf)
    labels = table(spark, sf, "embeddings").select("vec_id", "label")
    cand = assigned.join(labels, "vec_id")
    q = cand.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("cell").alias("qcell"),
        F.col("nrm").alias("qnrm"),
        F.col("label").alias("qlabel"),
    )
    cos = F.round(
        _dot64(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    scored = (
        F.broadcast(q)
        .join(
            cand,
            (F.col("cell") == F.col("qcell")) & (F.col("label") != F.col("qlabel")),
        )
        .select("query_id", "vec_id", "label", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HN_K)
        .select(
            "query_id",
            "vec_id",
            "label",
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )


QUERIES["hard_negative_mining"] = hard_negative_mining
ORACLE["hard_negative_mining"] = f"""
    WITH assigned AS ({_ASSIGN_SQL}),
    cand AS (
        SELECT a.vec_id, a.embedding, a.cell, e.label
        FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
    )
    SELECT query_id, vec_id, label, cos, CAST(rank AS INT) AS rank
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.label,
               ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) DESC,
                            c.vec_id ASC) AS rank
        FROM cand q JOIN cand c
          ON c.cell = q.cell AND c.label <> q.label
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE rank <= {HN_K}
"""


def cell_label_purity(spark: SparkSession, sf: str) -> DataFrame:
    """Clustering-quality audit: per IVF cell, the majority label and
    its purity (majority fraction) — the standard external evaluation
    of an unsupervised partition against known classes, and the first
    sanity check before trusting cells for SemDeDup or single-probe
    ANN (a cell with purity ~1/|labels| clusters nothing).

    Two hash aggregates: (cell, label) counts — the shuffle carries
    |cells| x |labels| partially-aggregated rows — then a per-cell
    max(struct(count, -label)) picks the majority with the LOWER label
    on ties, no window and no per-cell sort. Purity divides two exact
    bigints in one double division.
    """
    assigned = _cell_assignment(spark, sf)
    labels = table(spark, sf, "embeddings").select("vec_id", "label")
    counts = (
        assigned.join(labels, "vec_id")
        .groupBy("cell", "label")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.groupBy("cell")
        .agg(
            F.sum("cnt").alias("n_vectors"),
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m"),
        )
        .select(
            "cell",
            "n_vectors",
            (-F.col("m.neg")).cast("int").alias("majority_label"),
            F.round(
                F.col("m.cnt").cast("double") / F.col("n_vectors"), 6
            ).alias("purity"),
        )
        .orderBy("cell")
    )


QUERIES["cell_label_purity"] = cell_label_purity
ORACLE["cell_label_purity"] = f"""
    WITH assigned AS ({_ASSIGN_SQL}),
    counts AS (
        SELECT a.cell, e.label, COUNT(*) AS cnt
        FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
        GROUP BY 1, 2
    ),
    best AS (
        SELECT cell,
               CAST(SUM(cnt) AS BIGINT) AS n_vectors,
               MAX(ROW(cnt, -label)) AS m
        FROM counts GROUP BY cell
    )
    SELECT cell, n_vectors,
           CAST(-m[2] AS INT) AS majority_label,
           ROUND(CAST(m[1] AS DOUBLE) / n_vectors, 6) AS purity
    FROM best
    ORDER BY cell
"""


# --- matryoshka truncation audit (r6 window) ---------------------------------

TRUNC_DIM = 16  # retrieval prefix length (Matryoshka: 64-d stored, 16-d served)


def matryoshka_truncation_error(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka-representation audit (Kusupati et al. 2022,
    arXiv:2205.13147): how much ranking signal survives when vectors
    are truncated to their first ``TRUNC_DIM`` dimensions — the
    decision every embedding-serving stack makes before paying for
    full-width ANN.  For each query vector (vec_id < N_QUERIES),
    against every other vector: the mean |cos_full − cos_truncated|
    and whether the top-1 neighbour under the truncated metric matches
    the full-width top-1 (ties broken by lower vec_id, both engines).

    100 TB shape: identical to ``knn_brute_force`` — the N_QUERIES
    query rows broadcast, both norms are computed once per ROW before
    the join (each pair then costs two dots + two multiplies), and the
    per-query reduction is a partial-aggregatable max(struct) argmax,
    not a window — no low-cardinality raw-row shuffle on query_id."""
    emb = (
        widen_small_scan(table(spark, sf, "embeddings"))
        .select(
            "vec_id",
            "embedding",
            F.slice(F.col("embedding"), 1, TRUNC_DIM).alias("trunc"),
        )
        .withColumn("nrm", _norm64(F.col("embedding")))
        .withColumn("tnrm", _norm64(F.col("trunc")))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("trunc").alias("qt"),
        F.col("nrm").alias("qnrm"),
        F.col("tnrm").alias("qtnrm"),
    )
    cf = F.round(
        _dot64(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    ct = F.round(
        _dot64(F.col("qt"), F.col("trunc")) / (F.col("qtnrm") * F.col("tnrm")), 6
    )
    pairs = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cf.alias("cf"), ct.alias("ct"))
    )
    best_f = F.max(F.struct(F.col("cf").alias("c"), (-F.col("vec_id")).alias("nv")))
    best_t = F.max(F.struct(F.col("ct").alias("c"), (-F.col("vec_id")).alias("nv")))
    agg = pairs.groupBy("query_id").agg(
        F.count("*").alias("n_cands"),
        F.round(F.avg(F.abs(F.col("cf") - F.col("ct"))), 4).alias("mean_abs_err"),
        best_f.alias("bf"),
        best_t.alias("bt"),
    )
    return agg.select(
        "query_id",
        "n_cands",
        "mean_abs_err",
        (-F.col("bf.nv")).alias("top1_full"),
        (-F.col("bt.nv")).alias("top1_trunc"),
        (F.col("bf.nv") == F.col("bt.nv")).alias("top1_match"),
    ).orderBy("query_id")


def _cos_trunc_sql(a: str, b: str) -> str:
    def _dot(x: str, y: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, {TRUNC_DIM}), "
            f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)), (p, q) -> p + q)"
        )

    return f"({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))"


ORACLE["matryoshka_truncation_error"] = f"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) AS cf,
               ROUND({_cos_trunc_sql("q.embedding", "c.embedding")}, 6) AS ct
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    agg AS (
        SELECT query_id, COUNT(*) AS n_cands,
               ROUND(AVG(ABS(cf - ct)), 4) AS mean_abs_err,
               MAX(ROW(cf, -vec_id)) AS bf,
               MAX(ROW(ct, -vec_id)) AS bt
        FROM pairs GROUP BY query_id
    )
    SELECT query_id, n_cands, mean_abs_err,
           -bf[2] AS top1_full, -bt[2] AS top1_trunc,
           bf[2] = bt[2] AS top1_match
    FROM agg ORDER BY query_id
"""
QUERIES["matryoshka_truncation_error"] = matryoshka_truncation_error


# --- multi-probe LSH (r6 window) ---------------------------------------------


def knn_lsh_multiprobe(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-probe LSH top-10 (Lv et al. 2007, VLDB): each query
    searches its own signature bucket PLUS the ``LSH_BITS`` buckets at
    Hamming distance 1 — the standard recall/cost lever that makes
    hyperplane LSH production-viable: near neighbours that land one
    flipped bit away (the dominant miss mode of single-probe) come
    back without adding tables or widening buckets.

    100 TB shape: identical join geometry to ``knn_lsh_bucketed`` —
    the probe fan-out multiplies only the broadcast QUERY side
    (N_QUERIES x (LSH_BITS+1) rows); the corpus side still hash-joins
    on its one precomputed bucket and never shuffles globally. Probe
    buckets are distinct by construction (XOR with distinct bits), so
    no candidate dedup stage is needed."""
    emb = widen_small_scan(table(spark, sf, "embeddings"))
    signed = emb.select(
        "vec_id",
        "embedding",
        _signature("embedding").alias("bucket"),
        _norm64(F.col("embedding")).alias("nrm"),
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(LSH_BITS)],
    )
    q = (
        signed.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("qnrm"),
            F.explode(probes).alias("probe"),
        )
    )
    cos = F.round(
        _dot64(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    scored = (
        F.broadcast(q)
        .join(
            signed,
            (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


_PROBE_LIST_SQL = (
    "list_concat([q.bucket], list_transform(generate_series(0, "
    f"{LSH_BITS - 1}), b -> xor(q.bucket, (1 << b))))"
)

ORACLE["knn_lsh_multiprobe"] = f"""
    WITH signed AS (
        SELECT vec_id, embedding, {_SIG_SQL} AS bucket FROM embeddings
    ),
    probed AS (
        SELECT q.vec_id AS query_id, q.embedding AS qv,
               unnest({_PROBE_LIST_SQL}) AS probe
        FROM signed q WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank
    FROM (
        SELECT p.query_id, c.vec_id,
               ROUND({_cos_sql("p.qv", "c.embedding")}, 6) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY p.query_id
                   ORDER BY ROUND({_cos_sql("p.qv", "c.embedding")}, 6) DESC,
                            c.vec_id ASC) AS rank
        FROM probed p JOIN signed c
          ON c.bucket = p.probe AND c.vec_id <> p.query_id
    ) WHERE rank <= {TOP_K}
"""
QUERIES["knn_lsh_multiprobe"] = knn_lsh_multiprobe


# ---------------------------------------------------------------------------
# round 7: rank fusion, metric-choice audit, and covariance profile
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def rrf_fusion_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankers per query
    vector: cosine similarity and (squared) Euclidean distance — the
    fusion rule retrieval stacks use to merge rankers without score
    calibration, score = sum_r 1/(RRF_K + rank_r).  For unnormalized
    embeddings the two rankers genuinely disagree, which is what makes
    the fusion non-trivial.  Both base ranks order on values rounded
    to 6 (the knn convention that pins cross-engine ordering), ties on
    vec_id; equal fused scores (symmetric rank pairs) break on vec_id.

    100 TB shape: the 5 queries broadcast; one corpus pass computes
    both scores row-locally; the three windows partition on query_id
    (bounded per-query corpus slices, the knn_brute_force shape)."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).withColumn(
        "nrm", _norm64(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    dot = _dot64(F.col("qv"), F.col("embedding"))
    cos = F.round(dot / (F.col("qnrm") * F.col("nrm")), 6)
    l2sq = F.round(
        F.col("qnrm") * F.col("qnrm") + F.col("nrm") * F.col("nrm")
        - 2 * dot,
        6,
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cos"), l2sq.alias("l2sq"))
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    w_l2 = Window.partitionBy("query_id").orderBy(
        F.asc("l2sq"), F.asc("vec_id")
    )
    ranked = scored.select(
        "query_id",
        "vec_id",
        F.row_number().over(w_cos).alias("rank_cos"),
        F.row_number().over(w_l2).alias("rank_l2"),
    )
    rrf = 1.0 / (F.lit(RRF_K) + F.col("rank_cos")) + 1.0 / (
        F.lit(RRF_K) + F.col("rank_l2")
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.desc(rrf), F.asc("vec_id")
    )
    return (
        ranked.withColumn("rank_rrf", F.row_number().over(w_f))
        .filter(F.col("rank_rrf") <= TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.col("rank_rrf").cast("int").alias("rank_rrf"),
            F.col("rank_cos").cast("int").alias("rank_cos"),
            F.col("rank_l2").cast("int").alias("rank_l2"),
            F.round(rrf, 6).alias("rrf_score"),
        )
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        "(p, q) -> p + q)"
    )


ORACLE["rrf_fusion_topk"] = f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id,
               ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) AS cos,
               ROUND({_dot_sql("q.embedding", "q.embedding")}
                     + {_dot_sql("c.embedding", "c.embedding")}
                     - 2 * {_dot_sql("q.embedding", "c.embedding")}, 6)
                   AS l2sq
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, vec_id ASC) AS rank_cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY l2sq ASC, vec_id ASC) AS rank_l2
        FROM scored
    )
    SELECT query_id, vec_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY 1.0 / ({RRF_K} + rank_cos)
                       + 1.0 / ({RRF_K} + rank_l2) DESC, vec_id ASC)
                AS INT) AS rank_rrf,
           CAST(rank_cos AS INT) AS rank_cos,
           CAST(rank_l2 AS INT) AS rank_l2,
           ROUND(1.0 / ({RRF_K} + rank_cos)
                 + 1.0 / ({RRF_K} + rank_l2), 6) AS rrf_score
    FROM ranked
    QUALIFY rank_rrf <= {TOP_K}
"""

QUERIES["rrf_fusion_topk"] = rrf_fusion_topk


def dot_vs_cosine_rank_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Metric-choice audit: per query, how much the top-10 by RAW dot
    product overlaps the top-10 by cosine — the number that tells you
    whether skipping normalization (common in ANN indexes that only
    support inner product) actually changes retrieval.  Overlap of 10
    means norms don't matter for this corpus; low overlap means the
    index metric is load-bearing.

    100 TB shape: identical to knn_brute_force — broadcast queries,
    one corpus pass, two bounded windows, then an equijoin of two
    10-row-per-query sets."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).withColumn(
        "nrm", _norm64(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    dot = F.round(_dot64(F.col("qv"), F.col("embedding")), 6)
    cos = F.round(
        _dot64(F.col("qv"), F.col("embedding"))
        / (F.col("qnrm") * F.col("nrm")),
        6,
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", dot.alias("dot"), cos.alias("cos"))
    )
    w_dot = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), F.asc("vec_id")
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    ranked = scored.select(
        "query_id",
        "vec_id",
        F.row_number().over(w_dot).alias("rd"),
        F.row_number().over(w_cos).alias("rc"),
    )
    top = ranked.filter(
        (F.col("rd") <= TOP_K) | (F.col("rc") <= TOP_K)
    )
    return (
        top.groupBy("query_id")
        .agg(
            F.sum(
                ((F.col("rd") <= TOP_K) & (F.col("rc") <= TOP_K)).cast(
                    "bigint"
                )
            ).cast("bigint").alias("n_overlap"),
        )
        .select(
            "query_id",
            "n_overlap",
            F.round(
                F.col("n_overlap")
                / (F.lit(2 * TOP_K) - F.col("n_overlap")).cast("double"),
                4,
            ).alias("jaccard_topk"),
        )
        .orderBy("query_id")
    )


ORACLE["dot_vs_cosine_rank_overlap"] = f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id,
               ROUND({_dot_sql("q.embedding", "c.embedding")}, 6) AS dot,
               ROUND({_cos_sql("q.embedding", "c.embedding")}, 6) AS cos
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dot DESC, vec_id ASC) AS rd,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, vec_id ASC) AS rc
        FROM scored
    )
    SELECT query_id,
           CAST(SUM(CASE WHEN rd <= {TOP_K} AND rc <= {TOP_K}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           ROUND(SUM(CASE WHEN rd <= {TOP_K} AND rc <= {TOP_K}
                     THEN 1 ELSE 0 END)
                 / CAST({2 * TOP_K} - SUM(CASE WHEN rd <= {TOP_K}
                        AND rc <= {TOP_K} THEN 1 ELSE 0 END) AS DOUBLE), 4)
               AS jaccard_topk
    FROM ranked WHERE rd <= {TOP_K} OR rc <= {TOP_K}
    GROUP BY query_id ORDER BY query_id
"""

QUERIES["dot_vs_cosine_rank_overlap"] = dot_vs_cosine_rank_overlap


COV_DIMS = 8  # leading dimensions profiled by the covariance matrix


def embedding_covariance_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Covariance and correlation matrix of the first ``COV_DIMS``
    embedding dimensions — the PCA-readiness profile (an encoder whose
    leading dims correlate at 0.9 is wasting capacity; whitening needs
    exactly these numbers).  One row per (i <= j) pair.

    Determinism is the dim-profile recipe: sums and cross-products
    accumulate in DECIMAL(28,12); covariance/correlation then derive
    via identical single double expressions in both engines.

    100 TB shape: ONE partial+final aggregate with 8 + 36 decimal sums
    — vectors never shuffle, output is 36 rows at any corpus size."""
    emb = widen_small_scan(table(spark, sf, "embeddings"))
    xs = {
        i: F.try_element_at(
            F.col("embedding").cast("array<double>"), F.lit(i)
        )
        for i in range(1, COV_DIMS + 1)
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(1, COV_DIMS + 1):
        aggs.append(
            F.sum(xs[i].cast("decimal(28,12)")).alias(f"s_{i}")
        )
    for i in range(1, COV_DIMS + 1):
        for j in range(i, COV_DIMS + 1):
            aggs.append(
                F.sum((xs[i] * xs[j]).cast("decimal(28,12)")).alias(
                    f"p_{i}_{j}"
                )
            )
    one = emb.agg(*aggs)
    pairs = [
        (i, j)
        for i in range(1, COV_DIMS + 1)
        for j in range(i, COV_DIMS + 1)
    ]
    stack_args = ", ".join(
        f"{i}, {j}, p_{i}_{j}, s_{i}, s_{j}, p_{i}_{i}, p_{j}_{j}"
        for i, j in pairs
    )
    rows = one.select(
        "n",
        F.expr(
            f"stack({len(pairs)}, {stack_args})"
            " AS (dim_i, dim_j, p, si, sj, pii, pjj)"
        ),
    )
    mean_i = F.col("si").cast("double") / F.col("n")
    mean_j = F.col("sj").cast("double") / F.col("n")
    cov = F.col("p").cast("double") / F.col("n") - mean_i * mean_j
    var_i = F.col("pii").cast("double") / F.col("n") - mean_i * mean_i
    var_j = F.col("pjj").cast("double") / F.col("n") - mean_j * mean_j
    return rows.select(
        F.col("dim_i").cast("int").alias("dim_i"),
        F.col("dim_j").cast("int").alias("dim_j"),
        F.col("n").cast("bigint").alias("n"),
        F.round(cov, 6).alias("cov"),
        F.round(cov / F.sqrt(var_i * var_j), 6).alias("corr"),
    ).orderBy("dim_i", "dim_j")


def _cov_oracle_sql() -> str:
    aggs = ["COUNT(*) AS n"]
    for i in range(1, COV_DIMS + 1):
        aggs.append(
            f"SUM(CAST(CAST(embedding[{i}] AS DOUBLE) AS DECIMAL(28,12)))"
            f" AS s_{i}"
        )
    for i in range(1, COV_DIMS + 1):
        for j in range(i, COV_DIMS + 1):
            aggs.append(
                f"SUM(CAST(CAST(embedding[{i}] AS DOUBLE)"
                f" * CAST(embedding[{j}] AS DOUBLE) AS DECIMAL(28,12)))"
                f" AS p_{i}_{j}"
            )
    selects = []
    for i in range(1, COV_DIMS + 1):
        for j in range(i, COV_DIMS + 1):
            selects.append(
                f"""SELECT {i} AS dim_i, {j} AS dim_j,
                CAST(n AS BIGINT) AS n,
                ROUND(CAST(p_{i}_{j} AS DOUBLE) / n
                      - (CAST(s_{i} AS DOUBLE) / n)
                        * (CAST(s_{j} AS DOUBLE) / n), 6) AS cov,
                ROUND((CAST(p_{i}_{j} AS DOUBLE) / n
                       - (CAST(s_{i} AS DOUBLE) / n)
                         * (CAST(s_{j} AS DOUBLE) / n))
                      / sqrt((CAST(p_{i}_{i} AS DOUBLE) / n
                              - (CAST(s_{i} AS DOUBLE) / n)
                                * (CAST(s_{i} AS DOUBLE) / n))
                             * (CAST(p_{j}_{j} AS DOUBLE) / n
                                - (CAST(s_{j} AS DOUBLE) / n)
                                  * (CAST(s_{j} AS DOUBLE) / n))), 6)
                    AS corr
            FROM one"""
            )
    return (
        "WITH one AS (SELECT " + ", ".join(aggs) + " FROM embeddings)\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY dim_i, dim_j"
    )


ORACLE["embedding_covariance_matrix"] = _cov_oracle_sql()
QUERIES["embedding_covariance_matrix"] = embedding_covariance_matrix


# NDCG@k discount table 1/log2(pos+1), computed ONCE driver-side with
# math.log2 and embedded as full-precision literals in BOTH engines'
# plans — log2() is libm-backed and may differ by 1 ulp between the
# JVM and DuckDB, so neither engine is allowed to compute it.
import math as _math

_NDCG_DISC: list[float] = [1.0 / _math.log2(p + 1) for p in range(1, TOP_K + 1)]


def ann_ndcg_eval(spark: SparkSession, sf: str) -> DataFrame:
    """NDCG@10 of the IVF single-probe search against the brute-force
    ground truth — the graded-relevance twin of ``ann_recall_eval``:
    recall treats every true neighbor equally, NDCG also penalizes the
    approximate index for returning them in the wrong ORDER (gain
    11-rank_true, standard log2 position discounts).

    Determinism contract: the discount constants are driver-side
    literals (identical doubles in both plans); each gain x discount
    is a single IEEE multiply; the ≤10-term DCG/IDCG sums round to 12
    decimals and accumulate in DECIMAL(20,12), so partial-agg order
    cannot perturb them; the final division is one double op.

    Scale shape: the two underlying searches carry all the cost and
    are already scale-shaped (broadcast queries, cell-blocked
    compares); this evaluation joins n_queries x k RESULT rows."""
    truth = knn_brute_force(spark, sf).select(
        "query_id", "vec_id", F.col("rank").alias("t_rank")
    )
    res = knn_ivf(spark, sf).select("query_id", "vec_id", F.col("rank").alias("pos"))
    disc = F.array(*[F.lit(d) for d in _NDCG_DISC])
    gain = F.coalesce(F.lit(TOP_K + 1) - F.col("t_rank"), F.lit(0)).cast(
        "double"
    )
    dcg_term = F.round(
        gain * F.element_at(disc, F.col("pos")), 12
    ).cast("decimal(20,12)")
    dcg = (
        res.join(truth, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_results"),
            F.sum(dcg_term).alias("dcg_x"),
        )
    )
    ideal_term = F.round(
        (F.lit(TOP_K + 1) - F.col("t_rank")).cast("double")
        * F.element_at(disc, F.col("t_rank")),
        12,
    ).cast("decimal(20,12)")
    idcg = truth.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(ideal_term).alias("idcg_x"),
    )
    return (
        dcg.join(idcg, "query_id")
        .select(
            "query_id",
            "n_results",
            "n_truth",
            F.round(F.col("dcg_x").cast("double"), 6).alias("dcg"),
            F.round(F.col("idcg_x").cast("double"), 6).alias("idcg"),
            F.round(
                (F.col("dcg_x") / F.col("idcg_x")).cast("double"), 6
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )


def _ndcg_oracle_sql() -> str:
    disc_rows = ", ".join(
        f"({p + 1}, {_NDCG_DISC[p]!r})" for p in range(TOP_K)
    )
    return f"""
    WITH truth AS ({_KNN_BRUTE_SQL}),
    res AS ({_KNN_IVF_SQL}),
    disc(pos, d) AS (VALUES {disc_rows}),
    dcg AS (
        SELECT r.query_id, COUNT(*) AS n_results,
               SUM(CAST(ROUND(CAST(COALESCE({TOP_K + 1} - t.rank, 0)
                                   AS DOUBLE) * dd.d, 12)
                        AS DECIMAL(20,12))) AS dcg_x
        FROM res r
        JOIN disc dd ON dd.pos = r.rank
        LEFT JOIN truth t
               ON t.query_id = r.query_id AND t.vec_id = r.vec_id
        GROUP BY r.query_id
    ),
    idcg AS (
        SELECT t.query_id, COUNT(*) AS n_truth,
               SUM(CAST(ROUND(CAST({TOP_K + 1} - t.rank AS DOUBLE) * dd.d,
                              12) AS DECIMAL(20,12))) AS idcg_x
        FROM truth t JOIN disc dd ON dd.pos = t.rank
        GROUP BY t.query_id
    )
    SELECT d.query_id, d.n_results, i.n_truth,
           ROUND(CAST(d.dcg_x AS DOUBLE), 6) AS dcg,
           ROUND(CAST(i.idcg_x AS DOUBLE), 6) AS idcg,
           ROUND(CAST(d.dcg_x / i.idcg_x AS DOUBLE), 6) AS ndcg
    FROM dcg d JOIN idcg i USING (query_id)
    ORDER BY d.query_id
    """


ORACLE["ann_ndcg_eval"] = _ndcg_oracle_sql()
QUERIES["ann_ndcg_eval"] = ann_ndcg_eval


# ---------------------------------------------------------------------------
# Round 8: product-quantization (PQ) codebooks (Jégou et al. 2011) —
# completes the embedding-compression story next to int8 quantization
# and Matryoshka truncation: split the 64-d space into PQ_M subspaces,
# train a tiny k-means codebook per subspace (the kmeans_embeddings
# recipe, all subspaces in ONE lazy plan keyed by sub_id), then encode
# every vector as PQ_M code bytes and search with asymmetric distance
# lookups.
#
# Scale shape: the corpus is touched once to explode (vec_id, sub_id,
# subvector); every training round is a broadcast-hash join against the
# (PQ_M x PQ_K)-row centroid table + decimal-exact mean update (the
# shuffle carries PQ_M*PQ_K*PQ_SUBDIM cells, never vectors); encoding
# is the same join; ADC queries never touch raw vectors at all — only
# the (query x centroid) lookup table (PQ_M x PQ_K rows per query) and
# the code table.

PQ_M = 4          # subspaces
PQ_SUBDIM = DIM // PQ_M
PQ_K = 4          # codebook size per subspace
PQ_ITERS = 2      # Lloyd rounds (fixed, unrolled, lazy)


def _pq_subvectors(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, sub_id, sv): the corpus exploded into per-subspace
    slices, double precision."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub_id"),
        "v",
    ).select(
        "vec_id",
        F.col("sub_id").cast("int").alias("sub_id"),
        F.slice("v", F.col("sub_id") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
    )


def _pq_assign(subs: DataFrame, cent: DataFrame) -> DataFrame:
    """Argmin-code assignment of every (vec_id, sub_id) subvector
    against a codebook: broadcast join vs the <= PQ_M*PQ_K-row
    codebook, min-struct tie-break on cid."""
    d2 = F.aggregate(
        F.zip_with("sv", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    scored = subs.join(F.broadcast(cent), "sub_id").select(
        "vec_id", "sub_id", "cid", d2.alias("d2")
    )
    return (
        scored.groupBy("vec_id", "sub_id")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select(
            "vec_id",
            "sub_id",
            F.col("m.cid").alias("cid"),
            F.col("m.d2").alias("d2"),
        )
    )


def _pq_train(subs: DataFrame):
    """Returns (assigned, cent): the final per-(vec_id, sub_id) code
    assignment with its squared distance, and the trained codebook.
    Init = the PQ_K lowest vec_ids' subvectors (cid = vec_id), then
    PQ_ITERS assign/update rounds with DECIMAL(28,12)-exact means —
    the kmeans_embeddings determinism contract, per subspace.

    Note: ``assigned`` is the round-PQ_ITERS assignment, computed
    against the round-(PQ_ITERS-1) codebook — ``cent`` is half a Lloyd
    step newer (that IS the k-means trajectory).  Callers that need
    codes consistent with the FINAL codebook (ADC) must re-assign via
    ``_pq_assign(subs, cent)``."""
    cent = (
        subs.filter(F.col("vec_id") < PQ_K)
        .select("sub_id", F.col("vec_id").alias("cid"), F.col("sv").alias("c"))
    )
    assigned = None
    for _ in range(PQ_ITERS):
        assigned = _pq_assign(subs, cent)
        cent = (
            assigned.join(subs, ["vec_id", "sub_id"])
            .select("sub_id", "cid", F.posexplode("sv").alias("i", "x"))
            .groupBy("sub_id", "cid", "i")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .groupBy("sub_id", "cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
            .select(
                "sub_id",
                "cid",
                F.transform("pairs", lambda p: p["m"]).alias("c"),
            )
        )
    return assigned, cent


def _pq_sql_ctes(final_assign: bool = False) -> str:
    """DuckDB twin of ``_pq_subvectors`` + ``_pq_train``: CTEs subs,
    c0..c{PQ_ITERS} and a1..a{PQ_ITERS} (assignments).  With
    ``final_assign`` adds CTE ``af``: codes re-assigned against the
    FINAL codebook c{PQ_ITERS} (the ``_pq_assign(subs, cent)`` twin,
    for ADC consistency)."""
    d2 = (
        f"list_reduce(list_transform(generate_series(1, {PQ_SUBDIM}), "
        "i -> (s.sv[i] - c.c[i]) * (s.sv[i] - c.c[i])), (a, b) -> a + b)"
    )
    ctes = [
        f"""subs AS (
        SELECT vec_id, CAST(sub_id AS INT) AS sub_id,
               v[CAST(sub_id * {PQ_SUBDIM} + 1 AS INT)
                 :CAST(sub_id * {PQ_SUBDIM} + {PQ_SUBDIM} AS INT)] AS sv
        FROM (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   unnest(generate_series(0, {PQ_M - 1})) AS sub_id
            FROM embeddings
        )
    )""",
        f"""c0 AS (
        SELECT sub_id, vec_id AS cid, sv AS c FROM subs
        WHERE vec_id < {PQ_K}
    )""",
    ]
    prev = "c0"
    for r in range(1, PQ_ITERS + 1):
        ctes.append(f"""a{r} AS (
        SELECT vec_id, sub_id, cid, d2 FROM (
            SELECT s.vec_id, s.sub_id, c.cid, {d2} AS d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id, s.sub_id
                       ORDER BY {d2}, c.cid) AS rn
            FROM subs s JOIN {prev} c ON s.sub_id = c.sub_id
        ) WHERE rn = 1
    )""")
        ctes.append(f"""c{r} AS (
        SELECT sub_id, cid, list(m ORDER BY i) AS c FROM (
            SELECT sub_id, cid, i,
                   CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                       / COUNT(*) AS m
            FROM (
                SELECT a.sub_id, a.cid,
                       unnest(list_transform(
                           generate_series(1, {PQ_SUBDIM}),
                           j -> {{'i': j, 'x': s.sv[j]}}),
                           recursive := true)
                FROM a{r} a JOIN subs s
                  ON a.vec_id = s.vec_id AND a.sub_id = s.sub_id
            )
            GROUP BY sub_id, cid, i
        )
        GROUP BY sub_id, cid
    )""")
        prev = f"c{r}"
    if final_assign:
        ctes.append(f"""af AS (
        SELECT vec_id, sub_id, cid, d2 FROM (
            SELECT s.vec_id, s.sub_id, c.cid, {d2} AS d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id, s.sub_id
                       ORDER BY {d2}, c.cid) AS rn
            FROM subs s JOIN c{PQ_ITERS} c ON s.sub_id = c.sub_id
        ) WHERE rn = 1
    )""")
    return ",\n".join(ctes)


def pq_codebook_train(spark: SparkSession, sf: str) -> DataFrame:
    """PQ codebook training summary: per (subspace, code), how many
    vectors the code captures and their mean distance to it — the
    per-cell health view (a dead code means the init collapsed; one
    giant code means the subspace needs more centroids)."""
    assigned, _ = _pq_train(_pq_subvectors(spark, sf))
    return (
        assigned.groupBy("sub_id", "cid")
        .agg(
            F.count("*").alias("n_points"),
            F.round(
                F.sum(F.sqrt("d2").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_dist"),
        )
        .orderBy("sub_id", "cid")
    )


ORACLE["pq_codebook_train"] = (
    "WITH " + _pq_sql_ctes() + f"""
    SELECT sub_id, cid, COUNT(*) AS n_points,
           ROUND(CAST(SUM(CAST(sqrt(d2) AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_dist
    FROM a{PQ_ITERS}
    GROUP BY sub_id, cid ORDER BY sub_id, cid"""
)

QUERIES["pq_codebook_train"] = pq_codebook_train


def pq_reconstruction_error(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end PQ quantization error per label class: each vector's
    reconstruction error is the sum of its per-subspace squared
    distances to the assigned codes. Per label: vectors, mean and max
    total squared error — read next to int8_quantization_error and
    matryoshka_truncation_error to pick the compression point.

    Determinism: each per-subspace d2 rounds to 9 decimals and the
    4-term per-vector sum accumulates in DECIMAL(28,9) (order-free);
    the label mean divides once in double."""
    assigned, _ = _pq_train(_pq_subvectors(spark, sf))
    per_vec = assigned.groupBy("vec_id").agg(
        F.sum(F.round("d2", 9).cast("decimal(28,9)")).alias("tot")
    )
    emb = table(spark, sf, "embeddings").select("vec_id", "label")
    return (
        per_vec.join(emb, "vec_id")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(
                F.sum("tot").cast("double") / F.count("*"), 6
            ).alias("avg_sq_err"),
            F.round(F.max("tot").cast("double"), 6).alias("max_sq_err"),
        )
        .orderBy("label")
    )


ORACLE["pq_reconstruction_error"] = (
    "WITH " + _pq_sql_ctes() + f""",
    per_vec AS (
        SELECT vec_id,
               SUM(CAST(ROUND(d2, 9) AS DECIMAL(28,9))) AS tot
        FROM a{PQ_ITERS} GROUP BY vec_id
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(tot) AS DOUBLE) / COUNT(*), 6) AS avg_sq_err,
           ROUND(CAST(MAX(tot) AS DOUBLE), 6) AS max_sq_err
    FROM per_vec JOIN embeddings USING (vec_id)
    GROUP BY label ORDER BY label"""
)

QUERIES["pq_reconstruction_error"] = pq_reconstruction_error


def pq_code_usage(spark: SparkSession, sf: str) -> DataFrame:
    """Codebook utilization per subspace: codes actually used, the
    biggest code's share, and the usage entropy in bits — a balanced
    codebook (entropy near log2 PQ_K) compresses best; a skewed one
    wastes code space. Entropy terms round to 9 decimals before
    DECIMAL accumulation (the reid_risk_entropy libm convention)."""
    assigned, _ = _pq_train(_pq_subvectors(spark, sf))
    counts = assigned.groupBy("sub_id", "cid").agg(F.count("*").alias("k"))
    totals = counts.groupBy("sub_id").agg(F.sum("k").alias("n"))
    j = counts.join(totals, "sub_id")
    p = F.col("k").cast("double") / F.col("n").cast("double")
    term = F.round(-(p * F.log2(p)), 9).cast("decimal(20,9)")
    return (
        j.groupBy("sub_id")
        .agg(
            F.count("*").alias("n_codes_used"),
            F.round(
                F.max("k").cast("double") / F.max("n").cast("double"), 6
            ).alias("top_share"),
            F.round(F.sum(term).cast("double"), 6).alias("usage_entropy_bits"),
        )
        .orderBy("sub_id")
    )


ORACLE["pq_code_usage"] = (
    "WITH " + _pq_sql_ctes() + f""",
    counts AS (
        SELECT sub_id, cid, COUNT(*) AS k FROM a{PQ_ITERS}
        GROUP BY sub_id, cid
    ),
    totals AS (SELECT sub_id, SUM(k) AS n FROM counts GROUP BY sub_id)
    SELECT sub_id, COUNT(*) AS n_codes_used,
           ROUND(CAST(MAX(k) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 6)
               AS top_share,
           ROUND(CAST(SUM(CAST(ROUND(
                    -(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                    * LOG2(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                 AS DECIMAL(20,9))) AS DOUBLE), 6) AS usage_entropy_bits
    FROM counts JOIN totals USING (sub_id)
    GROUP BY sub_id ORDER BY sub_id"""
)

QUERIES["pq_code_usage"] = pq_code_usage


def pq_adc_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric-distance search quality: for each query vector
    (vec_id < N_QUERIES), the ADC top-10 (sum of per-subspace
    query-to-code lookup distances — the query never meets a raw
    vector) vs the exact L2 top-10; recall@10 is the overlap. The
    metric that decides whether this codebook can serve retrieval.

    Scale shape: ADC scoring joins the CODE table (PQ_M small ints per
    vector) to a broadcast (query x centroid) lookup of
    N_QUERIES*PQ_M*PQ_K rows; per-vector ADC sums 4 lookup values
    (9-decimal rounded, DECIMAL-accumulated). Only the exact-baseline
    side scans raw vectors (broadcast-query pattern shared with
    knn_brute_force).

    Codes are RE-ASSIGNED against the final trained codebook before
    ADC scoring (one extra broadcast-join pass over the subvectors):
    ``_pq_train``'s last assignment was computed against the
    one-update-older codebook, and scoring those codes with the final
    codebook's lookup table would measure a mixed-generation ADC."""
    subs = _pq_subvectors(spark, sf)
    _, cent = _pq_train(subs)
    assigned = _pq_assign(subs, cent)
    q = subs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "sub_id", F.col("sv").alias("qv")
    )
    qd2 = F.aggregate(
        F.zip_with("qv", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    lookup = q.join(cent, "sub_id").select(
        "query_id", "sub_id", "cid", F.round(qd2, 9).alias("qd")
    )
    adc = (
        assigned.join(F.broadcast(lookup), ["sub_id", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("qd").cast("decimal(28,9)")).alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    adc_top = adc.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_K
    )
    emb = widen_small_scan(table(spark, sf, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qfull = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ed2 = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    exact = (
        F.broadcast(qfull)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", ed2.alias("d2"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    exact_top = exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= TOP_K
    )
    return (
        exact_top.select("query_id", "vec_id")
        .join(
            adc_top.select("query_id", "vec_id", F.lit(1).alias("hit")),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_overlap"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))).cast("double") / TOP_K, 4
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


ORACLE["pq_adc_recall"] = (
    "WITH " + _pq_sql_ctes(final_assign=True) + f""",
    q AS (
        SELECT vec_id AS query_id, sub_id, sv AS qv FROM subs
        WHERE vec_id < {N_QUERIES}
    ),
    lookup AS (
        SELECT q.query_id, c.sub_id, c.cid,
               ROUND(list_reduce(list_transform(
                   generate_series(1, {PQ_SUBDIM}),
                   i -> (q.qv[i] - c.c[i]) * (q.qv[i] - c.c[i])),
                   (a, b) -> a + b), 9) AS qd
        FROM q JOIN c{PQ_ITERS} c ON q.sub_id = c.sub_id
    ),
    adc AS (
        SELECT l.query_id, a.vec_id,
               SUM(CAST(l.qd AS DECIMAL(28,9))) AS adc
        FROM af a
        JOIN lookup l ON a.sub_id = l.sub_id AND a.cid = l.cid
        WHERE a.vec_id != l.query_id
        GROUP BY l.query_id, a.vec_id
    ),
    adc_top AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc, vec_id) AS rn
            FROM adc
        ) WHERE rn <= {TOP_K}
    ),
    emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    exact AS (
        SELECT q.vec_id AS query_id, e.vec_id,
               list_reduce(list_transform(generate_series(1, {DIM}),
                   i -> (q.v[i] - e.v[i]) * (q.v[i] - e.v[i])),
                   (a, b) -> a + b) AS d2
        FROM emb q JOIN emb e ON e.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    exact_top AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY d2, vec_id) AS rn
            FROM exact
        ) WHERE rn <= {TOP_K}
    )
    SELECT e.query_id,
           CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           ROUND(CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / {TOP_K}, 4) AS recall_at_10
    FROM exact_top e
    LEFT JOIN adc_top a
      ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id ORDER BY e.query_id"""
)

QUERIES["pq_adc_recall"] = pq_adc_recall


# ---------------------------------------------------------------------------
# Round 8: residual quantization (RVQ) — the additive-codebook
# counterpart of PQ (used by modern neural codecs and coarse+fine ANN):
# stage 1 quantizes the vector with a coarse full-dimension codebook,
# stage 2 quantizes the RESIDUAL (v − c1) with a second codebook, and
# the reconstruction is c1 + c2.  Where PQ splits dimensions, RVQ
# stacks refinements — the error after each stage is the curve that
# picks the number of stages.

RQ_K = 4       # centroids per stage
RQ_ITERS = 2   # Lloyd rounds per stage (fixed, unrolled)


def _rq_stage(vecs: DataFrame, id_col: str = "vec_id"):
    """One RVQ stage: train an RQ_K-centroid codebook on ``vecs``
    ((id, v) full-dimension) with RQ_ITERS Lloyd rounds (lowest-id
    init, decimal-exact means — the kmeans determinism contract) and
    return (assigned, cent): per-id (cid, d2) and the codebook."""
    cent = (
        vecs.filter(F.col(id_col) < RQ_K)
        .select(F.col(id_col).alias("cid"), F.col("v").alias("c"))
    )
    d2 = F.aggregate(
        F.zip_with("v", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    assigned = None
    for _ in range(RQ_ITERS):
        scored = vecs.crossJoin(F.broadcast(cent)).select(
            id_col, "cid", d2.alias("d2")
        )
        assigned = (
            scored.groupBy(id_col)
            .agg(F.min(F.struct("d2", "cid")).alias("m"))
            .select(
                id_col,
                F.col("m.cid").alias("cid"),
                F.col("m.d2").alias("d2"),
            )
        )
        cent = (
            assigned.join(vecs, id_col)
            .select("cid", F.posexplode("v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
            .select("cid", F.transform("pairs", lambda p: p["m"]).alias("c"))
        )
    return assigned, cent


def rq_two_stage_error(spark: SparkSession, sf: str) -> DataFrame:
    """Residual-quantization error curve: per stage (1 = coarse only,
    2 = coarse + residual codebook), the corpus mean / max squared
    reconstruction error — read next to pq_reconstruction_error,
    int8_quantization_error and matryoshka_truncation_error to choose
    the compression family.  Stage-2 residuals are exact IEEE
    subtractions of the assigned stage-1 centroid; per-vector errors
    round to 9 decimals into DECIMAL before any corpus aggregate.

    Shape: two chained codebook trainings, each the kmeans broadcast
    pattern (corpus × RQ_K-row centroid table); residuals never
    shuffle — the subtraction happens in the projection feeding
    stage 2's (already shuffled) update agg."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a1, c1 = _rq_stage(emb)
    resid = (
        a1.join(emb, "vec_id")
        .join(F.broadcast(c1), "cid")
        .select(
            "vec_id",
            F.zip_with("v", "c", lambda x, y: x - y).alias("v"),
            F.col("d2").alias("d2_s1"),
        )
    )
    a2, _ = _rq_stage(resid.select("vec_id", "v"))
    s1 = resid.select(
        "vec_id", F.round("d2_s1", 9).cast("decimal(28,9)").alias("err")
    )
    s2 = a2.select(
        "vec_id", F.round("d2", 9).cast("decimal(28,9)").alias("err")
    )
    out = None
    for stage, df in ((1, s1), (2, s2)):
        row = df.agg(
            F.lit(stage).alias("stage"),
            F.count("*").alias("n_vecs"),
            F.round(
                F.sum("err").cast("double") / F.count("*"), 6
            ).alias("avg_sq_err"),
            F.round(F.max("err").cast("double"), 6).alias("max_sq_err"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage")


def _rq_sql_stage(src: str, pfx: str) -> str:
    """CTEs for one RVQ stage over ``src`` (id, v): {pfx}c0..cN,
    {pfx}a1..aN."""
    d2 = (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        "i -> (s.v[i] - c.c[i]) * (s.v[i] - c.c[i])), (a, b) -> a + b)"
    )
    ctes = [
        f"""{pfx}c0 AS (
        SELECT vec_id AS cid, v AS c FROM {src} WHERE vec_id < {RQ_K}
    )"""
    ]
    prev = f"{pfx}c0"
    for r in range(1, RQ_ITERS + 1):
        ctes.append(f"""{pfx}a{r} AS (
        SELECT vec_id, cid, d2 FROM (
            SELECT s.vec_id, c.cid, {d2} AS d2,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                      ORDER BY {d2}, c.cid) AS rn
            FROM {src} s CROSS JOIN {prev} c
        ) WHERE rn = 1
    )""")
        ctes.append(f"""{pfx}c{r} AS (
        SELECT cid, list(m ORDER BY i) AS c FROM (
            SELECT cid, i,
                   CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                       / COUNT(*) AS m
            FROM (
                SELECT a.cid,
                       unnest(list_transform(generate_series(1, {DIM}),
                           j -> {{'i': j, 'x': s.v[j]}}),
                           recursive := true)
                FROM {pfx}a{r} a JOIN {src} s ON a.vec_id = s.vec_id
            )
            GROUP BY cid, i
        )
        GROUP BY cid
    )""")
        prev = f"{pfx}c{r}"
    return ",\n".join(ctes)


ORACLE["rq_two_stage_error"] = f"""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    {_rq_sql_stage("emb", "s1")},
    resid AS (
        SELECT a.vec_id,
               list_transform(generate_series(1, {DIM}),
                   i -> e.v[i] - c.c[i]) AS v,
               a.d2 AS d2_s1
        FROM s1a{RQ_ITERS} a
        JOIN emb e ON a.vec_id = e.vec_id
        JOIN s1c{RQ_ITERS} c ON a.cid = c.cid
    ),
    {_rq_sql_stage("resid", "s2")}
    SELECT 1 AS stage, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(ROUND(d2_s1, 9) AS DECIMAL(28,9)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_sq_err,
           ROUND(CAST(MAX(CAST(ROUND(d2_s1, 9) AS DECIMAL(28,9)))
                      AS DOUBLE), 6) AS max_sq_err
    FROM resid
    UNION ALL
    SELECT 2 AS stage, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(ROUND(d2, 9) AS DECIMAL(28,9)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_sq_err,
           ROUND(CAST(MAX(CAST(ROUND(d2, 9) AS DECIMAL(28,9)))
                      AS DOUBLE), 6) AS max_sq_err
    FROM s2a{RQ_ITERS}
    ORDER BY stage
"""

QUERIES["rq_two_stage_error"] = rq_two_stage_error


def ivf_pq_search(spark: SparkSession, sf: str) -> DataFrame:
    """IVF+PQ composed search (the FAISS IVFADC architecture, Jegou et
    al. 2011): the coarse IVF cell restricts each query to its own
    inverted list, and PQ asymmetric distance ranks ONLY those
    cell-mates — the memory/scan shape every billion-vector deployment
    actually serves.  Emits, per query, the cell candidate count, the
    overlap of the IVF-ADC top-10 with the exact L2 top-10, and
    recall@10 — so both compression loss (PQ) and probe loss (IVF)
    land in one auditable number.

    100 TB shape: candidates come from ONE cell (at scale: one
    partition read — the corpus is stored partitioned by cell); ADC
    scores the candidates' CODE rows (PQ_M small ints each) against a
    broadcast (query x centroid) lookup; only the ground-truth side
    ever scans raw vectors.  Codes are re-assigned against the final
    codebook (the pq_adc_recall consistency contract)."""
    cells = _cell_assignment(spark, sf).select("vec_id", "cell")
    subs = _pq_subvectors(spark, sf)
    _, cent = _pq_train(subs)
    codes = _pq_assign(subs, cent)
    q = subs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "sub_id", F.col("sv").alias("qv")
    )
    qd2 = F.aggregate(
        F.zip_with("qv", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    lookup = q.join(cent, "sub_id").select(
        "query_id", "sub_id", "cid", F.round(qd2, 9).alias("qd")
    )
    qcells = cells.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("cell").alias("qcell")
    )
    cand = cells.join(
        F.broadcast(qcells),
        (F.col("cell") == F.col("qcell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "vec_id")
    n_cand = cand.groupBy("query_id").agg(
        F.count("*").alias("n_cell_candidates")
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lookup), ["query_id", "sub_id", "cid"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("qd").cast("decimal(28,9)")).alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    adc_top = adc.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_K
    )
    emb = widen_small_scan(table(spark, sf, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qfull = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ed2 = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    exact = (
        F.broadcast(qfull)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", ed2.alias("d2"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    exact_top = exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= TOP_K
    )
    return (
        exact_top.select("query_id", "vec_id")
        .join(
            adc_top.select("query_id", "vec_id", F.lit(1).alias("hit")),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias(
                "n_overlap"
            ),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))).cast("double") / TOP_K, 4
            ).alias("recall_at_10"),
        )
        .join(F.broadcast(n_cand), "query_id")
        .select("query_id", "n_cell_candidates", "n_overlap", "recall_at_10")
        .orderBy("query_id")
    )


ORACLE["ivf_pq_search"] = (
    "WITH assigned AS (" + _ASSIGN_SQL + "),\n" +
    _pq_sql_ctes(final_assign=True) + f""",
    q AS (
        SELECT vec_id AS query_id, sub_id, sv AS qv FROM subs
        WHERE vec_id < {N_QUERIES}
    ),
    lookup AS (
        SELECT q.query_id, c.sub_id, c.cid,
               ROUND(list_reduce(list_transform(
                   generate_series(1, {PQ_SUBDIM}),
                   i -> (q.qv[i] - c.c[i]) * (q.qv[i] - c.c[i])),
                   (a, b) -> a + b), 9) AS qd
        FROM q JOIN c{PQ_ITERS} c ON q.sub_id = c.sub_id
    ),
    qcells AS (
        SELECT vec_id AS query_id, cell AS qcell FROM assigned
        WHERE vec_id < {N_QUERIES}
    ),
    cand AS (
        SELECT qc.query_id, a.vec_id
        FROM assigned a JOIN qcells qc
          ON a.cell = qc.qcell AND a.vec_id != qc.query_id
    ),
    n_cand AS (
        SELECT query_id, COUNT(*) AS n_cell_candidates
        FROM cand GROUP BY query_id
    ),
    adc AS (
        SELECT cand.query_id, cand.vec_id,
               SUM(CAST(l.qd AS DECIMAL(28,9))) AS adc
        FROM cand
        JOIN af a ON cand.vec_id = a.vec_id
        JOIN lookup l ON l.query_id = cand.query_id
         AND l.sub_id = a.sub_id AND l.cid = a.cid
        GROUP BY cand.query_id, cand.vec_id
    ),
    adc_top AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc, vec_id) AS rn
            FROM adc
        ) WHERE rn <= {TOP_K}
    ),
    emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    exact AS (
        SELECT q.vec_id AS query_id, e.vec_id,
               list_reduce(list_transform(generate_series(1, {DIM}),
                   i -> (q.v[i] - e.v[i]) * (q.v[i] - e.v[i])),
                   (a, b) -> a + b) AS d2
        FROM emb q JOIN emb e ON e.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    exact_top AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY d2, vec_id) AS rn
            FROM exact
        ) WHERE rn <= {TOP_K}
    ),
    rec AS (
        SELECT e.query_id,
               CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_overlap,
               ROUND(CAST(SUM(CASE WHEN a.vec_id IS NOT NULL
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / {TOP_K}, 4) AS recall_at_10
        FROM exact_top e
        LEFT JOIN adc_top a
          ON e.query_id = a.query_id AND e.vec_id = a.vec_id
        GROUP BY e.query_id
    )
    SELECT rec.query_id, n_cand.n_cell_candidates, rec.n_overlap,
           rec.recall_at_10
    FROM rec JOIN n_cand ON rec.query_id = n_cand.query_id
    ORDER BY rec.query_id"""
)

QUERIES["ivf_pq_search"] = ivf_pq_search


IVF_NEW_MOD = 5  # vec_id % 5 == 0 simulates the newly-ingested batch


def ivf_rebalance_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Index-maintenance audit for the IVF cells: treat every fifth
    vector as the newly-ingested batch and report, per cell, the old
    occupancy, the new arrivals, and the new-arrival share — the table
    an index owner reads to decide when cell centroids must be
    retrained (a cell absorbing a disproportionate share of new data
    is drifting away from its centroid, and its probe latency grows
    with it).  The per-cell new-share is compared against the global
    new share via exact integer cross-products.

    One assignment pass (broadcast centroids) + one bounded N_CELLS
    aggregate; the global share joins back as a broadcast singleton."""
    assigned = _cell_assignment(spark, sf).select(
        "vec_id",
        "cell",
        (F.col("vec_id") % IVF_NEW_MOD == 0).cast("bigint").alias("is_new"),
    )
    per_cell = assigned.groupBy("cell").agg(
        F.count("*").alias("n_total"),
        F.sum("is_new").alias("n_new"),
    )
    glob = assigned.agg(
        F.count("*").alias("g_total"), F.sum("is_new").alias("g_new")
    )
    return (
        per_cell.crossJoin(F.broadcast(glob))
        .select(
            "cell",
            (F.col("n_total") - F.col("n_new")).alias("n_old"),
            "n_new",
            "n_total",
            F.round(
                F.col("n_new").cast("double") / F.col("n_total").cast("double"),
                6,
            ).alias("new_share"),
            # cell absorbs new data faster than the corpus overall
            (
                F.col("n_new") * F.col("g_total")
                > F.col("n_total") * F.col("g_new")
            ).alias("over_absorbing"),
        )
        .orderBy("cell")
    )


ORACLE["ivf_rebalance_audit"] = f"""
    WITH assigned AS ({_ASSIGN_SQL}),
    tagged AS (
        SELECT cell,
               CASE WHEN vec_id % {IVF_NEW_MOD} = 0 THEN 1 ELSE 0 END AS is_new
        FROM assigned
    ),
    per_cell AS (
        SELECT cell, COUNT(*) AS n_total,
               CAST(SUM(is_new) AS BIGINT) AS n_new
        FROM tagged GROUP BY cell
    ),
    gl AS (
        SELECT COUNT(*) AS g_total, CAST(SUM(is_new) AS BIGINT) AS g_new
        FROM tagged
    )
    SELECT cell,
           CAST(n_total - n_new AS BIGINT) AS n_old,
           n_new,
           n_total,
           ROUND(CAST(n_new AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
               AS new_share,
           n_new * g_total > n_total * g_new AS over_absorbing
    FROM per_cell CROSS JOIN gl
    ORDER BY cell
"""

QUERIES["ivf_rebalance_audit"] = ivf_rebalance_audit


# ---------------------------------------------------------------------------
# Round 10: graph-traversal ANN (NSW/HNSW-class) — the third ANN
# family next to LSH and IVF(+PQ).  A full HNSW build is inherently
# sequential (insert-order dependent), so the registry-honest slice is
# the part a distributed engine actually runs: BOUNDED-HOP BEAM SEARCH
# over a precomputed k-NN neighborhood graph, audited for recall
# against the exact top-k.  At production scale the graph comes from
# NN-descent or the IVF family itself; here it is built exactly (one
# bounded self-join over a capped node subset) so the traversal audit
# has a ground-truth graph to walk.
#
# Every hop is set-based: frontier JOIN edges (equi-join on src) ->
# candidate set -> score (broadcast query join) -> top-BEAM window per
# query.  Hops are unrolled NSW_HOPS times with the frontier (a
# <= N_QUERIES x NSW_BEAM row table) localCheckpoint-ed per hop —
# the bradley_terry bounded-state convention, since each hop reads
# the previous frontier twice (keep + expand).

NSW_NODE_CAP = 256   # graph node subset: vec_id < cap (exact build)
NSW_DEGREE = 8       # k-NN graph out-degree
NSW_BEAM = 12        # beam width maintained per hop
NSW_HOPS = 3         # unrolled traversal depth
NSW_ENTRY = N_QUERIES  # fixed entry node (first non-query vec_id)


def nsw_beam_search_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Beam-search ANN over the k-NN graph, per query: candidates
    scored, exact-top-10 hits, recall@10, and best-found vs true-best
    cosine.  Greedy-beam semantics: each hop expands the frontier by
    its graph neighbors, dedups, rescores, and keeps the NSW_BEAM
    best (cos desc, vec_id tiebreak, all cosines ROUND(6) — the
    bit-identical cross-engine convention of knn_brute_force)."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).withColumn(
        "nrm", _norm64(F.col("embedding"))
    )
    nodes = emb.filter(F.col("vec_id") < NSW_NODE_CAP).select(
        F.col("vec_id").alias("node"), "embedding", "nrm"
    )
    a, b = nodes.alias("a"), nodes.alias("b")
    cos_e = F.round(
        _dot64(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    w_e = Window.partitionBy("src").orderBy(F.desc("cos_e"), F.asc("dst"))
    edges = (
        a.join(F.broadcast(b), F.col("a.node") != F.col("b.node"))
        .select(
            F.col("a.node").alias("src"),
            F.col("b.node").alias("dst"),
            cos_e.alias("cos_e"),
        )
        .withColumn("rk", F.row_number().over(w_e))
        .filter(F.col("rk") <= NSW_DEGREE)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )

    def _score(cand: DataFrame) -> DataFrame:
        cos = F.round(
            _dot64(F.col("qv"), F.col("embedding"))
            / (F.col("qnrm") * F.col("nrm")),
            6,
        )
        return (
            cand.join(nodes, "node")
            .join(F.broadcast(q), "query_id")
            .select("query_id", "node", cos.alias("cos"))
        )

    w_q = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("node")
    )
    frontier = q.select(
        "query_id", F.lit(NSW_ENTRY).cast("long").alias("node")
    )
    visited = None
    for _ in range(NSW_HOPS):
        cand = (
            frontier.select("query_id", "node")
            .unionByName(
                frontier.join(
                    edges, frontier["node"] == edges["src"]
                ).select("query_id", F.col("dst").alias("node"))
            )
            .filter(F.col("node") != F.col("query_id"))
            .distinct()
        )
        visited = cand if visited is None else visited.unionByName(cand)
        frontier = (
            _score(cand)
            .withColumn("rk", F.row_number().over(w_q))
            .filter(F.col("rk") <= NSW_BEAM)
            .select("query_id", "node", "cos")
            .localCheckpoint(eager=True)
        )
    approx = frontier.withColumn("rk", F.row_number().over(w_q)).filter(
        F.col("rk") <= TOP_K
    )
    cos_x = F.round(
        _dot64(F.col("qv"), F.col("embedding"))
        / (F.col("qnrm") * F.col("nrm")),
        6,
    )
    exact = (
        F.broadcast(q)
        .join(nodes, F.col("node") != F.col("query_id"))
        .select("query_id", "node", cos_x.alias("cos"))
        .withColumn("rk", F.row_number().over(w_q))
        .filter(F.col("rk") <= TOP_K)
    )
    vis_cnt = (
        visited.distinct()
        .groupBy("query_id")
        .agg(F.count("*").alias("n_scored"))
    )
    hits = (
        approx.select("query_id", "node")
        .join(exact.select("query_id", "node"), ["query_id", "node"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    ap_best = approx.groupBy("query_id").agg(
        F.max("cos").alias("approx_best_cos")
    )
    ex_best = exact.groupBy("query_id").agg(
        F.max("cos").alias("exact_best_cos")
    )
    return (
        vis_cnt.join(hits, "query_id", "left")
        .join(ap_best, "query_id")
        .join(ex_best, "query_id")
        .select(
            "query_id",
            "n_scored",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(float(TOP_K)),
                6,
            ).alias("recall_at_k"),
            "approx_best_cos",
            "exact_best_cos",
        )
        .orderBy("query_id")
    )


def _nsw_oracle() -> str:
    hop_ctes = []
    prev = "f0"
    for h in range(1, NSW_HOPS + 1):
        hop_ctes.append(f"""c{h} AS (
        SELECT DISTINCT query_id, node FROM (
            SELECT query_id, node FROM {prev}
            UNION ALL
            SELECT f.query_id, e.dst AS node
            FROM {prev} f JOIN nedges e ON e.src = f.node
        ) WHERE node != query_id
    ),
    s{h} AS (
        SELECT c.query_id, c.node,
               ROUND({_cos_sql("q.embedding", "n.embedding")}, 6) AS cos
        FROM c{h} c
        JOIN nnodes n ON n.node = c.node
        JOIN nq q ON q.query_id = c.query_id
    ),
    f{h} AS (
        SELECT query_id, node, cos FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cos DESC, node) AS rk
            FROM s{h}
        ) WHERE rk <= {NSW_BEAM}
    )""")
        prev = f"f{h}"
    vis_union = "\nUNION ALL\n            ".join(
        f"SELECT query_id, node FROM c{h}" for h in range(1, NSW_HOPS + 1)
    )
    hops_joined = ",\n    ".join(hop_ctes)
    return f"""
    WITH nnodes AS (
        SELECT vec_id AS node, embedding FROM embeddings
        WHERE vec_id < {NSW_NODE_CAP}
    ),
    nedges AS (
        SELECT src, dst FROM (
            SELECT a.node AS src, b.node AS dst,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.node
                       ORDER BY ROUND({_cos_sql("a.embedding", "b.embedding")}, 6) DESC,
                                b.node) AS rk
            FROM nnodes a JOIN nnodes b ON a.node != b.node
        ) WHERE rk <= {NSW_DEGREE}
    ),
    nq AS (
        SELECT vec_id AS query_id, embedding FROM embeddings
        WHERE vec_id < {N_QUERIES}
    ),
    f0 AS (
        SELECT query_id, CAST({NSW_ENTRY} AS BIGINT) AS node FROM nq
    ),
    {hops_joined},
    approx AS (
        SELECT query_id, node, cos FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cos DESC, node) AS rk
            FROM f{NSW_HOPS}
        ) WHERE rk <= {TOP_K}
    ),
    x AS (
        SELECT query_id, node, cos FROM (
            SELECT q.query_id, n.node,
                   ROUND({_cos_sql("q.embedding", "n.embedding")}, 6) AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY ROUND({_cos_sql("q.embedding", "n.embedding")}, 6) DESC,
                                n.node) AS rk
            FROM nq q JOIN nnodes n ON n.node != q.query_id
        ) WHERE rk <= {TOP_K}
    ),
    vis AS (
        SELECT query_id, COUNT(*) AS n_scored FROM (
            SELECT DISTINCT query_id, node FROM (
            {vis_union}
            )
        ) GROUP BY query_id
    ),
    hits AS (
        SELECT a.query_id, COUNT(*) AS n_hits
        FROM approx a JOIN x USING (query_id, node)
        GROUP BY a.query_id
    ),
    ab AS (SELECT query_id, MAX(cos) AS approx_best_cos
           FROM approx GROUP BY query_id),
    xb AS (SELECT query_id, MAX(cos) AS exact_best_cos
           FROM x GROUP BY query_id)
    SELECT v.query_id, v.n_scored,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {float(TOP_K)}, 6)
               AS recall_at_k,
           ab.approx_best_cos, xb.exact_best_cos
    FROM vis v
    LEFT JOIN hits h ON h.query_id = v.query_id
    JOIN ab ON ab.query_id = v.query_id
    JOIN xb ON xb.query_id = v.query_id
    ORDER BY v.query_id
"""


ORACLE["nsw_beam_search_recall"] = _nsw_oracle()
QUERIES["nsw_beam_search_recall"] = nsw_beam_search_recall
