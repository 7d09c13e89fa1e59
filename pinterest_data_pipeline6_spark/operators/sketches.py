"""Deterministic probabilistic-filter operators: Bloom-filter join
pruning and a count-min frequency sketch, both built on a PORTABLE
arithmetic hash family so the Spark plan and the DuckDB oracle compute
bit-for-bit identical sketches (engine-native hash functions differ, so
``xxhash64``/``hash`` could never cross-check).

Why these exist in a 100 TB engine:

- **Bloom pruning** is the standard way to cut a fact-table probe
  before an expensive shuffle join: the build side's keys compress into
  a few KB of bitset that BROADCASTS to every probe task, and only
  bloom-passing rows enter the join shuffle. Spark's own runtime filter
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
  opaquely; this operator materializes the same construction as data so
  its selectivity/false-positive behavior is testable and auditable.
- **Count-min** gives per-key frequency estimates in O(d*w) fixed
  memory regardless of key cardinality — the mergeable-sketch shape
  (partial aggregation per partition, bit-wise/element-wise merge at
  the reducer) that exact per-key counting cannot match when the key
  space itself is too large to shuffle.

Scale notes (100 TB):
- The Bloom bitset is ``M_BITS/62`` = 256 rows no matter the build-side
  cardinality — it broadcasts; the probe-side position explode is a
  map-only projection and the per-key verdict is one partial+final agg
  keyed on the probe key. No shuffle ever carries the build-side rows
  to the probe.
- The CMS build explodes each event row into D (row, col) cells, but
  map-side partial aggregation collapses them to at most D*W = 2048
  cells per task BEFORE the shuffle — the reduce step merges fixed-size
  sketches, never raw rows. Estimation for the reported top-k joins the
  2048-row sketch broadcast-side.

Determinism contract: the hash family is pure 63-bit-safe integer
arithmetic (``((k % P) * A_i + B_i) % P % width`` with A_i < 2^20, so
products stay under 2^51 — no overflow under ANSI mode in either
engine); all counters are BIGINTs; output ratios are rounded doubles of
exact integer quotients.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline6_spark.sources.readers import table

# Portable multiply-add hash family over the Mersenne prime 2^31-1.
# Multipliers stay below 2^20 so (k % P) * A < 2^51 — safely inside
# BIGINT for both engines even with ANSI overflow checking on.
HASH_P = 2_147_483_647
HASH_A = (999_983, 999_979, 909_091, 777_767)
HASH_B = (17, 8_191, 524_287, 131_071)

# Bloom geometry: 62 usable bits per BIGINT word (bits 0..61 — never
# shifting into the sign bit keeps `1 << bit` portable), 256 words.
BLOOM_WORD_BITS = 62
BLOOM_WORDS = 256
BLOOM_BITS = BLOOM_WORD_BITS * BLOOM_WORDS
BLOOM_K = 3

# Count-min geometry: 4 hash rows x 512 columns = 2048 counters.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOP_K = 20


def _hash_expr(key: str, i: int, width: int) -> str:
    """SQL text of portable hash i of BIGINT column `key` into [0, width)."""
    a, b = HASH_A[i], HASH_B[i]
    return f"((({key} % {HASH_P}) * {a} + {b}) % {HASH_P}) % {width}"


def bloom_prune_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Build a 15 872-bit Bloom filter over the order keys of
    urgent 1995 orders, probe it with every distinct lineitem order
    key, and report build/probe cardinalities, true matches, bloom
    passes, and the realized false-positive rate.

    The build side explodes each key into K=3 bit positions and
    bit_or-folds them into 256 BIGINT words (the whole filter is 2 KB —
    broadcast-sized by construction, independent of build cardinality).
    The probe side recomputes the same positions, joins the broadcast
    word table, and a key passes iff all K probed bits are set. The
    exact-match twin is a left-semi hash join, so the output exposes
    precisely how many shuffle-join rows Bloom pruning would have
    saved."""
    orders = table(spark, sf, "orders")
    lineitem = table(spark, sf, "lineitem")

    build = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1995)
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    probe = lineitem.select(F.col("l_orderkey").alias("k")).distinct()

    def positions(df: DataFrame) -> DataFrame:
        hashes = F.array(*[F.expr(_hash_expr("k", i, BLOOM_BITS)) for i in range(BLOOM_K)])
        return df.select("k", F.explode(hashes).alias("pos")).select(
            "k",
            F.expr(f"pos DIV {BLOOM_WORD_BITS}").alias("word"),
            (F.col("pos") % BLOOM_WORD_BITS).alias("bit"),
        )

    bloom = (
        positions(build)
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").alias("bits"))
    )

    verdicts = (
        positions(probe)
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "k",
            F.expr(
                "CASE WHEN bits IS NOT NULL"
                " AND (shiftright(bits, CAST(bit AS INT)) & 1) = 1"
                " THEN 1 ELSE 0 END"
            ).alias("hit"),
        )
        .groupBy("k")
        .agg(F.min("hit").alias("all_set"))
    )
    flags = verdicts.join(
        build.withColumn("is_true", F.lit(1)), "k", "left"
    )

    stats = flags.agg(
        F.count("*").alias("n_probe"),
        F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias("n_true_match"),
        F.sum("all_set").alias("n_bloom_pass"),
    )
    n_build = build.agg(F.count("*").alias("n_build"))
    out = stats.crossJoin(n_build)
    return out.select(
        "n_build",
        "n_probe",
        "n_true_match",
        "n_bloom_pass",
        (F.col("n_bloom_pass") - F.col("n_true_match")).alias("n_false_positive"),
        F.round(
            (F.col("n_bloom_pass") - F.col("n_true_match")).cast("double")
            / F.greatest(F.col("n_probe") - F.col("n_true_match"), F.lit(1)),
            6,
        ).alias("fp_rate"),
    )


def cms_frequency_estimates(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 512) over
    the lineitem supplier-key stream, reported as estimate-vs-exact for
    the 20 most frequent suppliers.

    The build explodes each row into D (row, col) cells and counts per
    cell; Spark's map-side partial aggregation collapses every task's
    cells to <= D*W rows before the shuffle, so the reducer merges
    fixed-size sketches — the defining property that lets this run on a
    key space too large to count exactly. The estimate for key k is
    min_i sketch[i, h_i(k)], an upper bound on the true count, so
    ``overcount`` is always >= 0 (asserted by the oracle twin too)."""
    lineitem = table(spark, sf, "lineitem")
    rows = lineitem.select(F.col("l_suppkey").alias("k"))

    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.expr(_hash_expr("k", i, CMS_WIDTH)).cast("long").alias("col"),
            )
            for i in range(CMS_DEPTH)
        ]
    )
    sketch = (
        rows.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )

    exact = rows.groupBy("k").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "k").limit(CMS_TOP_K)

    probes = top.select("k", "exact_cnt", F.explode(cells).alias("c")).select(
        "k", "exact_cnt", F.col("c.row").alias("row"), F.col("c.col").alias("col")
    )
    est = (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.select(
            F.col("k").alias("suppkey"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), "suppkey")
    )


def _bloom_oracle() -> str:
    h = [_hash_expr("k", i, BLOOM_BITS) for i in range(BLOOM_K)]
    return f"""
        WITH build AS (
            SELECT DISTINCT o_orderkey AS k FROM orders
            WHERE o_orderpriority = '1-URGENT'
              AND EXTRACT(year FROM o_orderdate) = 1995
        ),
        build_pos AS (
            SELECT k, unnest([{h[0]}, {h[1]}, {h[2]}]) AS pos FROM build
        ),
        bloom AS (
            SELECT pos // {BLOOM_WORD_BITS} AS word,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_WORD_BITS} AS INT)) AS bits
            FROM build_pos GROUP BY 1
        ),
        probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        probe_pos AS (
            SELECT k, unnest([{h[0]}, {h[1]}, {h[2]}]) AS pos FROM probe
        ),
        verdicts AS (
            SELECT p.k,
                   MIN(CASE WHEN b.bits IS NOT NULL
                             AND ((b.bits >> CAST(p.pos % {BLOOM_WORD_BITS} AS INT)) & 1) = 1
                            THEN 1 ELSE 0 END) AS all_set
            FROM probe_pos p
            LEFT JOIN bloom b ON p.pos // {BLOOM_WORD_BITS} = b.word
            GROUP BY p.k
        ),
        counts AS (
            SELECT (SELECT COUNT(*) FROM build) AS n_build,
                   (SELECT COUNT(*) FROM probe) AS n_probe,
                   (SELECT COUNT(*) FROM probe WHERE k IN (SELECT k FROM build)) AS n_true_match,
                   (SELECT COUNT(*) FROM verdicts WHERE all_set = 1) AS n_bloom_pass
        )
        SELECT CAST(n_build AS BIGINT) AS n_build,
               CAST(n_probe AS BIGINT) AS n_probe,
               CAST(n_true_match AS BIGINT) AS n_true_match,
               CAST(n_bloom_pass AS BIGINT) AS n_bloom_pass,
               CAST(n_bloom_pass - n_true_match AS BIGINT) AS n_false_positive,
               ROUND(CAST(n_bloom_pass - n_true_match AS DOUBLE)
                     / GREATEST(n_probe - n_true_match, 1), 6) AS fp_rate
        FROM counts
    """


def _cms_oracle() -> str:
    h = [_hash_expr("k", i, CMS_WIDTH) for i in range(CMS_DEPTH)]
    # The sketch cell (i, c) holds the total frequency of every key
    # hashing to column c under h_i — building it from the per-key
    # exact counts is algebraically identical to counting raw rows.
    return f"""
        WITH exact AS (
            SELECT l_suppkey AS k, COUNT(*) AS exact_cnt FROM lineitem GROUP BY 1
        ),
        cells AS (
            SELECT row, col, CAST(SUM(exact_cnt) AS BIGINT) AS cnt
            FROM (
                SELECT k, exact_cnt, u.r AS row,
                       CASE u.r
                           WHEN 0 THEN {h[0]}
                           WHEN 1 THEN {h[1]}
                           WHEN 2 THEN {h[2]}
                           ELSE {h[3]}
                       END AS col
                FROM exact, (SELECT unnest([0, 1, 2, 3]) AS r) u
            )
            GROUP BY row, col
        ),
        top AS (
            SELECT k, exact_cnt FROM exact
            ORDER BY exact_cnt DESC, k LIMIT {CMS_TOP_K}
        ),
        probes AS (
            SELECT k, exact_cnt, u.r AS row,
                   CASE u.r
                       WHEN 0 THEN {h[0]}
                       WHEN 1 THEN {h[1]}
                       WHEN 2 THEN {h[2]}
                       ELSE {h[3]}
                   END AS col
            FROM top, (SELECT unnest([0, 1, 2, 3]) AS r) u
        )
        SELECT p.k AS suppkey,
               CAST(MAX(p.exact_cnt) AS BIGINT) AS exact_cnt,
               CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
               CAST(MIN(c.cnt) - MAX(p.exact_cnt) AS BIGINT) AS overcount
        FROM probes p JOIN cells c ON p.row = c.row AND p.col = c.col
        GROUP BY p.k
        ORDER BY exact_cnt DESC, suppkey
    """


ORACLE: dict[str, str] = {
    "bloom_prune_stats": _bloom_oracle(),
    "cms_frequency_estimates": _cms_oracle(),
}

QUERIES = {
    "bloom_prune_stats": bloom_prune_stats,
    "cms_frequency_estimates": cms_frequency_estimates,
}


def bitmap_distinct_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Exact COUNT(DISTINCT) via Spark's bitmap aggregates — the
    mergeable-bitmap pattern that replaces the Expand-based distinct
    plan at scale: ids map to (bucket, bit) positions, per-(group,
    bucket) partial aggregation ORs fixed 4KB bitmap segments MAP-SIDE,
    and the final count sums popcounts.  The shuffle carries at most
    #groups x #touched-buckets bitmap rows — never distinct id rows —
    and unlike HLL sketches the answer is EXACT (the oracle is a plain
    COUNT(DISTINCT)).  Distinct users per event type over non-negative
    surrogate ids (bitmap_bit_position's domain; both engines filter
    identically)."""
    import hashlib

    tag = hashlib.md5(sf.encode()).hexdigest()[:10]
    ev = table(spark, sf, "events")
    ev.where(
        F.col("user_id").isNotNull() & (F.col("user_id") >= 0)
    ).createOrReplaceTempView(f"bitmap_ev_{tag}")
    return spark.sql(f"""
        SELECT event_type,
               bitmap_count(bitmap_or_agg(bm)) AS n_users
        FROM (
            -- +1: bitmap_bit_position/bitmap_bucket_number address a
            -- 1-BASED domain (id 0 would alias into the wrong slot —
            -- measured as an off-by-one against COUNT(DISTINCT));
            -- shifting the whole domain preserves distinctness
            SELECT event_type,
                   bitmap_bucket_number(user_id + 1) AS bucket,
                   bitmap_construct_agg(bitmap_bit_position(user_id + 1)) AS bm
            FROM bitmap_ev_{tag}
            GROUP BY event_type, bucket
        )
        GROUP BY event_type
        ORDER BY event_type
    """)


ORACLE["bitmap_distinct_counts"] = """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE user_id IS NOT NULL AND user_id >= 0
    GROUP BY event_type ORDER BY event_type
"""

QUERIES["bitmap_distinct_counts"] = bitmap_distinct_counts


# ---------------------------------------------------------------------------
# Round 8: KMV (k-minimum-values) distinct sketch — the third mergeable
# sketch next to Bloom and count-min, and the portable stand-in for
# HyperLogLog: keep the k smallest hash values of a key stream; the
# k-th smallest, as a fraction of the hash space, estimates the
# distinct count as (k-1)/u_k (Bar-Yossef et al. 2002).  Engine-native
# HLLs (approx_count_distinct) can never cross-check between engines;
# KMV over the md5-based H64 hash is bit-identical in both, so the
# sketch itself gets an external oracle.

KMV_K = 32


def kmv_distinct_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """KMV distinct-user estimate per event type vs the exact count:
    n_distinct, the sketch estimate, and the relative error — the
    accuracy audit a pipeline runs before trusting sketch cardinalities
    for capacity planning. Types with fewer than KMV_K distinct users
    report exact (the KMV fallback: the sketch IS the full key set).

    100 TB shape: one distinct on (type, user) — the same shuffle the
    exact count needs anyway — then the k-th order statistic rides
    ``_distributed_rank`` (range shuffle + broadcast prefix counts, no
    one-task-per-type sort); everything after is one row per type.  In
    a real deployment only the k minima stream to the merger; here the
    rank formulation proves the estimator against the exact count."""
    from pinterest_data_pipeline6_spark.operators.textops import (
        _distributed_rank,
        _h64_spark,
    )

    ev = table(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    du = ev.select("event_type", "user_id").distinct()
    hashed = du.select(
        "event_type",
        _h64_spark(
            F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))
        ).alias("score"),
        F.col("user_id").alias("doc_id"),
    )
    ranked = _distributed_rank(hashed, group_cols=["event_type"])
    per_type = ranked.groupBy("event_type").agg(
        F.max("_grank").alias("n_distinct"),
        F.min(
            F.when(F.col("_grank") == KMV_K, F.col("score"))
        ).alias("u_k"),
    )
    # hash space is 60 bits (15 hex chars of md5)
    est = F.when(
        F.col("n_distinct") < KMV_K, F.col("n_distinct").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1))
        * F.lit(float(1 << 60))
        / F.col("u_k").cast("double")
    )
    return (
        per_type.select(
            "event_type",
            "n_distinct",
            F.round(est, 2).alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("n_distinct").cast("double"))
                / F.col("n_distinct").cast("double"),
                4,
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


ORACLE["kmv_distinct_estimate"] = f"""
    WITH du AS (
        SELECT DISTINCT event_type, user_id
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    hashed AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('kmv|' || CAST(user_id AS VARCHAR)),
                                    1, 15)) AS BIGINT) AS h,
               user_id
        FROM du
    ),
    ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY h, user_id) AS rk
        FROM hashed
    ),
    per_type AS (
        SELECT event_type, MAX(rk) AS n_distinct,
               MIN(CASE WHEN rk = {KMV_K} THEN h END) AS u_k
        FROM ranked GROUP BY event_type
    )
    SELECT event_type, CAST(n_distinct AS BIGINT) AS n_distinct,
           ROUND(CASE WHEN n_distinct < {KMV_K}
                      THEN CAST(n_distinct AS DOUBLE)
                      ELSE {float(KMV_K - 1)} * {float(1 << 60)}
                           / CAST(u_k AS DOUBLE) END, 2) AS kmv_estimate,
           ROUND(ABS(CASE WHEN n_distinct < {KMV_K}
                          THEN CAST(n_distinct AS DOUBLE)
                          ELSE {float(KMV_K - 1)} * {float(1 << 60)}
                               / CAST(u_k AS DOUBLE) END
                     - CAST(n_distinct AS DOUBLE))
                 / CAST(n_distinct AS DOUBLE), 4) AS rel_error
    FROM per_type ORDER BY event_type
"""

QUERIES["kmv_distinct_estimate"] = kmv_distinct_estimate


# ---------------------------------------------------------------------------
# Round 9: HyperLogLog register sketch (Flajolet et al. 2007) — the
# OTHER mergeable distinct-count sketch, complementing KMV: where KMV
# keeps the k smallest hashes (k * 8 bytes, estimate from the k-th
# order statistic), HLL keeps HLL_M max-leading-zero registers (one
# byte each) and estimates from their harmonic mean — the sketch
# behind approx_count_distinct itself, materialized here as auditable
# data with a cross-engine oracle.
#
# Determinism contract: rho (leading-zero rank) is derived from the
# BINARY-STRING length of the hash remainder — length(bin(w)) — pure
# integer/string ops, no log2 on data; the harmonic sum is the EXACT
# integer  sum(2^(55 - M_j))  (every term <= 2^55, 64 terms fit
# bigint), so the one floating-point step is the final literal/S
# division.  The raw estimator is reported without the small/large
# range corrections (n_zero_registers is emitted so a consumer can
# apply linear counting); the audit column is rel_error vs the exact
# count anyway.

HLL_M = 64  # registers (bucket = hash % 64; 6 bucket bits)
_HLL_WBITS = 54  # 60-bit hash minus 6 bucket bits
# alpha_m * m^2 * 2^55 — the full estimator numerator as one Python
# literal so both engines divide the identical double by S.
_HLL_NUMERATOR = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M * (
    1 << (_HLL_WBITS + 1)
)


def hll_register_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type HyperLogLog distinct-user estimate vs the exact
    count: registers used, zero registers, the raw HLL estimate, and
    its relative error — the audit that decides whether one byte per
    register is enough before replacing exact COUNT DISTINCT in a
    100 TB rollup.

    Scale shape: the register table is the partial+final MAX agg on
    (type, bucket) — at most #types x HLL_M rows survive the map side
    regardless of input (the mergeable-sketch property, same as CMS);
    duplicates never inflate anything because MAX absorbs them."""
    from pinterest_data_pipeline6_spark.operators.textops import _h64_spark

    ev = table(spark, sf, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    h = _h64_spark(
        F.concat(F.lit("hll|"), F.col("user_id").cast("string"))
    )
    hashed = ev.select(
        "event_type",
        (h % HLL_M).cast("int").alias("b"),
        # shiftright, not floor(h / 64): double division of a 60-bit
        # hash rounds away low bits past 2^53, which could flip rho
        # vs the oracle's exact integer h // 64.
        F.shiftright(h, 6).cast("long").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(F.col("w")))
    )
    regs = hashed.select("event_type", "b", rho.alias("rho")).groupBy(
        "event_type", "b"
    ).agg(F.max("rho").alias("m_j"))
    per_type = regs.groupBy("event_type").agg(
        F.count("*").alias("n_registers_used"),
        F.sum(
            F.expr(f"shiftleft(1L, {_HLL_WBITS + 1} - cast(m_j as int))")
        ).cast("bigint").alias("s_present"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_distinct")
    )
    s_total = F.col("s_present") + (HLL_M - F.col("n_registers_used")) * F.lit(
        1 << (_HLL_WBITS + 1)
    )
    est = F.lit(_HLL_NUMERATOR) / s_total.cast("double")
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            "n_distinct",
            "n_registers_used",
            (F.lit(HLL_M) - F.col("n_registers_used")).cast("bigint").alias(
                "n_zero_registers"
            ),
            F.round(est, 2).alias("hll_estimate"),
            F.round(
                F.abs(est - F.col("n_distinct").cast("double"))
                / F.col("n_distinct").cast("double"),
                4,
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


from pinterest_data_pipeline6_spark.operators.textops import H64_SQL  # noqa: E402

ORACLE["hll_register_estimate"] = f"""
    WITH hashed AS (
        SELECT event_type,
               CAST(h % {HLL_M} AS INT) AS b,
               h // {HLL_M} AS w
        FROM (
            SELECT event_type,
                   {H64_SQL.format(expr="'hll|' || CAST(user_id AS VARCHAR)")}
                       AS h
            FROM events
            WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        )
    ),
    regs AS (
        SELECT event_type, b,
               MAX(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                        ELSE {_HLL_WBITS + 1} - length(bin(w)) END) AS m_j
        FROM hashed GROUP BY event_type, b
    ),
    per_type AS (
        SELECT event_type,
               COUNT(*) AS n_registers_used,
               CAST(SUM(1::BIGINT << ({_HLL_WBITS + 1} - m_j)) AS BIGINT)
                   AS s_present
        FROM regs GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        GROUP BY event_type
    )
    SELECT per_type.event_type,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           n_registers_used,
           CAST({HLL_M} - n_registers_used AS BIGINT) AS n_zero_registers,
           ROUND({_HLL_NUMERATOR!r}
                 / CAST(s_present + ({HLL_M} - n_registers_used)
                        * (1::BIGINT << {_HLL_WBITS + 1}) AS DOUBLE), 2)
               AS hll_estimate,
           ROUND(ABS({_HLL_NUMERATOR!r}
                     / CAST(s_present + ({HLL_M} - n_registers_used)
                            * (1::BIGINT << {_HLL_WBITS + 1}) AS DOUBLE)
                     - CAST(n_distinct AS DOUBLE))
                 / CAST(n_distinct AS DOUBLE), 4) AS rel_error
    FROM per_type JOIN exact ON per_type.event_type = exact.event_type
    ORDER BY per_type.event_type
"""

QUERIES["hll_register_estimate"] = hll_register_estimate


def hll_union_merge_audit(spark: SparkSession, sf: str) -> DataFrame:
    """The property that makes HLL the 100 TB distinct-count sketch:
    MERGEABILITY.  Build per-event-type register sets, merge them by
    per-bucket MAX into one global sketch, and compare the merged
    estimate against (a) the exact global distinct and (b) the naive
    SUM of per-type estimates (wrong whenever users overlap types —
    the overcount column quantifies exactly the error a non-mergeable
    rollup would ship).  One row out.

    Scale shape: the merge is an HLL_M-row MAX aggregate over the
    (#types x HLL_M)-row register table — sketches compose without
    ever re-touching the data, which is why partial sketches can live
    in a Delta table and merge at query time."""
    from pinterest_data_pipeline6_spark.operators.textops import _h64_spark

    ev = table(spark, sf, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    h = _h64_spark(
        F.concat(F.lit("hll|"), F.col("user_id").cast("string"))
    )
    hashed = ev.select(
        "event_type",
        (h % HLL_M).cast("int").alias("b"),
        # exact integer h // 64 (see hll_register_estimate): shiftright
        # keeps the low bits a double division would round away.
        F.shiftright(h, 6).cast("long").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(F.col("w")))
    )
    per_type = hashed.select("event_type", "b", rho.alias("rho")).groupBy(
        "event_type", "b"
    ).agg(F.max("rho").alias("m_j"))
    merged = per_type.groupBy("b").agg(F.max("m_j").alias("m_j"))
    g = merged.agg(
        F.count("*").alias("used"),
        F.sum(
            F.expr(f"shiftleft(1L, {_HLL_WBITS + 1} - cast(m_j as int))")
        ).cast("bigint").alias("s_present"),
    )
    s_total = F.col("s_present") + (HLL_M - F.col("used")) * F.lit(
        1 << (_HLL_WBITS + 1)
    )
    merged_est = F.lit(_HLL_NUMERATOR) / s_total.cast("double")
    # per-type estimates, naively summed (the WRONG non-mergeable rollup)
    pt = per_type.groupBy("event_type").agg(
        F.count("*").alias("used"),
        F.sum(
            F.expr(f"shiftleft(1L, {_HLL_WBITS + 1} - cast(m_j as int))")
        ).cast("bigint").alias("s_present"),
    )
    pt_est = F.lit(_HLL_NUMERATOR) / (
        F.col("s_present")
        + (HLL_M - F.col("used")) * F.lit(1 << (_HLL_WBITS + 1))
    ).cast("double")
    naive = pt.agg(
        F.round(F.sum(F.round(pt_est, 9).cast("decimal(28,9)")).cast("double"), 2).alias(
            "naive_sum_estimate"
        )
    )
    exact = ev.agg(F.count_distinct("user_id").alias("n_distinct_global"))
    return (
        g.select(F.round(merged_est, 2).alias("merged_estimate"))
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(naive))
        .select(
            "n_distinct_global",
            "merged_estimate",
            "naive_sum_estimate",
            F.round(
                F.col("naive_sum_estimate") - F.col("merged_estimate"), 2
            ).alias("naive_overcount"),
        )
    )


ORACLE["hll_union_merge_audit"] = f"""
    WITH hashed AS (
        SELECT event_type,
               CAST(h % {HLL_M} AS INT) AS b,
               h // {HLL_M} AS w
        FROM (
            SELECT event_type,
                   {H64_SQL.format(expr="'hll|' || CAST(user_id AS VARCHAR)")}
                       AS h
            FROM events
            WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        )
    ),
    per_type AS (
        SELECT event_type, b,
               MAX(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                        ELSE {_HLL_WBITS + 1} - length(bin(w)) END) AS m_j
        FROM hashed GROUP BY event_type, b
    ),
    merged AS (SELECT b, MAX(m_j) AS m_j FROM per_type GROUP BY b),
    g AS (
        SELECT COUNT(*) AS used,
               CAST(SUM(1::BIGINT << ({_HLL_WBITS + 1} - m_j)) AS BIGINT)
                   AS s_present
        FROM merged
    ),
    pt AS (
        SELECT event_type, COUNT(*) AS used,
               CAST(SUM(1::BIGINT << ({_HLL_WBITS + 1} - m_j)) AS BIGINT)
                   AS s_present
        FROM per_type GROUP BY event_type
    ),
    naive AS (
        SELECT ROUND(CAST(SUM(CAST(ROUND({_HLL_NUMERATOR!r}
                   / CAST(s_present + ({HLL_M} - used)
                          * (1::BIGINT << {_HLL_WBITS + 1}) AS DOUBLE), 9)
               AS DECIMAL(28,9))) AS DOUBLE), 2) AS naive_sum_estimate
        FROM pt
    ),
    exact AS (
        SELECT COUNT(DISTINCT user_id) AS n_distinct_global
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    )
    SELECT CAST(n_distinct_global AS BIGINT) AS n_distinct_global,
           ROUND({_HLL_NUMERATOR!r}
                 / CAST(s_present + ({HLL_M} - used)
                        * (1::BIGINT << {_HLL_WBITS + 1}) AS DOUBLE), 2)
               AS merged_estimate,
           naive_sum_estimate,
           ROUND(naive_sum_estimate
                 - ROUND({_HLL_NUMERATOR!r}
                     / CAST(s_present + ({HLL_M} - used)
                            * (1::BIGINT << {_HLL_WBITS + 1}) AS DOUBLE), 2),
                 2) AS naive_overcount
    FROM g CROSS JOIN exact CROSS JOIN naive
"""

QUERIES["hll_union_merge_audit"] = hll_union_merge_audit
