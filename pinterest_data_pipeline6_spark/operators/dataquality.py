"""Data-quality / expectations operators: a Deequ-style constraint
suite, a column profiler, an event-time freshness monitor, a
chi-square distribution-independence monitor, and a shuffle-skew
(hot-key) audit.

Beyond-reference capability (the reference repo validates nothing — its
cleaning notebook assumes well-formed rows; SURVEY.md §2.13 documents
the quirks that assumption produces). Any pipeline feeding a 100 TB
training corpus runs exactly this layer in front of ingestion, so it is
first-class here, same as dedup/privacy/curation.

Spark-first shapes:

- **expectations**: every single-table rule (completeness, uniqueness,
  range, set membership, regex pattern) folds into ONE aggregation pass
  over `orders` — conditional sums inside a single partial+final hash
  agg, so 100 TB of orders is scanned once no matter how many rules run.
  The two cross-table rules (referential integrity and the
  ship-after-order invariant) share ONE left join of lineitem→orders:
  an orphan is a null probe result, a date inversion is a predicate on
  the matched row — one shuffle pays for both rules. The rule ledger
  itself is built by unpivoting the one-row aggregate with `stack`
  (rows = rules, never a second scan).
- **column profile**: nulls/min/max in one plain aggregate pass;
  distinct counts via an unpivoted (column, value) pair dedup that
  stays in HashAggregate (see the function docstring for why the
  multi-column COUNT DISTINCT form was rejected); the cheaper
  `approx_count_distinct` variant is the knob at 100 TB (exact kept
  here for oracle parity).
- **chi-square / hot keys**: both aggregate first, then run every
  window over the bounded aggregate (contingency cells / key counts),
  so the plan shape is flat at any input scale.
- **freshness**: max event-time per type vs the corpus watermark —
  a #event-types-row aggregate; the global watermark comes from an
  unpartitioned window over that tiny aggregate (never a second scan
  of the events table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pinterest_data_pipeline6_spark.sources.readers import table, widen_small_scan

# Set-membership rule: 'P' is deliberately OUTSIDE the allowed set so
# the violation path is exercised on real testdata (orders contains
# O/F/P) — a rule suite whose rules can never fail tests nothing.
ALLOWED_STATUS = ("O", "F")
PRIORITY_RE = "^[1-5]-"
FRESH_WINDOW_H = 24 * 7  # "recent" horizon for the freshness monitor


def dq_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """Constraint ledger: one row per rule with checked/violation counts
    and a pass flag. Five single-table rules ride one scan of orders;
    the two cross-table rules share one lineitem→orders left join."""
    orders = table(spark, sf, "orders")
    lineitem = table(spark, sf, "lineitem")

    bad = F.lit(0).cast("bigint")
    o_agg = orders.agg(
        F.count(F.lit(1)).alias("o_n"),
        F.sum(F.col("o_custkey").isNull().cast("bigint")).alias("v_null"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias("v_dup"),
        F.sum((~(F.col("o_totalprice") > 0)).cast("bigint")).alias("v_range"),
        F.sum((~F.col("o_orderstatus").isin(*ALLOWED_STATUS)).cast("bigint")).alias("v_set"),
        F.sum((~F.col("o_orderpriority").rlike(PRIORITY_RE)).cast("bigint")).alias("v_re"),
    )
    # One left join answers both cross-table rules: null probe side =
    # referential orphan; matched row with l_shipdate < o_orderdate =
    # ordering invariant violation.
    joined = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left",
    )
    l_agg = joined.agg(
        F.count(F.lit(1)).alias("l_n"),
        F.sum(F.col("o_orderkey").isNull().cast("bigint")).alias("v_orphan"),
        F.sum(
            (F.col("o_orderkey").isNotNull() & (F.col("l_shipdate") < F.col("o_orderdate"))).cast(
                "bigint"
            )
        ).alias("v_ship"),
    )
    one_row = o_agg.crossJoin(l_agg)
    ledger = one_row.select(
        F.expr(
            """stack(7,
                'orders.o_custkey.not_null',      o_n, v_null,
                'orders.o_orderkey.unique',       o_n, v_dup,
                'orders.o_totalprice.positive',   o_n, v_range,
                'orders.o_orderstatus.in_set',    o_n, v_set,
                'orders.o_orderpriority.pattern', o_n, v_re,
                'lineitem.l_orderkey.ref_orders', l_n, v_orphan,
                'lineitem.l_shipdate.after_order',l_n, v_ship
            ) AS (rule, n_checked, n_violations)"""
        )
    ).select(
        "rule",
        F.col("n_checked").cast("bigint").alias("n_checked"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == bad).cast("int").alias("passed"),
    )
    return ledger.orderBy("rule")


def dq_column_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column profile of orders: nulls, exact distinct count, min
    and max rendered as strings — a row per column.

    Two-pass shape chosen over the obvious multi-column
    COUNT(DISTINCT ...) aggregate: Catalyst plans N distinct-columns as
    one Expand feeding a SORT-aggregate keyed on all N columns at once
    (measured 3.5 s at sf0.1 — the wide sort key defeats hash
    aggregation). Instead (1) nulls/min/max fold into one plain hash
    agg over one scan, and (2) distinct counts unpivot to
    (column, value-string) pairs — the same Expand — but deduplicate
    through a HASH aggregate on a 2-column key with map-side partial
    combine, then count per column. Both passes stay
    whole-stage-codegen; the 5-row profile join is a broadcast."""
    orders = table(spark, sf, "orders")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nul_{c}"),
            F.min(F.col(c)).cast("string").alias(f"min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"max_{c}"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nul_{c}, min_{c}, max_{c}" for c in cols)
    base = one.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (col_name, n_nulls, min_value, max_value)"
        ),
    )
    pair_args = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    dcounts = (
        orders.select(F.expr(f"stack({len(cols)}, {pair_args}) AS (cid, v)"))
        .where(F.col("v").isNotNull())
        .distinct()
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return (
        base.join(F.broadcast(dcounts), base.col_name == dcounts.cid)
        .select(
            "col_name",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_nulls").cast("bigint").alias("n_nulls"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            "min_value",
            "max_value",
        )
        .orderBy("col_name")
    )


def freshness_lag_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time freshness per event type: latest event, lag in hours
    behind the corpus watermark (global max ts), and how many events
    landed inside the trailing 7-day horizon.

    Recency is measured against each type's own span end (the signal a
    monitor uses to detect "source went quiet then burst"). The per-type
    watermark is a plain groupBy max — partial-aggregated map-side, so
    the shuffle carries #types rows per task, never data — broadcast-
    joined back onto the scan for the recency test, then one more
    partial+final agg. No stage ever hash-partitions RAW event rows on
    the #types-cardinality key (the earlier window form did exactly
    that: with ~5 distinct types the whole fact table funneled into 5
    reducers, and the window's co-location requirement blocked map-side
    combining — the skew shape ``hot_key_detection`` exists to catch)."""
    events = table(spark, sf, "events")
    marks = events.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("mx_us")
    )
    per_type = (
        events.join(F.broadcast(marks), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("max_ts"),
            F.sum(
                ((F.col("mx_us") - F.unix_micros("ts")) <= FRESH_WINDOW_H * 3600 * 1_000_000)
                .cast("bigint")
            ).alias("n_recent"),
        )
    )
    w = Window.partitionBy()
    lag_h = (F.max(F.unix_micros("max_ts")).over(w) - F.unix_micros("max_ts")) / 3.6e9
    return per_type.select(
        "event_type",
        "n_events",
        F.col("max_ts").cast("string").alias("max_ts"),
        F.round(lag_h, 2).alias("lag_hours"),
        "n_recent",
    ).orderBy("event_type")


def lang_source_chisq(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square independence monitor for the (lang, source) corpus
    contingency table: per cell the observed count, the expected count
    under independence, and the chi-square contribution — the
    drill-down behind a "language mix is drifting per source" alarm
    (the aggregate statistic is the sum of the term column).

    One hash agg to #langs × #sources cells; the row/column/grand
    totals are windows OVER THAT AGGREGATE (bounded by label
    cardinalities, never corpus size), so the plan shape is flat at
    any input scale."""
    docs = table(spark, sf, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    w_lang = Window.partitionBy("lang")
    w_src = Window.partitionBy("source")
    w_all = Window.partitionBy()
    exp = (
        F.sum("n").over(w_lang)
        * F.sum("n").over(w_src)
        / F.sum("n").over(w_all)
    )
    return (
        obs.select(
            "lang",
            "source",
            "n",
            F.round(exp, 4).alias("expected"),
            F.round(F.pow(F.col("n") - exp, 2) / exp, 6).alias("chisq_term"),
        )
        .orderBy("lang", "source")
    )


SKEW_TOP_KEYS = 10


def hot_key_detection(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-skew audit for a prospective join/agg key: the
    SKEW_TOP_KEYS heaviest lineitem part keys with their row share and
    the ratio to the mean key load — the numbers that decide whether a
    key needs salting (`functions/partitioning.salted_join`) or AQE
    skew-split before a 100 TB shuffle.

    One hash agg (map-side combinable) to #keys rows; the mean/total
    come from windows over that aggregate; TakeOrderedAndProject picks
    the top keys without a full sort."""
    li = table(spark, sf, "lineitem")
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.partitionBy()
    share = F.col("n_rows") / F.sum("n_rows").over(w)
    skew = F.col("n_rows") / F.avg("n_rows").over(w)
    return (
        counts.select(
            "l_partkey",
            "n_rows",
            F.round(share, 6).alias("row_share"),
            F.round(skew, 4).alias("skew_factor"),
        )
        .orderBy(F.desc("n_rows"), F.asc("l_partkey"))
        .limit(SKEW_TOP_KEYS)
    )


ORACLE_HOT_KEY = f"""
    WITH counts AS (
        SELECT l_partkey, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, n_rows,
           ROUND(n_rows / CAST(SUM(n_rows) OVER () AS DOUBLE), 6) AS row_share,
           ROUND(n_rows / (CAST(SUM(n_rows) OVER () AS DOUBLE)
                           / COUNT(*) OVER ()), 4) AS skew_factor
    FROM counts
    ORDER BY n_rows DESC, l_partkey ASC
    LIMIT {SKEW_TOP_KEYS}
"""



def fk_fanout_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Join-cardinality audit for the orders→customer FK: the
    distribution of orders-per-customer, bucketed in powers of two —
    with ``hot_key_detection`` this is what sizes a prospective join
    (expected fanout, tail mass) before it runs at 100 TB.

    Two shrinking hash aggs (rows → per-key counts → bucket counts);
    the bucket expression is integer log2 arithmetic, portable to the
    oracle via floor(log2(n))."""
    orders = table(spark, sf, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    bucket = F.floor(F.log2("n")).cast("int")
    return (
        per_key.groupBy(bucket.alias("fanout_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("n").alias("min_orders"),
            F.max("n").alias("max_orders"),
            F.sum("n").alias("n_orders"),
        )
        .orderBy("fanout_bucket")
    )


_STATUS_IN = ", ".join(f"'{s}'" for s in ALLOWED_STATUS)

ORACLE: dict[str, str] = {
    "dq_expectations": f"""
        WITH o AS (
            SELECT COUNT(*) AS o_n,
                   CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
                   COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_dup,
                   CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
                   CAST(SUM(CASE WHEN o_orderstatus NOT IN ({_STATUS_IN}) THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
                   CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '{PRIORITY_RE}') THEN 1 ELSE 0 END) AS BIGINT) AS v_re
            FROM orders
        ),
        l AS (
            SELECT COUNT(*) AS l_n,
                   CAST(SUM(CASE WHEN oo.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_orphan,
                   CAST(SUM(CASE WHEN oo.o_orderkey IS NOT NULL
                                  AND li.l_shipdate < oo.o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS v_ship
            FROM lineitem li LEFT JOIN orders oo ON li.l_orderkey = oo.o_orderkey
        ),
        ledger AS (
            SELECT 'orders.o_custkey.not_null' AS rule, o_n AS n_checked, v_null AS n_violations FROM o
            UNION ALL SELECT 'orders.o_orderkey.unique', o_n, v_dup FROM o
            UNION ALL SELECT 'orders.o_totalprice.positive', o_n, v_range FROM o
            UNION ALL SELECT 'orders.o_orderstatus.in_set', o_n, v_set FROM o
            UNION ALL SELECT 'orders.o_orderpriority.pattern', o_n, v_re FROM o
            UNION ALL SELECT 'lineitem.l_orderkey.ref_orders', l_n, v_orphan FROM l
            UNION ALL SELECT 'lineitem.l_shipdate.after_order', l_n, v_ship FROM l
        )
        SELECT rule, n_checked, n_violations,
               CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed
        FROM ledger ORDER BY rule
    """,
    "dq_column_profile": """
        WITH one AS (
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_o_orderkey,
                   COUNT(DISTINCT o_orderkey) AS dst_o_orderkey,
                   CAST(MIN(o_orderkey) AS VARCHAR) AS min_o_orderkey,
                   CAST(MAX(o_orderkey) AS VARCHAR) AS max_o_orderkey,
                   CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_o_custkey,
                   COUNT(DISTINCT o_custkey) AS dst_o_custkey,
                   CAST(MIN(o_custkey) AS VARCHAR) AS min_o_custkey,
                   CAST(MAX(o_custkey) AS VARCHAR) AS max_o_custkey,
                   CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_o_orderstatus,
                   COUNT(DISTINCT o_orderstatus) AS dst_o_orderstatus,
                   CAST(MIN(o_orderstatus) AS VARCHAR) AS min_o_orderstatus,
                   CAST(MAX(o_orderstatus) AS VARCHAR) AS max_o_orderstatus,
                   CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_o_totalprice,
                   COUNT(DISTINCT o_totalprice) AS dst_o_totalprice,
                   CAST(MIN(o_totalprice) AS VARCHAR) AS min_o_totalprice,
                   CAST(MAX(o_totalprice) AS VARCHAR) AS max_o_totalprice,
                   CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_o_orderpriority,
                   COUNT(DISTINCT o_orderpriority) AS dst_o_orderpriority,
                   CAST(MIN(o_orderpriority) AS VARCHAR) AS min_o_orderpriority,
                   CAST(MAX(o_orderpriority) AS VARCHAR) AS max_o_orderpriority
            FROM orders
        )
        SELECT col_name, n_rows, n_nulls, n_distinct, min_value, max_value
        FROM (
            SELECT 'o_orderkey' AS col_name, n_rows, nul_o_orderkey AS n_nulls,
                   dst_o_orderkey AS n_distinct, min_o_orderkey AS min_value, max_o_orderkey AS max_value FROM one
            UNION ALL SELECT 'o_custkey', n_rows, nul_o_custkey, dst_o_custkey, min_o_custkey, max_o_custkey FROM one
            UNION ALL SELECT 'o_orderstatus', n_rows, nul_o_orderstatus, dst_o_orderstatus, min_o_orderstatus, max_o_orderstatus FROM one
            UNION ALL SELECT 'o_totalprice', n_rows, nul_o_totalprice, dst_o_totalprice, min_o_totalprice, max_o_totalprice FROM one
            UNION ALL SELECT 'o_orderpriority', n_rows, nul_o_orderpriority, dst_o_orderpriority, min_o_orderpriority, max_o_orderpriority FROM one
        ) ORDER BY col_name
    """,
    "freshness_lag_stats": f"""
        WITH per_type AS (
            SELECT event_type, COUNT(*) AS n_events, MAX(ts) AS max_ts,
                   CAST(SUM(CASE WHEN mx_us - epoch_us(ts)
                                      <= {FRESH_WINDOW_H}::BIGINT * 3600 * 1000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_recent
            FROM (SELECT event_type, ts,
                         MAX(epoch_us(ts)) OVER (PARTITION BY event_type) AS mx_us
                  FROM events)
            GROUP BY event_type
        )
        SELECT event_type, n_events,
               CAST(max_ts AS VARCHAR) AS max_ts,
               ROUND((MAX(epoch_us(max_ts)) OVER () - epoch_us(max_ts)) / 3.6e9, 2)
                   AS lag_hours,
               n_recent
        FROM per_type ORDER BY event_type
    """,
}

ORACLE["lang_source_chisq"] = """
    WITH obs AS (
        SELECT lang, source, COUNT(*) AS n
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n,
           ROUND(SUM(n) OVER (PARTITION BY lang)
                 * SUM(n) OVER (PARTITION BY source)
                 / CAST(SUM(n) OVER () AS DOUBLE), 4) AS expected,
           ROUND(pow(n - SUM(n) OVER (PARTITION BY lang)
                       * SUM(n) OVER (PARTITION BY source)
                       / CAST(SUM(n) OVER () AS DOUBLE), 2)
                 / (SUM(n) OVER (PARTITION BY lang)
                    * SUM(n) OVER (PARTITION BY source)
                    / CAST(SUM(n) OVER () AS DOUBLE)), 6) AS chisq_term
    FROM obs ORDER BY lang, source
"""

ORACLE["hot_key_detection"] = ORACLE_HOT_KEY

ORACLE["fk_fanout_histogram"] = """
    WITH per_key AS (
        SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
    )
    SELECT CAST(FLOOR(log2(n)) AS INT) AS fanout_bucket,
           COUNT(*) AS n_customers,
           MIN(n) AS min_orders,
           MAX(n) AS max_orders,
           CAST(SUM(n) AS BIGINT) AS n_orders
    FROM per_key
    GROUP BY 1 ORDER BY 1
"""

def ks_source_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the document-
    length distributions of the even- and odd-numbered crawl sources —
    the nonparametric drift check that catches SHAPE changes the
    chi-square (categorical) and KL (binned) monitors cannot: KS is the
    max gap between the two empirical CDFs at any point, binning-free.

    Scale shape: the corpus reduces FIRST to per-distinct-value cohort
    counts (one partial+final agg — the shuffle carries (value, ca, cb)
    cells, bounded by the value domain, never document rows); the CDF
    windows then run over that bounded aggregate only, the same
    flat-at-any-scale shape as lang_source_chisq. The argmax row
    arrives via TakeOrderedAndProject on an exact INTEGER gap numerator
    |cuma*tb - cumb*ta| (ties to the smallest value), so no double
    comparison decides the winner; the BIGINT numerator is exact below
    ~3e9 samples per cohort — swap to DECIMAL(38,0) beyond that."""
    docs = table(spark, sf, "documents")
    cohort = F.substring("source", 4, 10).cast("int") % 2
    per_v = (
        docs.select(F.col("n_chars").alias("v"), cohort.alias("c"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("c") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cur = (
        per_v.withColumn("cuma", F.sum("ca").over(w_cum))
        .withColumn("cumb", F.sum("cb").over(w_cum))
        .withColumn("ta", F.sum("ca").over(w_all))
        .withColumn("tb", F.sum("cb").over(w_all))
        .withColumn(
            "num", F.abs(F.col("cuma") * F.col("tb") - F.col("cumb") * F.col("ta"))
        )
    )
    return (
        cur.orderBy(F.desc("num"), F.asc("v"))
        .limit(1)
        .select(
            F.col("ta").alias("n_even"),
            F.col("tb").alias("n_odd"),
            F.round(
                F.col("num").cast("double")
                / (F.col("ta").cast("double") * F.col("tb").cast("double")),
                6,
            ).alias("ks_stat"),
            F.col("v").alias("ks_value"),
        )
    )


ORACLE["ks_source_drift"] = """
    WITH per_v AS (
        SELECT n_chars AS v,
               SUM(CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 2 = 0
                        THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 2 = 1
                        THEN 1 ELSE 0 END) AS cb
        FROM documents
        GROUP BY 1
    ),
    cum AS (
        SELECT v,
               SUM(ca) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
               SUM(cb) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
               SUM(ca) OVER () AS ta,
               SUM(cb) OVER () AS tb
        FROM per_v
    )
    SELECT CAST(ta AS BIGINT) AS n_even,
           CAST(tb AS BIGINT) AS n_odd,
           ROUND(CAST(ABS(cuma * tb - cumb * ta) AS DOUBLE)
                 / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 6) AS ks_stat,
           v AS ks_value
    FROM cum
    ORDER BY ABS(cuma * tb - cumb * ta) DESC, v
    LIMIT 1
"""

def dq_gate_ledger(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of ``streaming/jobs.py::write_foreach_batch_dq_gate``
    — the streaming accept/quarantine ledger had only pytest evidence
    (foreachBatch sinks have no direct oracle form); this runs the SAME
    shared expressions (``dq_violation_tags`` + ``dq_metric_aggs``) over
    the batch events table with the event's day standing in for the
    micro-batch id, so the gate's tagging and ledger arithmetic get a
    hard external DuckDB row.  Three rules: value <= 100 (fires on the
    heavy tail), value >= 0 (healthy — a suite whose rules all fire
    tests only the failure path), event_type in the non-error set
    (fires on every 'error' row).  NULL rule results count as passes in
    both engines (SQL CASE semantics).

    100 TB shape: one projection evaluates every rule, one partial+final
    hash agg keyed on the date — adding rules adds columns, never scans
    or shuffles."""
    from pinterest_data_pipeline6_spark.streaming.jobs import (
        dq_metric_aggs,
        dq_violation_tags,
    )

    ev = table(spark, sf, "events")
    rules = {
        "value_le_100": F.col("value") <= 100,
        "value_nonneg": F.col("value") >= 0,
        "known_type": F.col("event_type").isin("click", "view", "purchase", "signup"),
    }
    tagged = ev.withColumn(
        "batch_id", F.date_format("ts", "yyyy-MM-dd")
    ).withColumn("violated", dq_violation_tags(rules))
    return tagged.groupBy("batch_id").agg(*dq_metric_aggs(rules)).orderBy("batch_id")


ORACLE["dq_gate_ledger"] = """
    WITH tagged AS (
        SELECT strftime(ts, '%Y-%m-%d') AS batch_id,
               CASE WHEN NOT (value <= 100) THEN 1 ELSE 0 END AS b_le,
               CASE WHEN NOT (value >= 0) THEN 1 ELSE 0 END AS b_nn,
               CASE WHEN NOT (event_type IN ('click', 'view', 'purchase', 'signup'))
                    THEN 1 ELSE 0 END AS b_kt
        FROM events
    )
    SELECT batch_id,
           COUNT(*) AS n_in,
           CAST(SUM(CASE WHEN b_le + b_nn + b_kt = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_accepted,
           CAST(SUM(CASE WHEN b_le + b_nn + b_kt > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quarantined,
           CAST(SUM(b_le) AS BIGINT) AS v_value_le_100,
           CAST(SUM(b_nn) AS BIGINT) AS v_value_nonneg,
           CAST(SUM(b_kt) AS BIGINT) AS v_known_type
    FROM tagged GROUP BY batch_id ORDER BY batch_id
"""


QUERIES = {
    "dq_expectations": dq_expectations,
    "ks_source_drift": ks_source_drift,
    "dq_column_profile": dq_column_profile,
    "freshness_lag_stats": freshness_lag_stats,
    "lang_source_chisq": lang_source_chisq,
    "hot_key_detection": hot_key_detection,
    "fk_fanout_histogram": fk_fanout_histogram,
    "dq_gate_ledger": dq_gate_ledger,
}


def quality_trend_theilsen(spark: SparkSession, sf: str) -> DataFrame:
    """Robust trend monitor: per event type, the Theil-Sen estimate of
    the day-over-day drift in event value — the median of all pairwise
    slopes between daily medians.  Outlier days that wreck a
    least-squares trend barely move this (the estimator tolerates ~29%
    contamination), which is why monitoring pipelines prefer it for
    drift alerts.  Both medians are LOWER medians (the element at rank
    ceil(n/2) under a fully deterministic (value, id) order) so every
    number is an element pick, never an interpolated average — exact
    cross-engine.

    100 TB shape: daily medians ride ``_distributed_rank`` grouped on
    (event_type, day) — one range shuffle, no single-task per-group
    sort even when one day holds billions of events.  Everything after
    operates on the #types x #days aggregate (150 rows here): the
    pairwise slope join and the median-of-slopes window cost O(days^2)
    per type regardless of corpus size."""
    from pinterest_data_pipeline6_spark.operators.textops import _distributed_rank

    ev = widen_small_scan(table(spark, sf, "events"))
    scored = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.col("value").alias("score"),
        F.col("event_id").alias("doc_id"),
    )
    ranked = _distributed_rank(scored, group_cols=["event_type", "d"])
    med = ranked.filter(
        F.col("_grank") == F.ceil(F.col("total") / F.lit(2))
    ).select("event_type", "d", F.col("score").alias("med"))
    a = med.select(
        "event_type", F.col("d").alias("d_a"), F.col("med").alias("m_a")
    )
    b = med.select(
        F.col("event_type").alias("et_b"),
        F.col("d").alias("d_b"),
        F.col("med").alias("m_b"),
    )
    slopes = a.join(
        b, (F.col("event_type") == F.col("et_b")) & (F.col("d_a") < F.col("d_b"))
    ).select(
        "event_type",
        "d_a",
        "d_b",
        (
            (F.col("m_b") - F.col("m_a"))
            / F.datediff(F.col("d_b"), F.col("d_a")).cast("double")
        ).alias("slope"),
    )
    # the slope-median rank rides _distributed_rank grouped on
    # event_type rather than a row_number window partitioned by the
    # label column: the slopes relation is bounded (O(days^2) per type)
    # but it reaches this point through a join, which hides the
    # upstream aggregates from the registry-wide raw-shuffle sweep —
    # and the range-partitioned core is the shape that stays safe if a
    # caller ever feeds an unbounded slope set.  doc_id encodes
    # (d_a, d_b) lexicographically so the tie-break matches the
    # oracle's ORDER BY slope, d_a, d_b.  The +800_000 offset keeps the
    # shifted day number non-negative for every date both engines
    # support (year 1 -> unix_date ~ -719_162; year 9999 -> ~2_932_896
    # < 3_200_000), so the base-4_000_000 positional encoding is
    # monotone over the FULL date domain, not just 1970..+2739.
    day_a = F.unix_date("d_a").cast("bigint") + F.lit(800_000)
    day_b = F.unix_date("d_b").cast("bigint") + F.lit(800_000)
    slope_ids = slopes.select(
        "event_type",
        F.col("slope").alias("score"),
        (day_a * F.lit(4_000_000) + day_b).alias("doc_id"),
    )
    picked = _distributed_rank(slope_ids, group_cols=["event_type"]).filter(
        F.col("_grank") == F.ceil(F.col("total") / F.lit(2))
    )
    return picked.select(
        "event_type",
        F.col("total").alias("n_slopes"),
        F.round("score", 6).alias("trend_per_day"),
    ).orderBy("event_type")


ORACLE["quality_trend_theilsen"] = """
    WITH ranked AS (
        SELECT event_type, CAST(ts AS DATE) AS d, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY value ASC NULLS FIRST,
                                           event_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type, CAST(ts AS DATE))
                   AS cnt
        FROM events WHERE value IS NOT NULL
    ),
    med AS (
        SELECT event_type, d, value AS med
        FROM ranked WHERE rn = CAST(CEIL(cnt / 2.0) AS BIGINT)
    ),
    slopes AS (
        SELECT a.event_type, a.d AS d_a, b.d AS d_b,
               (b.med - a.med) / CAST(date_diff('day', a.d, b.d) AS DOUBLE)
                   AS slope
        FROM med a JOIN med b
          ON a.event_type = b.event_type AND a.d < b.d
    ),
    picked AS (
        SELECT event_type, slope,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY slope ASC NULLS FIRST,
                                           d_a ASC, d_b ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS m
        FROM slopes
    )
    SELECT event_type, CAST(m AS BIGINT) AS n_slopes,
           ROUND(slope, 6) AS trend_per_day
    FROM picked WHERE rn = CAST(CEIL(m / 2.0) AS BIGINT)
    ORDER BY event_type
"""

QUERIES["quality_trend_theilsen"] = quality_trend_theilsen


def benford_first_digit(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law audit of order totals — the classic fabricated-
    numbers screen: the first significant digit of naturally-occurring
    amounts should follow P(d) = log10(1 + 1/d); a synthetic or
    tampered feed flattens the curve.  Per digit 1-9: observed count,
    observed share, Benford share, and the chi-square contribution
    n * (obs - exp)^2 / exp.

    Digit extraction is integer-exact in both engines: first character
    of the DECIMAL STRING of floor(price) for prices >= 1 — no
    log10/pow10 boundary hazard (log10(1000) rounds below 3 in some
    libms, which would misbucket every power of ten).

    100 TB shape: one scan, one partial+final agg to <= 9 rows; the
    expected-share arithmetic and the total-count window run over that
    9-row aggregate."""
    orders = table(spark, sf, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    w = Window.partitionBy()
    total = F.sum("n_obs").over(w)
    obs_share = F.col("n_obs") / total
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    chisq = (
        total.cast("double")
        * (obs_share - benford) * (obs_share - benford)
        / benford
    )
    return obs.select(
        "digit",
        "n_obs",
        F.round(obs_share, 6).alias("obs_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(chisq, 4).alias("chisq_term"),
    ).orderBy("digit")


ORACLE["benford_first_digit"] = """
    WITH obs AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit,
               COUNT(*) AS n_obs
        FROM orders WHERE o_totalprice >= 1
        GROUP BY 1
    )
    SELECT digit, n_obs,
           ROUND(n_obs / CAST(SUM(n_obs) OVER () AS DOUBLE), 6) AS obs_share,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_share,
           ROUND(CAST(SUM(n_obs) OVER () AS DOUBLE)
                 * (n_obs / CAST(SUM(n_obs) OVER () AS DOUBLE)
                    - log10(1.0 + 1.0 / digit))
                 * (n_obs / CAST(SUM(n_obs) OVER () AS DOUBLE)
                    - log10(1.0 + 1.0 / digit))
                 / log10(1.0 + 1.0 / digit), 4) AS chisq_term
    FROM obs ORDER BY digit
"""

QUERIES["benford_first_digit"] = benford_first_digit


def cusum_change_point(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM change-point detection on daily event volume — the
    monitoring primitive that finds WHEN a level shift happened (the
    Theil-Sen entry answers how steep the drift is): per event type,
    the cumulative sum of (daily count - overall daily mean) peaks in
    absolute value at the most likely change day.  Per type: the
    change day, the peak |CUSUM|, and the day count.

    Determinism: the argmax is INTEGER-exact.  CUSUM_i = prefix_i -
    i * (total / n_days), so n_days * CUSUM_i = n_days * prefix_i -
    i * total — all bigint arithmetic with no engine-specific IEEE
    accumulation order (a double running SUM is NOT guaranteed to fold
    left-to-right in DuckDB's windowed aggregation, so a real-valued
    |CUSUM| tie could resolve to different change days per engine).
    The reported peak is that bigint divided by n_days in ONE IEEE op,
    identical cross-engine; ties break on the earliest day.

    100 TB shape: raw events reduce to #types x #days rows in ONE
    partial+final agg; every window (prefix sum, totals, argmax rank)
    runs over that bounded aggregate — the sweep-approved pattern for
    label-keyed windows (aggregate below the exchange)."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    w_ord = wt.orderBy("d")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    scored = daily.select(
        "event_type",
        "d",
        F.count(F.lit(1)).over(wt).cast("bigint").alias("n_days"),
        F.abs(
            F.count(F.lit(1)).over(wt).cast("bigint")
            * F.sum("n").over(w_cum).cast("bigint")
            - F.row_number().over(w_ord).cast("bigint")
            * F.sum("n").over(wt).cast("bigint")
        ).alias("abs_int"),
    )
    w_pick = wt.orderBy(F.desc("abs_int"), F.asc("d"))
    return (
        scored.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("d").alias("change_day"),
            F.round(
                F.col("abs_int").cast("double") / F.col("n_days"), 4
            ).alias("peak_cusum"),
            F.col("n_days").alias("n_days"),
        )
        .orderBy("event_type")
    )


ORACLE["cusum_change_point"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, d,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_days,
               ABS(CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   * CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY d
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   - CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                             ORDER BY d) AS BIGINT)
                   * CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT))
                   AS abs_int
        FROM daily
    ),
    picked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY abs_int DESC, d ASC) AS rn
        FROM scored
    )
    SELECT event_type, d AS change_day,
           ROUND(CAST(abs_int AS DOUBLE) / n_days, 4) AS peak_cusum,
           n_days
    FROM picked WHERE rn = 1
    ORDER BY event_type
"""

QUERIES["cusum_change_point"] = cusum_change_point


# ---------------------------------------------------------------------------
# round 7: distribution-shift statistics and referential-integrity audits
# ---------------------------------------------------------------------------


def mannwhitney_value_shift(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing event values on
    WEEKENDS vs WEEKDAYS per event type — the nonparametric two-sample
    shift test monitoring pipelines run when the metric is skewed and a
    t-test would lie.  Reports 2U (integer-exact, including average
    ranks for ties: sum over distinct values of cnt_weekend *
    (2*min_rank + cnt - 1) is exactly twice the tie-averaged rank sum)
    and the rank-biserial effect size r = 1 - 2U/(n1*n2).

    100 TB shape: raw events reduce to one row per (type, value) in a
    partial+final agg; the rank prefix-sum window runs over that
    aggregate (HashAggregate below the exchange — the sweep-approved
    label-keyed window shape)."""
    ev = table(spark, sf, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    g = ev.select(
        "event_type",
        F.col("ts").cast("date").isNotNull().alias("_"),  # keep slim
        F.weekday("ts").isin(5, 6).cast("bigint").alias("w"),
        "value",
    ).drop("_")
    pv = g.groupBy("event_type", "value").agg(
        F.count("*").alias("cnt"), F.sum("w").alias("cnt_w")
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = pv.select(
        "event_type", "cnt", "cnt_w",
        (F.lit(1) + F.coalesce(F.sum("cnt").over(w_prev), F.lit(0))).alias(
            "min_rank"
        ),
    )
    ag = rk.groupBy("event_type").agg(
        F.sum(
            F.col("cnt_w") * (2 * F.col("min_rank") + F.col("cnt") - 1)
        ).alias("r2w"),
        F.sum("cnt_w").alias("nw"),
        (F.sum("cnt") - F.sum("cnt_w")).alias("nd"),
    )
    u2 = F.col("r2w") - F.col("nw") * (F.col("nw") + 1)
    return ag.select(
        "event_type",
        F.col("nw").cast("bigint").alias("n_weekend"),
        F.col("nd").cast("bigint").alias("n_weekday"),
        u2.cast("bigint").alias("u2_weekend"),
        F.round(
            F.lit(1.0)
            - u2 / F.nullif(F.col("nw") * F.col("nd"), F.lit(0)).cast("double"),
            6,
        ).alias("r_rank_biserial"),
    ).orderBy("event_type")


ORACLE["mannwhitney_value_shift"] = """
    WITH g AS (
        SELECT event_type,
               CASE WHEN isodow(ts) IN (6, 7) THEN 1 ELSE 0 END AS w,
               value
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    pv AS (
        SELECT event_type, value, COUNT(*) AS cnt, SUM(w) AS cnt_w
        FROM g GROUP BY 1, 2
    ),
    rk AS (
        SELECT event_type, cnt, cnt_w,
               1 + COALESCE(SUM(cnt) OVER (PARTITION BY event_type
                                           ORDER BY value
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS min_rank
        FROM pv
    ),
    ag AS (
        SELECT event_type,
               SUM(cnt_w * (2 * min_rank + cnt - 1)) AS r2w,
               SUM(cnt_w) AS nw, SUM(cnt) - SUM(cnt_w) AS nd
        FROM rk GROUP BY event_type
    )
    SELECT event_type,
           CAST(nw AS BIGINT) AS n_weekend,
           CAST(nd AS BIGINT) AS n_weekday,
           CAST(r2w - nw * (nw + 1) AS BIGINT) AS u2_weekend,
           ROUND(1.0 - (r2w - nw * (nw + 1))
                 / CAST(NULLIF(nw * nd, 0) AS DOUBLE), 6) AS r_rank_biserial
    FROM ag ORDER BY event_type
"""

QUERIES["mannwhitney_value_shift"] = mannwhitney_value_shift


def spearman_length_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman rank correlation per language between document length
    (tokens) and lexical diversity (distinct-token count) — the
    screening statistic for "are long docs in this source just repeated
    boilerplate?".  Ranks are permutation ranks with a deterministic
    doc_id tie-break in BOTH engines (documented: tie-broken Spearman,
    not tie-averaged), so rho = 1 - 6*sum(d^2)/(n(n^2-1)) is
    integer-exact until the final division.

    100 TB shape: each rank rides ``_distributed_rank`` (range shuffle
    + broadcast prefix offsets — no per-lang single-task sort); the two
    rank relations join on doc_id (high-cardinality equijoin)."""
    from pinterest_data_pipeline6_spark.operators.textops import (
        _distributed_rank,
    )

    docs = table(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", "lang",
        F.size(toks).cast("bigint").alias("x"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("y"),
    )
    rx = _distributed_rank(
        base.select("lang", F.col("x").alias("score"), "doc_id"),
        group_cols=["lang"],
    ).select("lang", "doc_id", F.col("_grank").alias("rank_x"), "total")
    ry = _distributed_rank(
        base.select("lang", F.col("y").alias("score"), "doc_id"),
        group_cols=["lang"],
    ).select(F.col("doc_id").alias("doc_y"), F.col("_grank").alias("rank_y"))
    j = rx.join(ry, rx.doc_id == ry.doc_y)
    d2 = (F.col("rank_x") - F.col("rank_y")) * (
        F.col("rank_x") - F.col("rank_y")
    )
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(d2).cast("bigint").alias("sum_d2"),
        )
        .select(
            "lang",
            "n_docs",
            "sum_d2",
            F.round(
                F.lit(1.0)
                - F.lit(6.0) * F.col("sum_d2")
                / F.nullif(
                    F.col("n_docs")
                    * (F.col("n_docs") * F.col("n_docs") - 1),
                    F.lit(0),
                ).cast("double"),
                6,
            ).alias("rho_spearman"),
        )
        .orderBy("lang")
    )


ORACLE["spearman_length_diversity"] = """
    WITH base AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   AS y
        FROM documents
    ),
    rx AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY x ASC NULLS FIRST, doc_id ASC)
                   AS rank_x
        FROM base
    ),
    ry AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY y ASC NULLS FIRST, doc_id ASC)
                   AS rank_y
        FROM base
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM((rank_x - rank_y) * (rank_x - rank_y)) AS BIGINT)
               AS sum_d2,
           ROUND(1.0 - 6.0 * SUM((rank_x - rank_y) * (rank_x - rank_y))
                 / CAST(NULLIF(COUNT(*) * (COUNT(*) * COUNT(*) - 1), 0)
                        AS DOUBLE), 6) AS rho_spearman
    FROM rx JOIN ry USING (doc_id)
    GROUP BY lang ORDER BY lang
"""

QUERIES["spearman_length_diversity"] = spearman_length_diversity


def fano_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Fano factor (index of dispersion, variance/mean of DAILY counts)
    per event type — the burstiness monitor: ~1 for a Poisson arrival
    process, >> 1 for bursty/batchy feeds, << 1 for rate-limited ones.
    Population variance cross-multiplied to integers: fano =
    (D*sum(n^2) - S^2) / (D*S) with D days, S total events — one
    bigint expression, one final division.

    100 TB shape: one partial+final agg to #types x #days rows, one
    more to #types rows."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    ag = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("dd"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
    )
    return ag.select(
        "event_type",
        F.col("dd").cast("bigint").alias("n_days"),
        F.round(F.col("s") / F.col("dd").cast("double"), 6).alias(
            "mean_daily"
        ),
        F.round(
            (F.col("dd") * F.col("q") - F.col("s") * F.col("s"))
            / (F.col("dd") * F.col("s")).cast("double"),
            6,
        ).alias("fano_factor"),
    ).orderBy("event_type")


ORACLE["fano_burstiness"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    ag AS (
        SELECT event_type, COUNT(*) AS dd, SUM(n) AS s, SUM(n * n) AS q
        FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(dd AS BIGINT) AS n_days,
           ROUND(s / CAST(dd AS DOUBLE), 6) AS mean_daily,
           ROUND((dd * q - s * s) / CAST(dd * s AS DOUBLE), 6)
               AS fano_factor
    FROM ag ORDER BY event_type
"""

QUERIES["fano_burstiness"] = fano_burstiness


def weekday_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: event count,
    share of the type's volume, and lift vs the uniform 1/7 — the
    shape a scheduler consults before alerting on "low Monday volume".
    Weekday numbering is ISO-Monday=0 in both engines.

    100 TB shape: one partial+final agg to <= #types x 7 rows; the
    share window runs over that aggregate."""
    ev = table(spark, sf, "events").filter(F.col("ts").isNotNull())
    g = ev.groupBy(
        "event_type", F.weekday("ts").cast("int").alias("weekday")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type")
    total = F.sum("n_events").over(w)
    return g.select(
        "event_type",
        "weekday",
        "n_events",
        F.round(F.col("n_events") / total.cast("double"), 6).alias("share"),
        F.round(
            F.lit(7) * F.col("n_events") / total.cast("double"), 6
        ).alias("lift"),
    ).orderBy("event_type", "weekday")


ORACLE["weekday_seasonality"] = """
    WITH g AS (
        SELECT event_type, CAST(isodow(ts) - 1 AS INT) AS weekday,
               COUNT(*) AS n_events
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, weekday, n_events,
           ROUND(n_events / CAST(SUM(n_events) OVER
                 (PARTITION BY event_type) AS DOUBLE), 6) AS share,
           ROUND(7 * n_events / CAST(SUM(n_events) OVER
                 (PARTITION BY event_type) AS DOUBLE), 6) AS lift
    FROM g ORDER BY event_type, weekday
"""

QUERIES["weekday_seasonality"] = weekday_seasonality


def lag1_autocorr_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Lag-1 autocorrelation of daily event counts per type (Pearson
    over consecutive observed-day pairs) — near 0 for independent
    days, high for momentum/trends, negative for see-saw load
    patterns.  All five sums are bigint-exact; the two variance terms
    multiply as doubles only inside the final sqrt.

    100 TB shape: raw events reduce to #types x #days in one agg; the
    lag join is a self-equijoin on (type, rank+1) over that bounded
    aggregate."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    rn = daily.select(
        "event_type", "n", F.row_number().over(w).alias("rn")
    )
    nxt = rn.select(
        F.col("event_type").alias("et2"),
        F.col("n").alias("n2"),
        (F.col("rn") - 1).alias("rn2"),
    )
    pairs = rn.join(
        nxt,
        (F.col("event_type") == F.col("et2")) & (F.col("rn") == F.col("rn2")),
    ).select("event_type", F.col("n").alias("x"), F.col("n2").alias("y"))
    ag = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    den = F.sqrt(vx.cast("double") * vy.cast("double"))
    return ag.select(
        "event_type",
        F.col("m").cast("bigint").alias("n_pairs"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("r1_autocorr"),
    ).orderBy("event_type")


ORACLE["lag1_autocorr_daily"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    rn AS (
        SELECT event_type, n,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    pairs AS (
        SELECT a.event_type, a.n AS x, b.n AS y
        FROM rn a JOIN rn b
          ON a.event_type = b.event_type AND b.rn = a.rn + 1
    ),
    ag AS (
        SELECT event_type, COUNT(*) AS m,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM pairs GROUP BY event_type
    )
    SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
           ROUND((m * sxy - sx * sy)
                 / NULLIF(sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                               * CAST(m * syy - sy * sy AS DOUBLE)), 0.0),
                 6) AS r1_autocorr
    FROM ag ORDER BY event_type
"""

QUERIES["lag1_autocorr_daily"] = lag1_autocorr_daily


def order_reconciliation_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Financial reconciliation audit: per order status, how far
    ``o_totalprice`` diverges from the lineitem-derived expectation
    SUM(extprice * (1-disc) * (1+tax)) — bucketed by relative error,
    with orders that have NO line items ledgered separately (this
    synthetic corpus diverges wildly, which is exactly the point: the
    audit quantifies it instead of assuming TPC-H's invariant).
    Per-row terms go through DECIMAL(18,6) so the per-order sums are
    identical across engines.

    100 TB shape: lineitem reduces per order in one partial+final agg;
    the orders join is key-to-key; the bucket rollup is a second slim
    agg."""
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    expected = li.groupBy("l_orderkey").agg(
        F.sum(
            (
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * (F.lit(1.0) + F.col("l_tax"))
            ).cast("decimal(18,6)")
        ).alias("expected")
    )
    j = orders.select("o_orderkey", "o_orderstatus", "o_totalprice").join(
        expected, orders.o_orderkey == expected.l_orderkey, "left"
    )
    rel = F.abs(
        F.col("o_totalprice") - F.col("expected").cast("double")
    ) / F.col("o_totalprice")
    bucket = (
        F.when(F.col("expected").isNull(), "no_lines")
        .when(rel.isNull(), "undefined")
        .when(rel < 0.001, "exact")
        .when(rel < 0.05, "close")
        .when(rel < 0.25, "off")
        .otherwise("severe")
    )
    return (
        j.select(
            "o_orderstatus",
            bucket.alias("bucket"),
            F.coalesce(rel.cast("decimal(18,6)"), F.lit(0).cast(
                "decimal(18,6)"
            )).alias("rel_d"),
        )
        .groupBy("o_orderstatus", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("rel_d"), 4).cast("double").alias("total_rel_err"),
        )
        .orderBy("o_orderstatus", "bucket")
    )


ORACLE["order_reconciliation_buckets"] = """
    WITH expected AS (
        SELECT l_orderkey,
               SUM(CAST(l_extendedprice * (1.0 - l_discount)
                        * (1.0 + l_tax) AS DECIMAL(18,6))) AS expected
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT o.o_orderstatus,
               e.expected,
               ABS(o.o_totalprice - CAST(e.expected AS DOUBLE))
                   / o.o_totalprice AS rel
        FROM orders o LEFT JOIN expected e ON o.o_orderkey = e.l_orderkey
    ),
    b AS (
        SELECT o_orderstatus,
               CASE WHEN expected IS NULL THEN 'no_lines'
                    WHEN rel IS NULL THEN 'undefined'
                    WHEN rel < 0.001 THEN 'exact'
                    WHEN rel < 0.05 THEN 'close'
                    WHEN rel < 0.25 THEN 'off'
                    ELSE 'severe' END AS bucket,
               COALESCE(CAST(rel AS DECIMAL(18,6)),
                        CAST(0 AS DECIMAL(18,6))) AS rel_d
        FROM j
    )
    SELECT o_orderstatus, bucket, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(rel_d), 4) AS DOUBLE) AS total_rel_err
    FROM b GROUP BY 1, 2 ORDER BY o_orderstatus, bucket
"""

QUERIES["order_reconciliation_buckets"] = order_reconciliation_buckets


_FK_EDGES = [
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_orphan_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity orphan census over every FK edge of the
    star schema: child rows whose key matches no parent (orphans) and
    child rows with a NULL key, per edge — the one-screen integrity
    report run before any join-based analytics is trusted.  The keyed
    subset perturbation (which breaks FKs on purpose) gives this real
    non-zero signal.

    100 TB shape: per edge one left join of the child against the
    DISTINCT parent keys (dimension sides broadcast; the lineitem ->
    orders edge is the only fact-fact one and it joins key-to-key),
    all rolled up map-side into one row per edge."""
    rows = []
    for name, child, fk, parent, pk in _FK_EDGES:
        c = table(spark, sf, child).select(F.col(fk).alias("fk"))
        p = table(spark, sf, parent).select(F.col(pk).alias("pk")).distinct()
        j = c.join(p, c.fk == p.pk, "left")
        rows.append(
            j.agg(
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.col("fk").isNull().cast("bigint")).cast(
                    "bigint"
                ).alias("n_null_keys"),
                F.sum(
                    (F.col("fk").isNotNull() & F.col("pk").isNull()).cast(
                        "bigint"
                    )
                ).cast("bigint").alias("n_orphans"),
            ).select(F.lit(name).alias("edge"), "*")
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("edge")


ORACLE["fk_orphan_audit"] = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS edge, COUNT(*) AS n_child,
           CAST(SUM(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_keys,
           CAST(SUM(CASE WHEN c.{fk} IS NOT NULL AND p.pk IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM {child} c LEFT JOIN
         (SELECT DISTINCT {pk} AS pk FROM {parent}) p ON c.{fk} = p.pk
    """
    for name, child, fk, parent, pk in _FK_EDGES
) + "\nORDER BY edge"

QUERIES["fk_orphan_audit"] = fk_orphan_audit


def winsorized_mean_prices(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorized mean of order totals per priority: values are clipped
    at the exact P5/P95 element picks (smallest rank r with 100r >=
    5n / 95n — integer rationals, never interpolated) before
    averaging, the robust location estimate reporting pipelines use
    when a handful of whale orders would swing the plain mean.

    100 TB shape: the per-group rank rides ``_distributed_rank`` (range
    shuffle, no single-task per-group sort); thresholds reduce to one
    row per priority and broadcast back onto the ranked rows; sums go
    through DECIMAL(18,6)."""
    from pinterest_data_pipeline6_spark.operators.textops import (
        _distributed_rank,
    )

    orders = table(spark, sf, "orders")
    scored = orders.select(
        "o_orderpriority",
        F.col("o_totalprice").alias("score"),
        F.col("o_orderkey").alias("doc_id"),
    )
    ranked = _distributed_rank(scored, group_cols=["o_orderpriority"])
    lo_rank = F.expr("(5 * total + 99) div 100")
    hi_rank = F.expr("(95 * total + 99) div 100")
    th = ranked.groupBy("o_orderpriority").agg(
        F.min(F.when(F.col("_grank") == lo_rank, F.col("score"))).alias(
            "p05"
        ),
        F.min(F.when(F.col("_grank") == hi_rank, F.col("score"))).alias(
            "p95"
        ),
    )
    j = ranked.join(F.broadcast(th), "o_orderpriority")
    clipped = F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("score")))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("p05"), 2).alias("p05"),
            F.round(F.min("p95"), 2).alias("p95"),
            F.round(
                F.sum(clipped.cast("decimal(18,6)"))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).cast("double").alias("winsorized_mean"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE["winsorized_mean_prices"] = """
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice AS score,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice ASC NULLS FIRST,
                                           o_orderkey ASC) AS rk,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS total
        FROM orders
    ),
    th AS (
        SELECT o_orderpriority,
               MIN(CASE WHEN rk = (5 * total + 99) // 100 THEN score END)
                   AS p05,
               MIN(CASE WHEN rk = (95 * total + 99) // 100 THEN score END)
                   AS p95
        FROM ranked GROUP BY o_orderpriority
    )
    SELECT r.o_orderpriority, COUNT(*) AS n_orders,
           ROUND(MIN(t.p05), 2) AS p05,
           ROUND(MIN(t.p95), 2) AS p95,
           CAST(ROUND(SUM(CAST(GREATEST(t.p05, LEAST(t.p95, r.score))
                               AS DECIMAL(18,6)))
                      / CAST(COUNT(*) AS DOUBLE), 4) AS DOUBLE)
               AS winsorized_mean
    FROM ranked r JOIN th t USING (o_orderpriority)
    GROUP BY r.o_orderpriority ORDER BY r.o_orderpriority
"""

QUERIES["winsorized_mean_prices"] = winsorized_mean_prices


def page_hinkley_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Page-Hinkley drift detection on daily event volume — the
    sequential-change statistic that complements ``cusum_change_point``:
    instead of the single global |CUSUM| peak it tracks the rise of the
    cumulative deviation above its RUNNING TROUGH (upward shift) and
    the fall below its running crest (downward shift), which is what
    catches a sustained level change that starts mid-series.  Per
    type: both drift magnitudes and the day each peaks.

    Integer-exact like the CUSUM entry: u_t = D*prefix_t - t*S is
    bigint, the running min/max are window extrema over it, and the
    argmax ranks on the exact integers (earliest-day ties); the
    reported drift divides once by D.

    100 TB shape: raw events reduce to #types x #days in one agg;
    every window runs over that bounded aggregate."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    w_ord = wt.orderBy("d")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    u = (
        F.count(F.lit(1)).over(wt).cast("bigint")
        * F.sum("n").over(w_cum).cast("bigint")
        - F.row_number().over(w_ord).cast("bigint")
        * F.sum("n").over(wt).cast("bigint")
    )
    scored = daily.select(
        "event_type",
        "d",
        F.count(F.lit(1)).over(wt).cast("bigint").alias("n_days"),
        (u - F.min(u).over(w_cum)).alias("up_i"),
        (F.max(u).over(w_cum) - u).alias("down_i"),
    )
    w_up = wt.orderBy(F.desc("up_i"), F.asc("d"))
    w_dn = wt.orderBy(F.desc("down_i"), F.asc("d"))
    picked = scored.select(
        "event_type",
        "d",
        "n_days",
        "up_i",
        "down_i",
        F.row_number().over(w_up).alias("r_up"),
        F.row_number().over(w_dn).alias("r_dn"),
    ).filter((F.col("r_up") == 1) | (F.col("r_dn") == 1))
    return (
        picked.groupBy("event_type")
        .agg(
            F.max("n_days").alias("n_days"),
            F.round(
                F.max(F.when(F.col("r_up") == 1, F.col("up_i")))
                / F.max("n_days").cast("double"),
                4,
            ).alias("up_drift"),
            F.min(F.when(F.col("r_up") == 1, F.col("d"))).alias("up_day"),
            F.round(
                F.max(F.when(F.col("r_dn") == 1, F.col("down_i")))
                / F.max("n_days").cast("double"),
                4,
            ).alias("down_drift"),
            F.min(F.when(F.col("r_dn") == 1, F.col("d"))).alias("down_day"),
        )
        .orderBy("event_type")
    )


ORACLE["page_hinkley_drift"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, d,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_days,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               * CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY d
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               - CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY d) AS BIGINT)
               * CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
                   AS u
        FROM daily
    ),
    drift AS (
        SELECT event_type, d, n_days,
               u - MIN(u) OVER (PARTITION BY event_type ORDER BY d
                                ROWS UNBOUNDED PRECEDING) AS up_i,
               MAX(u) OVER (PARTITION BY event_type ORDER BY d
                            ROWS UNBOUNDED PRECEDING) - u AS down_i
        FROM scored
    ),
    picked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY up_i DESC, d ASC) AS r_up,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY down_i DESC, d ASC) AS r_dn
        FROM drift
    )
    SELECT event_type,
           MAX(n_days) AS n_days,
           ROUND(MAX(CASE WHEN r_up = 1 THEN up_i END)
                 / CAST(MAX(n_days) AS DOUBLE), 4) AS up_drift,
           MIN(CASE WHEN r_up = 1 THEN d END) AS up_day,
           ROUND(MAX(CASE WHEN r_dn = 1 THEN down_i END)
                 / CAST(MAX(n_days) AS DOUBLE), 4) AS down_drift,
           MIN(CASE WHEN r_dn = 1 THEN d END) AS down_day
    FROM picked WHERE r_up = 1 OR r_dn = 1
    GROUP BY event_type ORDER BY event_type
"""

QUERIES["page_hinkley_drift"] = page_hinkley_drift


def mad_robust_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Median-absolute-deviation outlier audit of event values per
    type — the robust twin of z-score outlier detection (median/MAD
    shrug off the very whales a mean/stddev rule would be dragged by).
    Flags events whose modified z-score 0.6745*|x-med|/MAD exceeds 3.5
    (Iglewicz-Hoaglin convention).

    MAD=0 convention: when a single value is shared by more than half
    of a group, MAD degenerates to 0 and the modified z-score is
    undefined.  This audit deliberately flags EVERY event with any
    nonzero deviation in that case (6745*dev > 0 for dev > 0): a
    majority-constant metric is exactly the regime where any departure
    from the constant is anomalous, and the cross-multiplied predicate
    keeps the convention identical cross-engine (no 0/0 NaN paths).
    Pinned by a property test against a Python reference including the
    MAD=0 corner (tests/test_properties.py::test_mad_outliers_*).

    Determinism contract: median and MAD are exact element picks
    (smallest rank r with 100r >= 50n, unique (value, event_id) sort
    key — never interpolated); the outlier test cross-multiplies
    (6745*dev > 35000*mad) so no division touches the comparison, and
    both engines evaluate the identical IEEE products.

    100 TB shape: both ranked passes ride ``_distributed_rank`` (range
    shuffle + broadcast prefix counts — no single-task per-group
    sort); each pass reduces to one row per event_type that broadcasts
    back.  No window over raw data anywhere."""
    from pinterest_data_pipeline6_spark.operators.textops import (
        _distributed_rank,
    )

    ev = widen_small_scan(
        table(spark, sf, "events").filter(F.col("value").isNotNull())
    )
    scored = ev.select(
        "event_type",
        F.col("value").alias("score"),
        F.col("event_id").alias("doc_id"),
    )
    r1 = _distributed_rank(scored, group_cols=["event_type"])
    med_rank = F.expr("(50 * total + 99) div 100")
    med = r1.groupBy("event_type").agg(
        F.min(F.when(F.col("_grank") == med_rank, F.col("score"))).alias(
            "med"
        )
    )
    dev = (
        scored.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.col("score").alias("value"),
            F.abs(F.col("score") - F.col("med")).alias("score"),
            "doc_id",
            "med",
        )
    )
    r2 = _distributed_rank(
        dev.select("event_type", "score", "doc_id"), group_cols=["event_type"]
    )
    mad = r2.groupBy("event_type").agg(
        F.min(F.when(F.col("_grank") == med_rank, F.col("score"))).alias(
            "mad"
        )
    )
    flagged = dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "med",
        "mad",
        (
            (F.col("score") * F.lit(6745.0)) > (F.col("mad") * F.lit(35000.0))
        ).cast("bigint").alias("is_out"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("med"), 6).alias("median_value"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum("is_out").alias("n_outliers"),
            F.round(
                F.sum("is_out").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )


ORACLE["mad_robust_outliers"] = """
    WITH scored AS (
        SELECT event_type, value AS score, event_id
        FROM events WHERE value IS NOT NULL
    ),
    r1 AS (
        SELECT event_type, score,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY score ASC NULLS FIRST,
                                           event_id ASC) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS total
        FROM scored
    ),
    med AS (
        SELECT event_type,
               MIN(CASE WHEN rk = (50 * total + 99) // 100
                        THEN score END) AS med
        FROM r1 GROUP BY event_type
    ),
    dev AS (
        SELECT s.event_type, s.score AS value,
               ABS(s.score - m.med) AS dscore, s.event_id, m.med
        FROM scored s JOIN med m USING (event_type)
    ),
    r2 AS (
        SELECT event_type, dscore,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY dscore ASC NULLS FIRST,
                                           event_id ASC) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS total
        FROM dev
    ),
    mad AS (
        SELECT event_type,
               MIN(CASE WHEN rk = (50 * total + 99) // 100
                        THEN dscore END) AS mad
        FROM r2 GROUP BY event_type
    )
    SELECT d.event_type, COUNT(*) AS n_events,
           ROUND(MIN(d.med), 6) AS median_value,
           ROUND(MIN(a.mad), 6) AS mad,
           CAST(SUM(CAST(d.dscore * 6745.0 > a.mad * 35000.0 AS BIGINT))
                AS BIGINT) AS n_outliers,
           ROUND(CAST(SUM(CAST(d.dscore * 6745.0 > a.mad * 35000.0
                               AS BIGINT)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
"""

QUERIES["mad_robust_outliers"] = mad_robust_outliers


def moment_stats_family(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-shape profile of lineitem quantity per return
    flag: mean, population variance, skewness (g1) and excess
    kurtosis (g2) — the four-moment summary a data-quality dashboard
    tracks to catch silent generator / upstream-schema drift that
    leaves counts and means untouched.

    Determinism contract: quantity scales to integer centiunits via
    ROUND(v*100); the four power sums S1..S4 accumulate as exact
    DECIMAL integers (widths sized for ≤1e9 rows per group — S4 ≤
    1e9 * (5000^4) needs 25 digits); the moment formulas then run in
    double ON IDENTICAL EXACT INPUTS in both engines (skew/kurtosis
    are scale-invariant, so the x100 cancels; variance divides once
    by 100^2).  Built-in skewness()/kurtosis() are order-dependent
    double accumulations — exactly what this entry avoids.

    100 TB shape: ONE partial+final agg per flag; map-side combine
    carries the four sums.  Nothing else moves."""
    li = table(spark, sf, "lineitem").filter(F.col("l_quantity").isNotNull())
    q = F.round(F.col("l_quantity") * 100).cast("decimal(6,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
        F.sum(q).cast("decimal(16,0)").alias("s1"),
        F.sum(q * q).cast("decimal(19,0)").alias("s2"),
        F.sum(q * q * q).cast("decimal(22,0)").alias("s3"),
        F.sum(q * q * q * q).cast("decimal(25,0)").alias("s4"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd
    m3 = F.col("s3").cast("double") / nd
    m4 = F.col("s4").cast("double") / nd
    var_s = m2 - m1 * m1
    skew = (m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1) / F.nullif(
        var_s * F.sqrt(var_s), F.lit(0.0)
    )
    kurt = (
        m4
        - F.lit(4.0) * m1 * m3
        + F.lit(6.0) * m1 * m1 * m2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    ) / F.nullif(var_s * var_s, F.lit(0.0)) - F.lit(3.0)
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(m1 / F.lit(100.0), 6).alias("mean_qty"),
        F.round(var_s / F.lit(10000.0), 6).alias("var_qty"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")


ORACLE["moment_stats_family"] = """
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)) AS s1,
               SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)
                   * CAST(ROUND(l_quantity * 100) AS HUGEINT)) AS s2,
               SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)
                   * CAST(ROUND(l_quantity * 100) AS HUGEINT)
                   * CAST(ROUND(l_quantity * 100) AS HUGEINT)) AS s3,
               SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)
                   * CAST(ROUND(l_quantity * 100) AS HUGEINT)
                   * CAST(ROUND(l_quantity * 100) AS HUGEINT)
                   * CAST(ROUND(l_quantity * 100) AS HUGEINT)) AS s4
        FROM lineitem WHERE l_quantity IS NOT NULL
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
               AS mean_qty,
           ROUND((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                 / 10000.0, 6) AS var_qty,
           ROUND((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
                  - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                  + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                 / NULLIF((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                          * SQRT(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                                   * (CAST(s1 AS DOUBLE)
                                      / CAST(n AS DOUBLE))), 0.0), 6)
               AS skewness,
           ROUND((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
                  - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                  + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                  - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                 / NULLIF((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                          * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                             - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                               * (CAST(s1 AS DOUBLE)
                                  / CAST(n AS DOUBLE))), 0.0)
                 - 3.0, 6) AS excess_kurtosis
    FROM m ORDER BY l_returnflag
"""

QUERIES["moment_stats_family"] = moment_stats_family


def shewhart_control_limits(spark: SparkSession, sf: str) -> DataFrame:
    """Shewhart 3-sigma control chart over daily event volume per type
    — the classical SPC monitor that completes this module's
    sequential-detection triad (Shewhart catches SPIKES the cumulative
    CUSUM / Page-Hinkley statistics smooth over).  Per type: the
    center line, sigma, and how many days breach the upper / lower
    3-sigma limits.

    Determinism contract: the breach test never touches a double —
    |n*c - S1| > 3*sigma*n cross-multiplies to (n*c - S1)^2 >
    9*(n*S2 - S1^2), all exact DECIMAL integers (widths sized for
    ≤1e5 days and ≤1e9 events/day/type); mean and sigma go double
    only in the final report columns.

    100 TB shape: raw events reduce to #types x #days in ONE agg
    (single scan); the moment sums ride a window over that bounded
    aggregate — partitioned by event_type, so no join and no second
    pass over the reduction."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("decimal(12,0)").alias("c"))
    w = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = daily.select(
        "event_type",
        "c",
        F.count(F.lit(1)).over(w).cast("decimal(6,0)").alias("n"),
        F.sum("c").over(w).cast("decimal(15,0)").alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("decimal(24,0)").alias(
            "s2"
        ),
    )
    dev = (F.col("n") * F.col("c") - F.col("s1")).cast("decimal(15,0)")
    lhs = dev * dev
    rhs = F.lit(9).cast("decimal(1,0)") * (
        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    )
    flags = j.select(
        "event_type",
        "n",
        "s1",
        "s2",
        F.when((lhs > rhs) & (dev > 0), 1).otherwise(0).alias("out_hi"),
        F.when((lhs > rhs) & (dev < 0), 1).otherwise(0).alias("out_lo"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    sigma = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    ) / nd
    return (
        flags.groupBy("event_type")
        .agg(
            F.max("n").alias("nn"),
            F.max("s1").alias("s1"),
            F.max("s2").alias("s2"),
            F.sum("out_hi").alias("n_out_hi"),
            F.sum("out_lo").alias("n_out_lo"),
        )
        .withColumnRenamed("nn", "n")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.round(mean, 4).alias("mean_daily"),
            F.round(sigma, 6).alias("sigma_daily"),
            "n_out_hi",
            "n_out_lo",
        )
        .orderBy("event_type")
    )


ORACLE["shewhart_control_limits"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS HUGEINT) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    m AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(c) AS s1, SUM(c * c) AS s2
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(MAX(m.n) AS BIGINT) AS n_days,
           ROUND(CAST(MAX(m.s1) AS DOUBLE) / CAST(MAX(m.n) AS DOUBLE), 4)
               AS mean_daily,
           ROUND(SQRT(CAST(MAX(m.n) * MAX(m.s2)
                           - MAX(m.s1) * MAX(m.s1) AS DOUBLE))
                 / CAST(MAX(m.n) AS DOUBLE), 6) AS sigma_daily,
           CAST(SUM(CASE WHEN (m.n * d.c - m.s1) * (m.n * d.c - m.s1)
                              > 9 * (m.n * m.s2 - m.s1 * m.s1)
                          AND m.n * d.c - m.s1 > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_out_hi,
           CAST(SUM(CASE WHEN (m.n * d.c - m.s1) * (m.n * d.c - m.s1)
                              > 9 * (m.n * m.s2 - m.s1 * m.s1)
                          AND m.n * d.c - m.s1 < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_out_lo
    FROM daily d JOIN m USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
"""

QUERIES["shewhart_control_limits"] = shewhart_control_limits


def kendall_tau_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall tau-b rank correlation per event type between daily
    VOLUME and daily VALUE — the robust monotone-association check
    that complements tie-broken Spearman: tau is built from pairwise
    concordance, so a single wild day moves it by at most 1/n0, and
    tau-b's tie terms keep it honest on plateaued series.

    Determinism contract: concordant / discordant / tie counts are
    exact integers over (count, DECIMAL-exact value-sum) pairs; the
    tie corrections t(t-1)/2 come from integer group sizes; only the
    final tau divides, in double, on identical exact operands.

    100 TB shape: raw events reduce to #types x #days in one agg; the
    O(days^2) pair join runs on that bounded aggregate (same argument
    as quality_trend_theilsen — ~500 rows join ~500 rows per type,
    K-invariant under fact replication); tie terms are two more tiny
    aggs."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.coalesce(
            F.sum(F.col("value").cast("decimal(18,6)")),
            F.lit(0).cast("decimal(28,6)"),
        ).alias("y"),
    )
    a = daily.select(
        "event_type", F.col("d").alias("d_a"),
        F.col("x").alias("x_a"), F.col("y").alias("y_a"),
    )
    b = daily.select(
        "event_type", F.col("d").alias("d_b"),
        F.col("x").alias("x_b"), F.col("y").alias("y_b"),
    )
    sgn = (
        (F.col("x_a") < F.col("x_b")).cast("int")
        - (F.col("x_a") > F.col("x_b")).cast("int")
    ) * (
        (F.col("y_a") < F.col("y_b")).cast("int")
        - (F.col("y_a") > F.col("y_b")).cast("int")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("d_a") < F.col("d_b"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n0"),
            F.sum((sgn == 1).cast("bigint")).alias("n_concordant"),
            F.sum((sgn == -1).cast("bigint")).alias("n_discordant"),
        )
    )
    tx = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("bigint").alias(
                "tie_x"
            )
        )
    )
    ty = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("bigint").alias(
                "tie_y"
            )
        )
    )
    j = pairs.join(F.broadcast(tx), "event_type").join(
        F.broadcast(ty), "event_type"
    )
    num = (F.col("n_concordant") - F.col("n_discordant")).cast("double")
    den = F.sqrt(
        (F.col("n0") - F.col("tie_x")).cast("double")
        * (F.col("n0") - F.col("tie_y")).cast("double")
    )
    return j.select(
        "event_type",
        "n0",
        "n_concordant",
        "n_discordant",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("tau_b"),
    ).orderBy("event_type")


ORACLE["kendall_tau_daily"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               COUNT(*) AS x,
               COALESCE(SUM(CAST(value AS DECIMAL(18,6))),
                        CAST(0 AS DECIMAL(28,6))) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    pairs AS (
        SELECT a.event_type,
               CAST(COUNT(*) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN (CASE WHEN a.x < b.x THEN 1
                                        WHEN a.x > b.x THEN -1 ELSE 0 END)
                             * (CASE WHEN a.y < b.y THEN 1
                                     WHEN a.y > b.y THEN -1 ELSE 0 END) = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_concordant,
               CAST(SUM(CASE WHEN (CASE WHEN a.x < b.x THEN 1
                                        WHEN a.x > b.x THEN -1 ELSE 0 END)
                             * (CASE WHEN a.y < b.y THEN 1
                                     WHEN a.y > b.y THEN -1 ELSE 0 END) = -1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_discordant
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY a.event_type
    ),
    tx AS (
        SELECT event_type,
               CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS tie_x
        FROM (SELECT event_type, x, COUNT(*) AS t
              FROM daily GROUP BY event_type, x)
        GROUP BY event_type
    ),
    ty AS (
        SELECT event_type,
               CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS tie_y
        FROM (SELECT event_type, y, COUNT(*) AS t
              FROM daily GROUP BY event_type, y)
        GROUP BY event_type
    )
    SELECT p.event_type, p.n0, p.n_concordant, p.n_discordant,
           ROUND(CAST(p.n_concordant - p.n_discordant AS DOUBLE)
                 / NULLIF(SQRT(CAST(p.n0 - tx.tie_x AS DOUBLE)
                               * CAST(p.n0 - ty.tie_y AS DOUBLE)), 0.0), 6)
               AS tau_b
    FROM pairs p JOIN tx USING (event_type) JOIN ty USING (event_type)
    ORDER BY p.event_type
"""

QUERIES["kendall_tau_daily"] = kendall_tau_daily


def runs_test_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the direction of daily volume moves
    per event type — the classical randomness check that catches
    oscillation (too many runs: load balancer flapping, dedup
    double-fires) and stickiness (too few runs: ramps, outages) that
    magnitude-based monitors miss entirely.  Zero-change days drop out
    (standard convention).

    Determinism contract: run boundaries, n_up, n_down are exact
    integers from sign comparisons; the z-score's expectation
    mu = 2*n_up*n_down/n + 1 and variance
    (mu-1)*(mu-2)/(n-1) evaluate in double from those exact integers,
    identically in both engines.

    100 TB shape: raw events reduce to #types x #days in one agg;
    both lag windows run over that bounded aggregate."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("d")
    moves = (
        daily.select(
            "event_type",
            "d",
            (F.col("c") - F.lag("c").over(w)).alias("delta"),
        )
        .filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
        .select(
            "event_type", "d", (F.col("delta") > 0).cast("int").alias("s")
        )
    )
    w2 = Window.partitionBy("event_type").orderBy("d")
    runs = moves.select(
        "event_type",
        "s",
        F.when(
            F.lag("s").over(w2).isNull()
            | (F.lag("s").over(w2) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("run_start"),
    )
    agg = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.sum("s").cast("bigint").alias("n_up"),
        F.sum(F.lit(1) - F.col("s")).cast("bigint").alias("n_down"),
        F.sum("run_start").cast("bigint").alias("n_runs"),
    )
    nd = F.col("n_moves").cast("double")
    mu = (
        F.lit(2.0) * F.col("n_up").cast("double")
        * F.col("n_down").cast("double") / nd
        + F.lit(1.0)
    )
    var = (mu - F.lit(1.0)) * (mu - F.lit(2.0)) / F.nullif(
        nd - F.lit(1.0), F.lit(0.0)
    )
    z = (F.col("n_runs").cast("double") - mu) / F.nullif(
        F.sqrt(var), F.lit(0.0)
    )
    return agg.select(
        "event_type",
        "n_moves",
        "n_up",
        "n_down",
        "n_runs",
        F.round(z, 6).alias("z_runs"),
    ).orderBy("event_type")


ORACLE["runs_test_daily"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    moves AS (
        SELECT event_type, d,
               CAST(c - LAG(c) OVER (PARTITION BY event_type ORDER BY d)
                    > 0 AS INT) AS s
        FROM (SELECT event_type, d, c FROM daily)
        QUALIFY c - LAG(c) OVER (PARTITION BY event_type ORDER BY d)
                IS NOT NULL
            AND c - LAG(c) OVER (PARTITION BY event_type ORDER BY d) <> 0
    ),
    runs AS (
        SELECT event_type, s,
               CASE WHEN LAG(s) OVER (PARTITION BY event_type ORDER BY d)
                         IS NULL
                     OR LAG(s) OVER (PARTITION BY event_type ORDER BY d)
                         <> s
                    THEN 1 ELSE 0 END AS run_start
        FROM moves
    ),
    agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_moves,
               CAST(SUM(s) AS BIGINT) AS n_up,
               CAST(SUM(1 - s) AS BIGINT) AS n_down,
               CAST(SUM(run_start) AS BIGINT) AS n_runs
        FROM runs GROUP BY event_type
    )
    SELECT event_type, n_moves, n_up, n_down, n_runs,
           ROUND((CAST(n_runs AS DOUBLE)
                  - (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                     / CAST(n_moves AS DOUBLE) + 1.0))
                 / NULLIF(SQRT((2.0 * CAST(n_up AS DOUBLE)
                                * CAST(n_down AS DOUBLE)
                                / CAST(n_moves AS DOUBLE) + 1.0 - 1.0)
                               * (2.0 * CAST(n_up AS DOUBLE)
                                  * CAST(n_down AS DOUBLE)
                                  / CAST(n_moves AS DOUBLE) + 1.0 - 2.0)
                               / NULLIF(CAST(n_moves AS DOUBLE) - 1.0,
                                        0.0)), 0.0), 6)
               AS z_runs
    FROM agg ORDER BY event_type
"""

QUERIES["runs_test_daily"] = runs_test_daily
