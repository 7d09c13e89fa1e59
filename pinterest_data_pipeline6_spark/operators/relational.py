"""Relational operator inventory (SURVEY.md §2) retargeted onto the
driver's TPC-H-ish testdata tables, with DuckDB oracle SQL twins.

Each reference query Q1-Q8 (SURVEY.md §2.12; "(Clone) Pinterest Data
Cleaning and Queries.py" BATCH:111-322) is re-expressed over
orders/customer/nation with the same operator combination:

  pin      -> orders         (fact; category -> o_orderpriority)
  geo      -> customer x nation (country -> n_name)
  user     -> customer       (age bucket -> c_acctbal bucket)
  follower_count -> c_acctbal / o_totalprice

The domain-table (pin/geo/user) forms live in operators/analytics.py and
are differentially tested against DuckDB in tests/test_analytics.py;
these retargets are what the driver's oracle harness runs at sf0.01.

Determinism contract (required for value-hash equality with DuckDB):
- double SUMs go through DECIMAL(18,2) so partial-aggregation order
  cannot change the result; final value is cast back to double;
- medians use exact ``percentile``/``quantile_cont`` (both linear
  interpolation), rounded to 4 decimals — cross-engine approx sketches
  (Greenwald-Khanna vs t-digest) would never hash-match; the
  reference-faithful ``percentile_approx`` form is exercised in the
  domain queries (analytics.py) where both sides are Spark;
- windows/top-k always carry a unique tie-break key;
- YEAR()/size() results are cast to int on both sides.

Scale notes: every groupBy here is partial+final hash agg; the
customer⋈nation join broadcasts nation; orders⋈customer shuffles on the
join key (AQE re-splits skew); ORDER BY..LIMIT k compiles to
TakeOrderedAndProject. Verified via .explain in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pinterest_data_pipeline6_spark.sources.readers import table, widen_small_scan


def _bucket(col: Column) -> Column:
    """CASE bucketing of account balance (A6 analog of the reference's
    age buckets, BATCH:196-201)."""
    return (
        F.when(col < 0, "neg")
        .when(col < 3000, "low")
        .when(col < 7000, "mid")
        .otherwise("high")
    )


_BUCKET_SQL = """CASE WHEN c_acctbal < 0 THEN 'neg'
                      WHEN c_acctbal < 3000 THEN 'low'
                      WHEN c_acctbal < 7000 THEN 'mid'
                      ELSE 'high' END"""


def _dec_sum_as_double(col: str, alias: str, scale: int = 2) -> Column:
    """Order-independent double sum: route through DECIMAL so the result
    does not depend on partial-aggregation order across partitions."""
    return F.round(
        F.sum(F.col(col).cast("decimal(18,2)")).cast("double"), scale
    ).alias(alias)


# ---------------------------------------------------------------------------
# Q1-Q8 retargets
# ---------------------------------------------------------------------------


def q1_category_per_country(spark: SparkSession, sf: str) -> DataFrame:
    """J1+A1+A5 (BATCH:111-123): count per (country, category)."""
    orders, customer, nation = (table(spark, sf, t) for t in ("orders", "customer", "nation"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("country"), F.col("o_orderpriority").alias("category"))
        .agg(F.count("*").alias("category_count"))
        .distinct()
    )


def q2_count_per_year(spark: SparkSession, sf: str) -> DataFrame:
    """J1+P7+F7+A1+O1 (BATCH:130-145): count per (year, category), range-filtered."""
    orders, customer, nation = (table(spark, sf, t) for t in ("orders", "customer", "nation"))
    return (
        orders
        # range form of YEAR(d) BETWEEN 1996 AND 2000: a year() wrapper
        # blocks parquet pushdown (only IsNotNull reaches the scan); the
        # equivalent date range prunes row groups on o_orderdate min/max
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") <= F.lit("2000-12-31"))
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .withColumn("post_year", F.year("o_orderdate").cast("int"))
        .groupBy("post_year", F.col("o_orderpriority").alias("category"))
        .agg(F.count("*").alias("category_count"))
        .orderBy("post_year")
    )


def q3a_top_account_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    """W1+P8 (BATCH:151-174): per-group top-1 via row_number."""
    customer, nation = (table(spark, sf, t) for t in ("customer", "nation"))
    w = Window.partitionBy("country").orderBy(F.desc("top_acctbal"), F.asc("custkey"))
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("country"),
            F.col("c_name").alias("top_customer"),
            F.col("c_acctbal").alias("top_acctbal"),
            F.col("c_custkey").alias("custkey"),
        )
        .withColumn("row_num", F.row_number().over(w))
        .filter(F.col("row_num") == 1)
        .select("country", "top_customer", "top_acctbal")
    )


def q3b_global_top_account(spark: SparkSession, sf: str) -> DataFrame:
    """O4 (BATCH:176-185): global top-1 (TakeOrderedAndProject)."""
    return (
        q3a_top_account_per_nation(spark, sf)
        .orderBy(F.desc("top_acctbal"), F.asc("country"))
        .limit(1)
        .select("country", "top_acctbal")
    )


def q4_distinct_pairs_per_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """A6+J2+A2+O2 (BATCH:192-222): multi-arg COUNT DISTINCT per bucket."""
    orders, customer = (table(spark, sf, t) for t in ("orders", "customer"))
    bucketed = customer.select("c_custkey", _bucket(F.col("c_acctbal")).alias("bucket"))
    return (
        bucketed.join(orders, bucketed.c_custkey == orders.o_custkey)
        .groupBy("bucket", F.col("o_orderpriority").alias("category"))
        .agg(F.count_distinct("c_custkey", "o_orderpriority").alias("category_count"))
        .orderBy(F.asc("bucket"), F.desc("category_count"))
    )


def q5_median_price_per_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """A6+J2+A4 (BATCH:228-254): median order price per balance bucket.

    Exact percentile (sort-based, deterministic) so the DuckDB oracle can
    match; the sketch-based reference form (percentile_approx) is kept in
    the domain workload where both compared engines are Spark."""
    orders, customer = (table(spark, sf, t) for t in ("orders", "customer"))
    bucketed = customer.select("c_custkey", _bucket(F.col("c_acctbal")).alias("bucket"))
    return (
        bucketed.join(orders, bucketed.c_custkey == orders.o_custkey)
        .groupBy("bucket")
        .agg(F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_total_price"))
        .orderBy(F.desc("median_total_price"))
    )


def q6_customers_per_year(spark: SparkSession, sf: str) -> DataFrame:
    """F7+A3+O3 (BATCH:259-270): distinct customers per order year."""
    orders = table(spark, sf, "orders")
    return (
        orders.withColumn("post_year", F.year("o_orderdate").cast("int"))
        .groupBy("post_year")
        .agg(F.count_distinct("o_custkey").alias("number_customers"))
        .orderBy(F.desc("post_year"))
    )


def q7_median_price_per_year(spark: SparkSession, sf: str) -> DataFrame:
    """J3+F7+A4+O1 (BATCH:275-288): median price per year."""
    orders, customer = (table(spark, sf, t) for t in ("orders", "customer"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .withColumn("post_year", F.year("o_orderdate").cast("int"))
        .groupBy("post_year")
        .agg(F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_total_price"))
        .orderBy(F.asc("post_year"))
    )


def q8_median_price_bucket_year(spark: SparkSession, sf: str) -> DataFrame:
    """A6+J4+F7+A4+O2 (BATCH:293-322): 3-way join, median per (bucket, year)."""
    orders, customer = (table(spark, sf, t) for t in ("orders", "customer"))
    buckets = customer.select(
        F.col("c_custkey").alias("b_custkey"), _bucket(F.col("c_acctbal")).alias("bucket")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(buckets, F.col("c_custkey") == F.col("b_custkey"))
        .withColumn("post_year", F.year("o_orderdate").cast("int"))
        .groupBy("bucket", "post_year")
        .agg(F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_total_price"))
        .orderBy(F.desc("bucket"), F.desc("post_year"))
    )


# ---------------------------------------------------------------------------
# Operator-coverage entries
# ---------------------------------------------------------------------------


def scan_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    """S2+P1+P7 pushdown scan: year filter + tight projection; revenue is
    a row-local double expression (deterministic)."""
    li = table(spark, sf, "lineitem")
    return (
        li.filter(
            # range form of year(l_shipdate)=1998 — pushdown-friendly
            (F.col("l_shipdate") >= F.lit("1998-01-01"))
            & (F.col("l_shipdate") <= F.lit("1998-12-31"))
            & (F.col("l_quantity") < 10)
        )
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("int").alias("l_linenumber"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


def sentinel_null_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """P5 (BATCH:61-65): sentinel->NULL across ALL string columns, then
    null accounting per column."""
    from pinterest_data_pipeline6_spark.functions.cleaning import normalize_sentinels

    docs = table(spark, sf, "documents")
    normed = normalize_sentinels(docs, ["en", "src3"])
    return normed.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("lang")).alias("n_lang_null"),
        (F.count("*") - F.count("source")).alias("n_source_null"),
        (F.count("*") - F.count("text")).alias("n_text_null"),
    )


def follower_count_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    """F1-F3 (BATCH:66-68): k/M magnitude rewrite + NULL-on-malformed
    cast, on strings synthesized deterministically from customer keys."""
    customer = table(spark, sf, "customer")
    raw = (
        F.when(F.col("c_custkey") % 4 == 0, (F.col("c_custkey") % 1000).cast("string"))
        .when(F.col("c_custkey") % 4 == 1, F.concat((F.col("c_custkey") % 90 + 1).cast("string"), F.lit("k")))
        .when(F.col("c_custkey") % 4 == 2, F.concat((F.col("c_custkey") % 9 + 1).cast("string"), F.lit("M")))
        .otherwise(F.lit("User Info Error"))
    )
    parsed = F.regexp_replace(F.regexp_replace(raw, "k", "000"), "M", "000000").try_cast("int")
    return (
        customer.select((F.col("c_custkey") % 4).alias("variant"), parsed.alias("followers"))
        .groupBy("variant")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("followers").alias("n_parsed"),
            F.sum("followers").alias("total_followers"),
        )
    )


def null_propagating_concat(spark: SparkSession, sf: str) -> DataFrame:
    """F5 (BATCH:96): concat propagates NULL through any NULL input."""
    customer = table(spark, sf, "customer")
    first = F.when(F.col("c_custkey") % 10 == 0, F.lit(None)).otherwise(F.col("c_name"))
    named = customer.select(F.concat(first, F.lit(" "), F.col("c_mktsegment")).alias("user_name"))
    return named.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("user_name")).alias("n_null_names"),
        F.count_distinct("user_name").alias("n_distinct_names"),
    )


def array_pack_access(spark: SparkSession, sf: str) -> DataFrame:
    """F8 (BATCH:83): pack columns into an array, then element access;
    sums routed through DECIMAL for partition-order independence."""
    li = table(spark, sf, "lineitem")
    packed = li.select(
        "l_returnflag", F.array("l_extendedprice", "l_discount").alias("price_disc")
    )
    return (
        packed.select(
            "l_returnflag",
            F.col("price_disc").getItem(0).alias("price"),
            F.col("price_disc").getItem(1).alias("disc"),
        )
        .groupBy("l_returnflag")
        .agg(
            _dec_sum_as_double("price", "sum_price"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


def distinct_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    """A5/P9 (BATCH:112): SELECT DISTINCT over a projection."""
    return table(spark, sf, "orders").select("o_orderstatus", "o_orderpriority").distinct()


def offset_row_pick(spark: SparkSession, sf: str) -> DataFrame:
    """O5 (EMU:40,46,52): offset-based row pick — ORDER BY key LIMIT 1
    OFFSET n (the emulator's ``LIMIT {random_row}, 1`` shape). Spark
    plans offset+limit as a single GlobalLimit over a TakeOrdered."""
    return (
        table(spark, sf, "orders")
        .orderBy("o_orderkey")
        .offset(41)
        .limit(1)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    )


def case_bucket_counts(spark: SparkSession, sf: str) -> DataFrame:
    """A6/F11 (BATCH:196-201): CASE bucketing as a group-by dimension."""
    customer = table(spark, sf, "customer")
    return (
        customer.select(_bucket(F.col("c_acctbal")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("bucket")
    )


def rollup_priority_status(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ROLLUP (beyond-reference; SURVEY.md §2.4 notes the
    reference has no grouping sets): per (priority, status) counts plus
    per-priority and grand-total rows in one pass. Spark plans rollup as
    a single Expand + hash aggregate — one shuffle, not one job per
    grouping level."""
    orders = table(spark, sf, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum_as_double("o_totalprice", "sum_price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


def set_ops_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Set operations (beyond-reference; SURVEY.md §2.7 notes none in
    the reference): customer segments by order activity across two years
    via EXCEPT / INTERSECT / UNION. Each leg is a distinct-aggregated
    key set — the shuffles carry custkeys only, never full rows."""
    orders = table(spark, sf, "orders")

    def active(year: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01"))
                & (F.col("o_orderdate") <= F.lit(f"{year}-12-31"))
            )
            .select("o_custkey")
            .distinct()
        )

    y94, y95 = active(1994), active(1995)
    return (
        y94.subtract(y95).agg(F.count("*").alias("n_customers"))
        .select(F.lit("only_1994").alias("segment"), "n_customers")
        .unionByName(
            y94.intersect(y95).agg(F.count("*").alias("n_customers"))
            .select(F.lit("both_years").alias("segment"), "n_customers")
        )
        .unionByName(
            y94.union(y95).distinct().agg(F.count("*").alias("n_customers"))
            .select(F.lit("either_year").alias("segment"), "n_customers")
        )
    )


def pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over the largest fact table: the
    canonical scan-bound partial+final aggregate. The date filter and
    the 9-column projection both reach the parquet scan; the shuffle
    carries 4 groups x a handful of partial aggregates — at 100 TB this
    is I/O-bound, exactly as it should be. All money math routes through
    DECIMAL so partial-agg order cannot change the result."""
    li = table(spark, sf, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            # divide as double (IEEE, identical both engines) — decimal
            # division result *scale* is an engine-specific choice
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*"), 4).alias("avg_qty"),
            F.round(F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3-shaped: segment-filtered customer ⋈ orders ⋈ lineitem,
    top-10 open orders by revenue. Two fact shuffles (custkey, orderkey)
    with AQE skew handling; the final top-k is TakeOrderedAndProject
    (per-partition top-10 + driver merge), never a global sort."""
    customer, orders, li = (table(spark, sf, t) for t in ("customer", "orders", "lineitem"))
    cutoff = F.lit("1997-03-15").cast("timestamp")
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    )
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue.cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def nation_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5-shaped: 5-way join (lineitem ⋈ orders ⋈ customer ⋈
    supplier ⋈ nation) with the local-supplier condition, revenue per
    nation for one order-year. The dims (supplier slice, nation)
    broadcast; the fact-fact joins shuffle on their keys; Catalyst/AQE
    orders the join tree."""
    li, orders, customer, supplier, nation = (
        table(spark, sf, t) for t in ("lineitem", "orders", "customer", "supplier", "nation")
    )
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(revenue.cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


VOLUME_NATIONS = ("NATION_1", "NATION_2")  # the Q7 trading pair


def volume_shipping_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7-shaped: revenue shipped between two nations, per
    (supplier nation, customer nation, ship year), both directions.
    Joins: lineitem ⋈ orders ⋈ customer ⋈ nation(cust) and
    lineitem ⋈ supplier ⋈ nation(supp); the either-direction pair
    condition is applied AFTER the nation dims broadcast-attach, so the
    fact side is filtered by two broadcast hash joins before the one
    fact-fact shuffle (lineitem ⋈ orders on orderkey)."""
    li, orders, customer, supplier, nation = (
        table(spark, sf, t) for t in ("lineitem", "orders", "customer", "supplier", "nation")
    )
    n1, n2 = VOLUME_NATIONS
    supp_n = F.broadcast(
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    # decimal-operand product: casting each DOUBLE operand to decimal
    # FIRST (prices/discounts carry 2 true decimals, so the 6-decimal
    # cast is exact) makes the multiply+sum exact decimal arithmetic in
    # both engines — the double-product-then-cast form loses a half-ulp
    # coin flip per row (observed as a one-cent top-20 mismatch in Q10)
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,6)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == cust_n.c_custkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


RETURNED_TOP_N = 20


def returned_item_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10-shaped: the top-20 customers by revenue lost to
    returned items (l_returnflag = 'R') in one order-quarter. The
    returnflag + date filters push into the scans; the top-20 compiles
    to TakeOrderedAndProject, never a global sort of all customers."""
    li, orders, customer, nation = (
        table(spark, sf, t) for t in ("lineitem", "orders", "customer", "nation")
    )
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,6)")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal"
        )
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(RETURNED_TOP_N)
    )


def top_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15-shaped: the supplier(s) whose shipped revenue over one
    quarter equals the maximum across all suppliers. The per-supplier
    aggregate is computed once; the max arrives as a scalar subquery
    (one extra tiny agg over the already-reduced relation), never a
    re-scan of lineitem."""
    li, supplier = (table(spark, sf, t) for t in ("lineitem", "supplier"))
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("m"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def forecast_revenue_change(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6-shaped: revenue delta from hypothetically dropping
    mid-band discounts for one ship-year — a single-table aggregate
    whose THREE filters (year range, discount band, quantity cap) must
    all reach the parquet scan as pushed predicates; at 100 TB this
    query is a pruning benchmark, not a compute one. Decimal-operand
    product keeps the sum exact cross-engine."""
    li = table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * F.col("l_discount").cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue_delta"),
        )
    )


def promo_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14-shaped: the share of one month's revenue carried by
    PROMO-type parts. The part dim broadcasts; both the promo and the
    total sums ride ONE aggregate over the joined slice (a CASE inside
    the sum, not two scans). Exact decimal internals; the final ratio
    is one double division of two exact decimals."""
    li, part = (table(spark, sf, t) for t in ("lineitem", "part"))
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,6)"))),
                2,
            )
            .cast("double")
            .alias("promo_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
            F.round(
                (
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(
                            F.lit(0).cast("decimal(18,6)")
                        )
                    ).cast("double")
                )
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_pct"),
        )
    )


def null_handling_family(spark: SparkSession, sf: str) -> DataFrame:
    """The NULL-combinator scalar surface in one pass: NULLIF carves
    sentinel values out, COALESCE layers fallbacks, GREATEST/LEAST
    propagate through (Spark and DuckDB both skip NULLs rather than
    poison), and the flags summarize per market segment. Every
    expression is row-local codegen; one aggregate."""
    customer = table(spark, sf, "customer")
    # sentinel: zero balances → NULL, then fall back to -1
    bal = F.nullif(F.col("c_acctbal"), F.lit(0.0))
    eff = F.coalesce(bal, F.lit(-1.0))
    hi = F.greatest(bal, F.lit(1000.0))
    lo = F.least(bal, F.lit(1000.0))
    return (
        customer.select(
            "c_mktsegment",
            bal.alias("bal"),
            eff.alias("eff"),
            hi.alias("hi"),
            lo.alias("lo"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("bal").isNull().cast("bigint")).alias("n_sentinel"),
            F.round(F.sum(F.col("eff").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_effective"),
            F.round(F.min("lo"), 2).alias("min_capped"),
            F.round(F.max("hi"), 2).alias("max_floored"),
        )
        .orderBy("segment")
    )


def cume_dist_acctbal(spark: SparkSession, sf: str) -> DataFrame:
    """cume_dist (the one ranking function ranking_family omits):
    cumulative distribution of customer account balances within each
    nation, reported for the per-nation top-3 balances. Same
    single-shuffle windowed pass as the ranking family; cume_dist's
    ties-included semantics (rows ≤ current / total) are identical in
    both engines, and the balance+custkey sort makes ranks total."""
    customer = table(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        customer.select(
            "c_nationkey",
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "acctbal", "cd", F.col("rn").cast("int").alias("rn"))
        .orderBy("c_nationkey", "rn")
    )


def ranking_family(spark: SparkSession, sf: str) -> DataFrame:
    """The full ranking-function family in one windowed pass per
    partition key: rank / dense_rank / percent_rank / ntile(4) over
    customers by account balance within their nation. One shuffle on
    the partition key; all four functions share the same sort."""
    customer = table(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        customer.select(
            "c_nationkey",
            "c_custkey",
            F.rank().over(w).cast("int").alias("rnk"),
            F.dense_rank().over(w).cast("int").alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("c_nationkey", "rnk")
    )


def running_total(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-spec window (ROWS UNBOUNDED PRECEDING → CURRENT ROW):
    per-customer running order total in date order, summarized as each
    customer's final cumulative total and order count over a key slice.
    The running sum is decimal-exact so the frame accumulation order
    (fixed by the sort) yields identical values cross-engine."""
    orders = table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    sliced = orders.filter(F.col("o_custkey") % 100 == 0)
    return (
        sliced.select("o_custkey", cum.alias("cum_total"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.max("cum_total").cast("double"), 2).alias("final_total"),
        )
        .orderBy("o_custkey")
    )


def analytic_window_family(spark: SparkSession, sf: str) -> DataFrame:
    """Analytic (non-ranking) window family in one pass: lag / lead /
    first_value / last_value / nth_value over each customer's orders in
    date order. last_value uses an explicit UNBOUNDED-to-UNBOUNDED frame
    (the default frame stops at CURRENT ROW, a classic cross-engine
    semantics trap). One shuffle on o_custkey; all five functions share
    the sort."""
    orders = table(spark, sf, "orders").filter(F.col("o_custkey") % 200 == 0)
    price = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dbl = lambda c: F.round(c.cast("double"), 2)  # noqa: E731
    return orders.select(
        "o_custkey",
        "o_orderkey",
        dbl(F.lag(price, 1).over(w)).alias("prev_price"),
        dbl(F.lead(price, 1).over(w)).alias("next_price"),
        dbl(F.first_value(price).over(w)).alias("first_price"),
        dbl(F.last_value(price).over(wfull)).alias("last_price"),
        dbl(F.nth_value(price, 2).over(wfull)).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


def stats_agg_family(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregate family per return flag: sample stddev /
    variance, Pearson correlation, sample covariance, and a
    deterministic arg-max. The testdata generator emits duplicate
    (orderkey, linenumber) pairs (found by running the oracle sweep at
    sf0.001), so the max_by key folds in the shipdate's epoch day:
    any remaining tie has an identical shipdate and therefore an
    identical answer on both engines. All are single-pass partial+final
    hash aggregates — the moment sketches (n, Σx, Σx², Σxy) merge
    associatively, so the plan is one shuffle of tiny per-flag states
    regardless of input size."""
    li = table(spark, sf, "lineitem")
    qty = F.col("l_quantity").cast("double")
    price = F.col("l_extendedprice").cast("double")
    rowid = (F.col("l_orderkey") * 8 + F.col("l_linenumber")) * 1048576 + F.datediff(
        F.col("l_shipdate"), F.lit("1970-01-01")
    )
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.stddev_samp(qty), 4).alias("sd_qty"),
            F.round(F.var_samp(qty), 4).alias("var_qty"),
            F.round(F.corr(qty, price), 6).alias("corr_qty_price"),
            F.round(F.covar_samp(qty, price), 2).alias("covar_qty_price"),
            F.max_by("l_shipdate", rowid).alias("last_shipdate"),
        )
        .orderBy("flag")
    )


def outer_join_family(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT / RIGHT / FULL outer joins (absent from the reference —
    SURVEY.md §2.3 has inner equi-joins only): customer⋈orders under
    each outer mode with null-side accounting. The nation dim filter
    makes one side partial so every mode produces genuinely unmatched
    rows. All three modes shuffle on the same key; Catalyst plans the
    same hash/sort-merge join with different null-generation sides."""
    orders, customer = (table(spark, sf, t) for t in ("orders", "customer"))
    # restrict customers to one segment so orders from other segments
    # have no match (exercises the null-generating sides)
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment"
    )
    ords = orders.select("o_orderkey", "o_custkey")

    def branch(how: str):
        j = ords.join(cust, ords.o_custkey == cust.c_custkey, how)
        return j.select(
            F.lit(how).alias("join_type"),
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_orderkey").isNull().cast("int")).alias("n_null_order"),
            F.sum(F.col("c_custkey").isNull().cast("int")).alias("n_null_customer"),
        )

    return (
        branch("left")
        .unionByName(branch("right"))
        .unionByName(branch("full"))
        .orderBy("join_type")
    )


def null_safe_join_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): derived
    nullable keys (segment with one value nulled out) self-joined so
    the NULL group matches itself — the semantics a plain equi-join
    silently drops. One row per matching key pair."""
    customer = table(spark, sf, "customer")
    segs = (
        customer.select(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg")
        )
        .groupBy("seg")
        .agg(F.count("*").alias("n"))
    )
    a, b = segs.alias("a"), segs.alias("b")
    return (
        a.join(b, F.col("a.seg").eqNullSafe(F.col("b.seg")))
        .select(
            F.col("a.seg").alias("seg"),
            (F.col("a.n") * F.col("b.n")).alias("n_pairs"),
        )
        .orderBy(F.col("seg").asc_nulls_first())
    )


INCR_CUTOVER = "1999-01-01"


def incremental_agg_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental aggregate maintenance (materialized-view refresh):
    the pre-cutover aggregate is treated as the EXISTING materialized
    state; new rows are aggregated alone and MERGED (counts add, sums
    add, min/max combine) — no re-scan of history. At 100 TB this is
    the difference between refreshing a rollup from yesterday's 100 GB
    of deltas and recomputing it from the full fact table; every
    aggregate here is mergeable (decomposable), which is the same
    property streaming state stores and partial/final hash aggs exploit.
    The oracle computes the aggregate DIRECTLY over all rows, so the
    check proves merge-of-partials == recompute."""
    orders = table(spark, sf, "orders")
    cut = F.lit(INCR_CUTOVER).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )

    existing = partial(orders.filter(F.col("o_orderdate") < cut))
    delta = partial(orders.filter(F.col("o_orderdate") >= cut))
    merged = existing.unionByName(delta)
    return (
        merged.groupBy("priority")
        .agg(
            F.sum("n").alias("n_orders"),
            F.round(F.sum("sum_price").cast("double"), 4).alias("sum_price"),
            F.min("min_price").alias("min_price"),
            F.max("max_price").alias("max_price"),
        )
        .orderBy("priority")
    )


def merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """CDC-style MERGE (upsert) without Delta: a simulated change-set
    (5% of orders re-priced and re-statused) is merged into the base
    table as anti-join(base, changes) ∪ changes — the scalable
    compaction pattern when the table format has no native MERGE. Both
    the anti join and the validating aggregate shuffle on the same key;
    at 100 TB the base side would additionally be bucketed by
    o_orderkey so the anti join is co-located with at-rest layout.
    Output: per-status row count + decimal-exact price sum proving
    exactly the changed keys took the new values. The re-priced value
    stays at scale 4 (exact product of two scale-2 decimals) — a lossy
    down-cast to scale 2 would hit exact-half ties that Spark rounds
    HALF_UP but DuckDB truncates, so the sum is kept exact instead."""
    orders = table(spark, sf, "orders")
    changes = orders.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(1.10).cast("decimal(4,2)"))
        .cast("decimal(20,4)")
        .alias("o_totalprice"),
    )
    base = orders.select("o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("decimal(20,4)").alias("o_totalprice"))
    merged = base.join(changes, "o_orderkey", "left_anti").unionByName(changes)
    return (
        merged.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice").cast("double"), 4).alias("sum_price"),
        )
        .orderBy("status")
    )


def fuzzy_name_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked fuzzy self-join: candidate part pairs inside a
    (brand, size) block with Levenshtein edit distance below a
    threshold. Blocking turns the O(n²) all-pairs comparison into
    per-block quadratic work — the same candidate-generation shape as
    the MinHash banding in operators/dedup.py, with an edit-distance
    verifier instead of Jaccard. The block key is the equi-join key, so
    the plan is a plain shuffled self-join, never a cartesian."""
    part = table(spark, sf, "part")
    a = part.select(
        F.col("p_brand").alias("brand"), F.col("p_size").alias("size"),
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand").alias("brand"), F.col("p_size").alias("size"),
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"),
    )
    pairs = (
        a.join(b, ["brand", "size"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "brand",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= 25)
    )
    return (
        pairs.groupBy("brand")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("dist").cast("int").alias("min_dist"),
        )
        .orderBy("brand")
    )


def approx_sketch_family(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate sketches (HyperLogLog distinct, quantile sketch)
    validated against their exact twins IN the query: each engine
    computes its own sketch and its own exact value, and the compared
    output is (exact, sketch-within-tolerance flag) — sketch internals
    differ per engine (Spark HLL++/GK vs DuckDB HLL/t-digest) so raw
    sketch values can never hash-match, but the accuracy contract can.
    At 100 TB the sketches are the point: fixed-size mergeable state
    per group vs the full-shuffle expansion exact distinct needs."""
    orders = table(spark, sf, "orders")
    price = F.col("o_totalprice").cast("double")
    n_exact = F.count_distinct("o_custkey").alias("n_exact")
    hll = F.approx_count_distinct("o_custkey", 0.01)
    p50_exact = F.expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)")
    p50_approx = F.percentile_approx(price, F.lit(0.5), F.lit(10000))
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            n_exact,
            (F.abs(hll - F.count_distinct("o_custkey")) / F.count_distinct("o_custkey") <= 0.05)
            .alias("hll_ok"),
            F.round(p50_exact, 2).alias("p50_exact"),
            (F.abs(p50_approx - p50_exact) / p50_exact <= 0.05).alias("p50_ok"),
        )
        .orderBy("priority")
    )


ORDER_STATUSES = ("F", "O", "P")


def pivot_status_by_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Native pivot: order counts per priority, one column per order
    status. The pivot values are declared (not discovered), so the plan
    is a single partial+final hash aggregate — no extra distinct-values
    job and no second shuffle at scale."""
    orders = table(spark, sf, "orders")
    out = (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", list(ORDER_STATUSES))
        .count()
    )
    renamed = out.select(
        "priority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}") for s in ORDER_STATUSES],
    )
    return renamed.orderBy("priority")


def semi_anti_customer_activity(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins: per market segment, customers with
    >= 1 order vs customers with none. Both joins shuffle on the same
    customer key (one exchange reused); the order side is pre-projected
    to the join key only, so the shuffle carries 8-byte keys."""
    customer, orders = (table(spark, sf, t) for t in ("customer", "orders"))
    okeys = orders.select("o_custkey")
    active = (
        customer.join(okeys, customer.c_custkey == okeys.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_active"))
    )
    inactive = (
        customer.join(okeys, customer.c_custkey == okeys.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_inactive"))
    )
    return (
        active.join(inactive, "segment", "full_outer")
        .select(
            "segment",
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            F.coalesce("n_inactive", F.lit(0)).alias("n_inactive"),
        )
        .orderBy("segment")
    )


def cube_priority_status(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (priority, status) with a grouping-set id: all four
    aggregation granularities in ONE pass (Catalyst expands the cube
    into a union of grouping sets executed as a single Expand +
    partial+final hash agg — 4x cheaper than four separate scans)."""
    orders = table(spark, sf, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            _dec_sum_as_double("o_totalprice", "sum_price"),
        )
        .select("o_orderpriority", "o_orderstatus", "gid", "n_orders", "sum_price")
    )


def ratio_to_report_share(spark: SparkSession, sf: str) -> DataFrame:
    """Ratio-to-report: each (priority, status) cell's share of its
    priority's total and of the grand total — the share-of-total window
    family (SUM OVER partition / SUM OVER ()) that every BI rollup
    needs. The grand-total window is a single-partition exchange of the
    ALREADY-AGGREGATED cells (tens of rows), never of the fact table —
    the two-level shape that stays cheap at any scale."""
    orders = table(spark, sf, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count("*").alias("n_orders"))
    w_prio = Window.partitionBy("priority")
    w_all = Window.partitionBy()
    return cells.select(
        "priority",
        "status",
        "n_orders",
        F.round(F.col("n_orders") / F.sum("n_orders").over(w_prio), 6).alias("share_of_priority"),
        F.round(F.col("n_orders") / F.sum("n_orders").over(w_all), 6).alias("share_of_total"),
    ).orderBy("priority", "status")



def calendar_functions_family(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-function surface (SURVEY.md §2.8 F6/F7 widened): per
    order month — month start/end (last_day), the next month
    (add_months), quarter, the weekday of the month start (Sunday=1,
    Spark convention; the oracle shifts DuckDB's Sunday=0), and the day
    offset from a fixed anchor (datediff). One scan, one hash agg on
    the month; every calendar expression runs on the ~#months-row
    aggregate, not the fact rows."""
    orders = table(spark, sf, "orders")
    m = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    per_month = orders.select(m.alias("m")).groupBy("m").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return per_month.select(
        F.col("m").cast("string").alias("month_start"),
        F.last_day(F.col("m")).cast("string").alias("month_end"),
        F.add_months(F.col("m"), 1).cast("string").alias("next_month"),
        F.quarter(F.col("m")).alias("q"),
        F.dayofweek(F.col("m")).alias("dow_first"),
        F.datediff(F.col("m"), F.lit("1995-01-01").cast("date")).alias("days_from_anchor"),
        "n_orders",
    ).orderBy("month_start")



def set_ops_all_variants(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset set operations (§2.7 completed beyond the distinct
    variants of ``set_ops_customers``): INTERSECT ALL and EXCEPT ALL
    over the 1994-vs-1995 order-customer bags, where multiplicity =
    orders per customer per year. Catalyst rewrites both into the
    generated-count join form (no row-by-row matching); the rollup per
    leg is a one-row aggregate."""
    orders = table(spark, sf, "orders")
    yr = F.year(F.col("o_orderdate"))
    a = orders.where(yr == 1994).select("o_custkey")
    b = orders.where(yr == 1995).select("o_custkey")
    legs = [
        ("intersect_all", a.intersectAll(b)),
        ("except_all", a.exceptAll(b)),
    ]
    out = None
    for tag, df in legs:
        row = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        ).select(F.lit(tag).alias("op"), "n_rows", "n_customers")
        out = row if out is None else out.unionAll(row)
    return out.orderBy("op")



def price_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth (equal-frequency) 10-bucket histogram of order
    totals: per bucket the row count and the price range it spans —
    the boundary set a cost-based optimizer or a pricing dashboard
    derives from a fact column.

    Reuses the distributed exact-ntile machinery built for
    ``curriculum_deciles`` (range repartition + per-partition ranks +
    scalar offset join — no single-partition sort), proving the
    primitive generalizes beyond its first caller."""
    from pinterest_data_pipeline6_spark.operators.textops import _distributed_ntile

    orders = table(spark, sf, "orders")
    scored = orders.select(
        F.col("o_totalprice").alias("score"), F.col("o_orderkey").alias("doc_id")
    )
    binned = _distributed_ntile(scored, 10)
    return (
        binned.groupBy(F.col("decile").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("score"), 2).alias("lo_price"),
            F.round(F.max("score"), 2).alias("hi_price"),
        )
        .orderBy("bucket")
    )


def mad_price_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier accounting per order priority: exact median,
    median absolute deviation (MAD), and how many orders sit more than
    3 MADs from the median — the robust-statistics counterpart of
    ``grouped_zscore_outliers`` (mean/stddev break down exactly when
    outliers are present; the median/MAD pair does not).

    Exact grouped medians are two sort-aggregates over (priority)
    groups — bounded group count, so each median is a per-group sort,
    parallel across groups; the per-group medians broadcast back for
    the deviation pass. Two scans of orders (median, then deviations)
    is inherent to MAD's two-level median. Medians round at 4 decimals,
    not 2: even-count medians land exactly on .005 midpoints where the
    engines' 1-ulp interpolation differences flip a 2-decimal round."""
    orders = table(spark, sf, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med")
    )
    dev = (
        orders.join(F.broadcast(med), "o_orderpriority")
        .select(
            "o_orderpriority",
            "med",
            F.abs(F.col("o_totalprice") - F.col("med")).alias("adev"),
        )
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.first("med").alias("med"), F.median("adev").alias("mad")
    )
    out = (
        orders.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.first("med"), 4).alias("median_price"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("o_totalprice") - F.col("med"))
                    > 3 * F.col("mad")
                ).cast("bigint")
            ).alias("n_outliers"),
        )
        .orderBy("o_orderpriority")
    )
    return out


def sql_udf_pricing_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 SQL UDFs (``CREATE FUNCTION ... RETURN <expr>``) — the
    catalog-registered, dialect-native way to share business logic
    (here: net-price and discount-band rules) across queries. Catalyst
    INLINES the function body into the calling plan, so unlike any
    Python UDF the call costs nothing: the executed plan contains the
    raw expressions inside one whole-stage-codegen span with no UDF
    node at all (plan-asserted) — at 100 TB, SQL UDFs are free
    abstraction, Python UDFs are a serialization boundary.

    Per discount band: item count and net revenue. Revenue follows the
    engine's money discipline: per-row net prices round at 6 decimals
    then sum as DECIMAL(28,6), so the total is independent of
    partial-aggregate merge order; the oracle inlines the identical
    bodies (DuckDB macros can't ride the single-statement gate).

    SESSION MUTATION NOTE (unavoidable — SQL UDFs and SQL-on-view are
    catalog objects, registration IS the feature under test): the two
    ``pdp6_*`` temporary functions persist in the session after the
    call; their bodies are constant, so re-registration by any caller
    is idempotent. The temp VIEW carries the sf path in its name, so
    interleaved calls against different sf dirs can never read each
    other's table — the one genuinely racy piece of the earlier
    fixed-name form."""
    import hashlib

    view = f"sqludf_lineitem_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    table(spark, sf, "lineitem").createOrReplaceTempView(view)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pdp6_net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0d - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pdp6_disc_band(d DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN d = 0.0d THEN 'none' "
        "WHEN d < 0.05d THEN 'low' ELSE 'high' END"
    )
    return spark.sql(
        f"""
        SELECT pdp6_disc_band(l_discount) AS band,
               COUNT(*) AS n_items,
               CAST(ROUND(SUM(CAST(ROUND(
                   pdp6_net_price(l_extendedprice, l_discount), 6)
                   AS DECIMAL(28,6))), 2) AS DOUBLE) AS net_revenue
        FROM {view}
        GROUP BY pdp6_disc_band(l_discount)
        ORDER BY band
        """
    )


ORACLE: dict[str, str] = {
    "ratio_to_report_share": """
        WITH cells AS (
            SELECT o_orderpriority AS priority, o_orderstatus AS status,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1, 2
        )
        SELECT priority, status, n_orders,
               ROUND(CAST(n_orders AS DOUBLE)
                     / SUM(n_orders) OVER (PARTITION BY priority), 6) AS share_of_priority,
               ROUND(CAST(n_orders AS DOUBLE) / SUM(n_orders) OVER (), 6) AS share_of_total
        FROM cells
    """,
    "q1_category_per_country": """
        SELECT n_name AS country, o_orderpriority AS category, COUNT(*) AS category_count
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    """,
    "q2_count_per_year": """
        SELECT CAST(year(o_orderdate) AS INT) AS post_year,
               o_orderpriority AS category, COUNT(*) AS category_count
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE year(o_orderdate) BETWEEN 1996 AND 2000
        GROUP BY 1, 2
    """,
    "q3a_top_account_per_nation": """
        SELECT country, top_customer, top_acctbal FROM (
            SELECT n_name AS country, c_name AS top_customer, c_acctbal AS top_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY n_name
                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        ) WHERE rn = 1
    """,
    "q3b_global_top_account": """
        SELECT country, top_acctbal FROM (
            SELECT n_name AS country, c_acctbal AS top_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY n_name
                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        ) WHERE rn = 1
        ORDER BY top_acctbal DESC, country ASC LIMIT 1
    """,
    "q4_distinct_pairs_per_bucket": f"""
        SELECT bucket, category, COUNT(*) AS category_count FROM (
            SELECT DISTINCT {_BUCKET_SQL} AS bucket,
                   o_orderpriority AS category, c_custkey
            FROM customer JOIN orders ON c_custkey = o_custkey
        ) GROUP BY bucket, category
    """,
    "q5_median_price_per_bucket": f"""
        SELECT {_BUCKET_SQL} AS bucket,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_total_price
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY bucket
    """,
    "q6_customers_per_year": """
        SELECT CAST(year(o_orderdate) AS INT) AS post_year,
               COUNT(DISTINCT o_custkey) AS number_customers
        FROM orders GROUP BY 1
    """,
    "q7_median_price_per_year": """
        SELECT CAST(year(o_orderdate) AS INT) AS post_year,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_total_price
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY 1
    """,
    "q8_median_price_bucket_year": f"""
        WITH buckets AS (
            SELECT c_custkey AS b_custkey, {_BUCKET_SQL} AS bucket FROM customer
        )
        SELECT bucket, CAST(year(o_orderdate) AS INT) AS post_year,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_total_price
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN buckets ON c_custkey = b_custkey
        GROUP BY bucket, post_year
    """,
    "scan_filter_project": """
        SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
        FROM lineitem
        WHERE year(l_shipdate) = 1998 AND l_quantity < 10
    """,
    "sentinel_null_normalize": """
        SELECT COUNT(*) AS n_rows,
               COUNT(*) - COUNT(CASE WHEN lang IN ('en','src3') THEN NULL ELSE lang END) AS n_lang_null,
               COUNT(*) - COUNT(CASE WHEN source IN ('en','src3') THEN NULL ELSE source END) AS n_source_null,
               COUNT(*) - COUNT(CASE WHEN text IN ('en','src3') THEN NULL ELSE text END) AS n_text_null
        FROM documents
    """,
    "follower_count_rewrite": """
        WITH raw AS (
            SELECT c_custkey % 4 AS variant,
                   CASE WHEN c_custkey % 4 = 0 THEN CAST(c_custkey % 1000 AS VARCHAR)
                        WHEN c_custkey % 4 = 1 THEN CAST(c_custkey % 90 + 1 AS VARCHAR) || 'k'
                        WHEN c_custkey % 4 = 2 THEN CAST(c_custkey % 9 + 1 AS VARCHAR) || 'M'
                        ELSE 'User Info Error' END AS s
            FROM customer
        )
        SELECT variant, COUNT(*) AS n_rows, COUNT(followers) AS n_parsed,
               CAST(SUM(followers) AS BIGINT) AS total_followers
        FROM (SELECT variant,
                     TRY_CAST(regexp_replace(regexp_replace(s, 'k', '000', 'g'),
                                             'M', '000000', 'g') AS INT) AS followers
              FROM raw)
        GROUP BY variant
    """,
    "null_propagating_concat": """
        SELECT COUNT(*) AS n_rows,
               COUNT(*) - COUNT(user_name) AS n_null_names,
               COUNT(DISTINCT user_name) AS n_distinct_names
        FROM (SELECT (CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_name END)
                     || ' ' || c_mktsegment AS user_name
              FROM customer)
    """,
    "array_pack_access": """
        SELECT l_returnflag,
               ROUND(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
               COUNT(*) AS n_rows
        FROM (SELECT l_returnflag,
                     [l_extendedprice, l_discount][1] AS price
              FROM lineitem)
        GROUP BY l_returnflag
    """,
    "distinct_status_priority": """
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    "offset_row_pick": """
        SELECT o_orderkey, o_orderstatus, o_orderpriority
        FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 41
    """,
    "case_bucket_counts": f"""
        SELECT {_BUCKET_SQL} AS bucket, COUNT(*) AS n_customers
        FROM customer GROUP BY bucket
    """,
    "rollup_priority_status": """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    "null_handling_family": """
        SELECT c_mktsegment AS segment,
               COUNT(*) AS n_customers,
               CAST(SUM(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sentinel,
               CAST(ROUND(SUM(CAST(eff AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS sum_effective,
               ROUND(MIN(lo), 2) AS min_capped,
               ROUND(MAX(hi), 2) AS max_floored
        FROM (
            SELECT c_mktsegment,
                   NULLIF(c_acctbal, 0.0) AS bal,
                   COALESCE(NULLIF(c_acctbal, 0.0), -1.0) AS eff,
                   GREATEST(NULLIF(c_acctbal, 0.0), 1000.0) AS hi,
                   LEAST(NULLIF(c_acctbal, 0.0), 1000.0) AS lo
            FROM customer
        )
        GROUP BY c_mktsegment
    """,
    "cume_dist_acctbal": """
        SELECT c_nationkey, c_custkey, acctbal, cd, CAST(rn AS INT) AS rn
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal AS acctbal,
                   ROUND(CUME_DIST() OVER w, 6) AS cd,
                   ROW_NUMBER() OVER w AS rn
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal DESC, c_custkey ASC)
        )
        WHERE rn <= 3
    """,
    "ranking_family": """
        SELECT c_nationkey, c_custkey,
               CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk,
               ROUND(prnk, 6) AS prnk, CAST(quartile AS INT) AS quartile
        FROM (
            SELECT c_nationkey, c_custkey,
                   RANK() OVER w AS rnk,
                   DENSE_RANK() OVER w AS drnk,
                   PERCENT_RANK() OVER w AS prnk,
                   NTILE(4) OVER w AS quartile
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal DESC, c_custkey ASC)
        )
        WHERE rnk <= 3
    """,
    "running_total": """
        SELECT o_custkey, COUNT(*) AS n_orders,
               ROUND(CAST(MAX(cum_total) AS DOUBLE), 2) AS final_total
        FROM (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_total
            FROM orders
            WHERE o_custkey % 100 = 0
        )
        GROUP BY o_custkey
    """,
    "analytic_window_family": """
        SELECT o_custkey, o_orderkey,
               ROUND(CAST(LAG(price, 1) OVER w AS DOUBLE), 2) AS prev_price,
               ROUND(CAST(LEAD(price, 1) OVER w AS DOUBLE), 2) AS next_price,
               ROUND(CAST(FIRST_VALUE(price) OVER w AS DOUBLE), 2) AS first_price,
               ROUND(CAST(LAST_VALUE(price) OVER wfull AS DOUBLE), 2) AS last_price,
               ROUND(CAST(NTH_VALUE(price, 2) OVER wfull AS DOUBLE), 2) AS second_price
        FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders WHERE o_custkey % 200 = 0
        )
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "stats_agg_family": """
        SELECT l_returnflag AS flag, COUNT(*) AS n,
               ROUND(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)), 4) AS sd_qty,
               ROUND(VAR_SAMP(CAST(l_quantity AS DOUBLE)), 4) AS var_qty,
               ROUND(CORR(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 6) AS corr_qty_price,
               ROUND(COVAR_SAMP(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 2) AS covar_qty_price,
               MAX_BY(l_shipdate, (l_orderkey * 8 + l_linenumber) * 1048576
                      + date_diff('day', TIMESTAMP '1970-01-01', l_shipdate)) AS last_shipdate
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "outer_join_family": """
        WITH cust AS (
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_mktsegment = 'BUILDING'
        ),
        ords AS (SELECT o_orderkey, o_custkey FROM orders)
        SELECT 'left' AS join_type, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_order,
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_customer
        FROM ords LEFT JOIN cust ON o_custkey = c_custkey
        UNION ALL
        SELECT 'right', COUNT(*),
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM ords RIGHT JOIN cust ON o_custkey = c_custkey
        UNION ALL
        SELECT 'full', COUNT(*),
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM ords FULL JOIN cust ON o_custkey = c_custkey
    """,
    "null_safe_join_counts": """
        WITH segs AS (
            SELECT nullif(c_mktsegment, 'MACHINERY') AS seg, COUNT(*) AS n
            FROM customer GROUP BY 1
        )
        SELECT a.seg AS seg, a.n * b.n AS n_pairs
        FROM segs a JOIN segs b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
    # direct recompute over ALL rows — equality proves the Spark-side
    # merge-of-partials refresh is exact
    "incremental_agg_merge": """
        SELECT o_orderpriority AS priority,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_price,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    "merge_upsert": """
        WITH changes AS (
            SELECT o_orderkey, 'U' AS o_orderstatus,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(1.10 AS DECIMAL(4,2)) AS DECIMAL(20,4)) AS o_totalprice
            FROM orders WHERE o_orderkey % 20 = 0
        ), merged AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(20,4)) AS o_totalprice
            FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
            UNION ALL SELECT * FROM changes
        )
        SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
               ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 4) AS sum_price
        FROM merged GROUP BY o_orderstatus
    """,
    "fuzzy_name_pairs": """
        SELECT brand, COUNT(*) AS n_pairs, CAST(MIN(dist) AS INT) AS min_dist
        FROM (
            SELECT a.p_brand AS brand,
                   CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_size = b.p_size
             AND a.p_partkey < b.p_partkey
        )
        WHERE dist <= 25
        GROUP BY brand
    """,
    "approx_sketch_family": """
        SELECT o_orderpriority AS priority,
               COUNT(DISTINCT o_custkey) AS n_exact,
               ABS(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
                   / COUNT(DISTINCT o_custkey) <= 0.05 AS hll_ok,
               ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 2) AS p50_exact,
               ABS(approx_quantile(CAST(o_totalprice AS DOUBLE), 0.5)
                   - quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5))
                   / quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) <= 0.05 AS p50_ok
        FROM orders
        GROUP BY o_orderpriority
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
               ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc_price,
               ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_charge,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "shipping_priority": """
        SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority, revenue
        FROM (
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-03-15'
              AND l_shipdate > TIMESTAMP '1997-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
        )
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
    """,
    "nation_revenue": """
        SELECT n_name AS nation,
               ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "forecast_revenue_change": """
        SELECT COUNT(*) AS n_items,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                              * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS revenue_delta
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.04 AND l_discount <= 0.06
          AND l_quantity < 24
    """,
    "promo_revenue_share": """
        SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                                   ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
                   AS promo_revenue,
               CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS total_revenue,
               ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                     / CAST(SUM(rev) AS DOUBLE), 4) AS promo_pct
        FROM (
            SELECT p_type,
                   CAST(l_extendedprice AS DECIMAL(18,6))
                   * CAST(1 - l_discount AS DECIMAL(18,6)) AS rev
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
        )
    """,
    "volume_shipping_pairs": f"""
        SELECT supp_nation, cust_nation, ship_year,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM (
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   EXTRACT(year FROM l_shipdate) AS ship_year,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ns ON s_nationkey = ns.n_nationkey
            JOIN nation nc ON c_nationkey = nc.n_nationkey
            WHERE (ns.n_name = '{VOLUME_NATIONS[0]}' AND nc.n_name = '{VOLUME_NATIONS[1]}')
               OR (ns.n_name = '{VOLUME_NATIONS[1]}' AND nc.n_name = '{VOLUME_NATIONS[0]}')
        )
        GROUP BY supp_nation, cust_nation, ship_year
    """,
    "returned_item_revenue": f"""
        SELECT c_custkey, c_name, n_name AS nation, c_acctbal,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c_custkey, c_name, n_name, c_acctbal
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT {RETURNED_TOP_N}
    """,
    "top_supplier_revenue": """
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    "pivot_status_by_priority": """
        SELECT o_orderpriority AS priority,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY priority
    """,
    "semi_anti_customer_activity": """
        SELECT c_mktsegment AS segment,
               COUNT(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                          THEN 1 END) AS n_active,
               COUNT(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                          THEN 1 END) AS n_inactive
        FROM customer GROUP BY segment
    """,
    "cube_priority_status": """
        SELECT o_orderpriority, o_orderstatus,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT) AS gid,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    "calendar_functions_family": """
        WITH per_month AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT CAST(m AS VARCHAR) AS month_start,
               CAST(last_day(m) AS VARCHAR) AS month_end,
               CAST(CAST(m + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS next_month,
               CAST(quarter(m) AS INT) AS q,
               CAST(dayofweek(m) + 1 AS INT) AS dow_first,
               CAST(m - DATE '1995-01-01' AS INT) AS days_from_anchor,
               n_orders
        FROM per_month ORDER BY month_start
    """,
    "set_ops_all_variants": """
        WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994),
             b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
             ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
             ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        SELECT 'intersect_all' AS op, COUNT(*) AS n_rows,
               COUNT(DISTINCT o_custkey) AS n_customers FROM ia
        UNION ALL
        SELECT 'except_all', COUNT(*), COUNT(DISTINCT o_custkey) FROM ea
        ORDER BY op
    """,
    "price_equidepth_histogram": """
        WITH binned AS (
            SELECT o_totalprice AS score,
                   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
            FROM orders
        )
        SELECT bucket, COUNT(*) AS n_orders,
               ROUND(MIN(score), 2) AS lo_price,
               ROUND(MAX(score), 2) AS hi_price
        FROM binned GROUP BY bucket ORDER BY bucket
    """,
    "mad_price_outliers": """
        WITH med AS (
            SELECT o_orderpriority, median(o_totalprice) AS med
            FROM orders GROUP BY o_orderpriority
        ),
        mad AS (
            SELECT o.o_orderpriority, ANY_VALUE(m.med) AS med,
                   median(abs(o.o_totalprice - m.med)) AS mad
            FROM orders o JOIN med m USING (o_orderpriority)
            GROUP BY o.o_orderpriority
        )
        SELECT o.o_orderpriority, COUNT(*) AS n_orders,
               ROUND(ANY_VALUE(d.med), 4) AS median_price,
               ROUND(ANY_VALUE(d.mad), 4) AS mad,
               CAST(SUM(CASE WHEN abs(o.o_totalprice - d.med) > 3 * d.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM orders o JOIN mad d USING (o_orderpriority)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "set_ops_customers": """
        WITH y94 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate BETWEEN '1994-01-01' AND '1994-12-31'),
             y95 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-12-31')
        SELECT 'only_1994' AS segment, COUNT(*) AS n_customers
        FROM (SELECT * FROM y94 EXCEPT SELECT * FROM y95)
        UNION ALL
        SELECT 'both_years', COUNT(*)
        FROM (SELECT * FROM y94 INTERSECT SELECT * FROM y95)
        UNION ALL
        SELECT 'either_year', COUNT(*)
        FROM (SELECT * FROM y94 UNION SELECT * FROM y95)
    """,
}


def string_functions_family(spark: SparkSession, sf: str) -> DataFrame:
    """String-function surface parity sweep (SURVEY.md §2.8 F1-F5
    widened): seventeen scalar string functions — case mapping,
    reverse, padding, replace/translate, repeat, length/instr
    positions, concat_ws, left/right, split_part, contains/starts_with
    — applied to the first 50 customer names, every output column
    hash-checked against DuckDB. Pure row-local projection over one
    pruned scan + TakeOrderedAndProject for the deterministic row set;
    nothing here shuffles data at any scale.

    Engine deltas the sweep pins: Spark's length/instr return INT vs
    DuckDB's BIGINT (cast Spark-side), and initcap is absent in DuckDB
    (excluded). instr's 0-for-absent convention agrees."""
    customer = table(spark, sf, "customer")
    name = F.col("c_name")
    return (
        customer.orderBy("c_custkey")
        .limit(50)
        .select(
            "c_custkey",
            F.upper(name).alias("up"),
            F.lower(name).alias("lo"),
            F.reverse(name).alias("rev"),
            F.lpad(name, 25, "*").alias("lpadded"),
            F.rpad(name, 25, "*").alias("rpadded"),
            F.regexp_replace(name, "0", "O").alias("replaced"),
            F.translate(name, "0123456789", "abcdefghij").alias("translated"),
            F.repeat(F.substring(name, 1, 3), 2).alias("repeated"),
            F.length(name).cast("long").alias("len"),
            F.instr(name, "1").cast("long").alias("pos1"),
            F.concat_ws("|", name, F.col("c_custkey").cast("string")).alias("joined"),
            F.expr("left(c_name, 4)").alias("l4"),
            F.expr("right(c_name, 4)").alias("r4"),
            F.split_part(name, F.lit("#"), F.lit(2)).alias("after_hash"),
            F.contains(name, F.lit("00")).alias("has_00"),
            F.startswith(name, F.lit("Cus")).alias("is_cus"),
        )
    )


ORACLE["string_functions_family"] = """
    SELECT c_custkey,
           upper(c_name) AS up,
           lower(c_name) AS lo,
           reverse(c_name) AS rev,
           lpad(c_name, 25, '*') AS lpadded,
           rpad(c_name, 25, '*') AS rpadded,
           replace(c_name, '0', 'O') AS replaced,
           translate(c_name, '0123456789', 'abcdefghij') AS translated,
           repeat(substr(c_name, 1, 3), 2) AS repeated,
           length(c_name) AS len,
           instr(c_name, '1') AS pos1,
           concat_ws('|', c_name, CAST(c_custkey AS VARCHAR)) AS joined,
           left(c_name, 4) AS l4,
           right(c_name, 4) AS r4,
           split_part(c_name, '#', 2) AS after_hash,
           contains(c_name, '00') AS has_00,
           starts_with(c_name, 'Cus') AS is_cus
    FROM customer
    ORDER BY c_custkey
    LIMIT 50
"""

# Salt fan-out for the hot-key aggregation demo: counts/sums are
# associative, so partials per (key, salt) merge exactly.
AGG_SALT = 16


def salted_hot_key_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage SALTED aggregation over the deliberately hot
    event_type key (5 distinct values across every event row — the
    shape where a plain groupBy sends each key's entire volume through
    one reducer). Stage 1 aggregates per (event_type, salt) with a
    16-way deterministic salt (event_id % 16), fanning each hot key
    across 16 reducers; stage 2 merges the 5*16 partials. The result is
    IDENTICAL to the plain groupBy (associative count/sum — the oracle
    is the unsalted query), so the entry pins that the skew-dodging
    rewrite is semantics-preserving, value-hash-exact cross-engine.

    At 100 TB this is the manual fallback when AQE's skew handling
    cannot apply (e.g. a skewed aggregation rather than a join);
    functions/partitioning.py carries the reusable join-side variant.
    Money routes through DECIMAL so partial-merge order is inert."""
    ev = table(spark, sf, "events")
    stage1 = (
        ev.select(
            "event_type",
            (F.col("event_id") % AGG_SALT).alias("salt"),
            F.col("value").cast("decimal(18,6)").alias("dval"),
        )
        .groupBy("event_type", "salt")
        .agg(F.count("*").alias("pn"), F.sum("dval").alias("psum"))
    )
    return (
        stage1.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("psum").cast("double"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


ORACLE["sql_udf_pricing_bands"] = """
    SELECT CASE WHEN l_discount = 0.0 THEN 'none'
                WHEN l_discount < 0.05 THEN 'low'
                ELSE 'high' END AS band,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount), 6)
                AS DECIMAL(28,6))), 2) AS DOUBLE) AS net_revenue
    FROM lineitem
    GROUP BY 1
"""

ORACLE["salted_hot_key_agg"] = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""

QUERIES = {
    "q1_category_per_country": q1_category_per_country,
    "string_functions_family": string_functions_family,
    "salted_hot_key_agg": salted_hot_key_agg,
    "q2_count_per_year": q2_count_per_year,
    "q3a_top_account_per_nation": q3a_top_account_per_nation,
    "q3b_global_top_account": q3b_global_top_account,
    "q4_distinct_pairs_per_bucket": q4_distinct_pairs_per_bucket,
    "q5_median_price_per_bucket": q5_median_price_per_bucket,
    "q6_customers_per_year": q6_customers_per_year,
    "q7_median_price_per_year": q7_median_price_per_year,
    "q8_median_price_bucket_year": q8_median_price_bucket_year,
    "scan_filter_project": scan_filter_project,
    "sentinel_null_normalize": sentinel_null_normalize,
    "follower_count_rewrite": follower_count_rewrite,
    "null_propagating_concat": null_propagating_concat,
    "array_pack_access": array_pack_access,
    "distinct_status_priority": distinct_status_priority,
    "offset_row_pick": offset_row_pick,
    "case_bucket_counts": case_bucket_counts,
    "rollup_priority_status": rollup_priority_status,
    "set_ops_customers": set_ops_customers,
    "calendar_functions_family": calendar_functions_family,
    "set_ops_all_variants": set_ops_all_variants,
    "price_equidepth_histogram": price_equidepth_histogram,
    "sql_udf_pricing_bands": sql_udf_pricing_bands,
    "mad_price_outliers": mad_price_outliers,
    "pivot_status_by_priority": pivot_status_by_priority,
    "semi_anti_customer_activity": semi_anti_customer_activity,
    "cube_priority_status": cube_priority_status,
    "ratio_to_report_share": ratio_to_report_share,
    "pricing_summary": pricing_summary,
    "shipping_priority": shipping_priority,
    "nation_revenue": nation_revenue,
    "volume_shipping_pairs": volume_shipping_pairs,
    "returned_item_revenue": returned_item_revenue,
    "top_supplier_revenue": top_supplier_revenue,
    "forecast_revenue_change": forecast_revenue_change,
    "promo_revenue_share": promo_revenue_share,
    "ranking_family": ranking_family,
    "cume_dist_acctbal": cume_dist_acctbal,
    "null_handling_family": null_handling_family,
    "running_total": running_total,
    "analytic_window_family": analytic_window_family,
    "stats_agg_family": stats_agg_family,
    "outer_join_family": outer_join_family,
    "null_safe_join_counts": null_safe_join_counts,
    "incremental_agg_merge": incremental_agg_merge,
    "merge_upsert": merge_upsert,
    "fuzzy_name_pairs": fuzzy_name_pairs,
    "approx_sketch_family": approx_sketch_family,
}


EXACT_QUANTILES = (0.5, 0.9, 0.99)


def exact_price_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT global quantiles of l_extendedprice — the precise
    counterpart of the workload's `percentile_approx` medians (SURVEY
    §2 A4), for the audits where an approximation bound isn't
    acceptable (billing reconciliation, SLA percentiles).

    The textbook form (`ORDER BY price` + pick rank ceil(q*n)) funnels
    the corpus through one task. This reuses the distributed exact-rank
    core (textops._distributed_rank: range shuffle + per-partition
    row_number + a prefix-sum over the #partitions-row count table) —
    every stage is a parallel shuffle of (price, id) pairs, so the plan
    survives any corpus size. The <= |quantiles| candidate rows are
    filtered BEFORE the quantile labels explode onto them, and the
    (price, line id) tie-break makes the picked row unique, so both
    engines select the identical element.
    """
    from pinterest_data_pipeline6_spark.operators.textops import _distributed_rank

    li = widen_small_scan(table(spark, sf, "lineitem"))
    scored = li.select(
        F.col("l_extendedprice").cast("decimal(18,2)").alias("score"),
        # unique tie-break id: linenumber is 1..7 in TPC-H-shaped data
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("doc_id"),
    )
    ranked = _distributed_rank(scored)
    targets = [
        F.ceil(F.lit(q) * F.col("total")).cast("long") for q in EXACT_QUANTILES
    ]
    cond = F.col("_grank") == targets[0]
    for t in targets[1:]:
        cond = cond | (F.col("_grank") == t)
    qarr = F.array(*[F.lit(q) for q in EXACT_QUANTILES])
    return (
        ranked.filter(cond)
        .select("score", "_grank", "total", F.explode(qarr).alias("quantile"))
        .filter(
            F.col("_grank") == F.ceil(F.col("quantile") * F.col("total")).cast("long")
        )
        .select(
            "quantile",
            F.col("score").cast("double").alias("value"),
            F.col("_grank").alias("rank"),
            F.col("total").alias("n_rows"),
        )
        .orderBy("quantile")
    )


QUERIES["exact_price_quantiles"] = exact_price_quantiles
ORACLE["exact_price_quantiles"] = """
    WITH r AS (
        SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS score,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)),
                            l_orderkey * 10 + l_linenumber) AS rn,
               COUNT(*) OVER () AS n
        FROM lineitem
    )
    -- quantile literals route through DOUBLE before the multiply:
    -- DuckDB VALUES are DECIMAL, and ceil(decimal 0.9 * n) can differ
    -- by one from ceil(double 0.9 * n) exactly when q*n is integral
    -- (double 0.9 sits a half-ulp ABOVE 9/10), so both engines must
    -- run the SAME IEEE product.
    SELECT CAST(q.quantile AS DOUBLE) AS quantile,
           CAST(r.score AS DOUBLE) AS value,
           r.rn AS rank,
           r.n AS n_rows
    FROM r
    JOIN (VALUES (0.5), (0.9), (0.99)) q(quantile)
      ON r.rn = CAST(CEIL(CAST(q.quantile AS DOUBLE) * r.n) AS BIGINT)
    ORDER BY quantile
"""


def sql_pipe_syntax_family(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (SQL:2023-style ``|>`` operator
    chaining): the same segment/status revenue rollup a nested
    SELECT...HAVING would write, expressed as a linear pipeline —
    FROM |> JOIN |> WHERE |> AGGREGATE..GROUP BY |> WHERE(post-agg
    HAVING) |> ORDER BY.  Each pipe stage compiles to exactly the
    relational operator its keyword names, so the physical plan is
    byte-identical to the classic form: the syntax is free abstraction
    (one scan per table, partial+final agg, the post-agg WHERE a
    residual filter on aggregate rows).  The oracle is the equivalent
    classic SQL — DuckDB has no pipe dialect, which is the point:
    pipe syntax is surface, the relational semantics are the contract.

    Money discipline as everywhere: doubles sum as DECIMAL(18,6) then
    round, so totals are independent of partial-agg merge order.

    View names carry the sf path (same isolation note as
    ``sql_udf_pricing_bands``)."""
    import hashlib

    tag = hashlib.md5(sf.encode()).hexdigest()[:10]
    table(spark, sf, "orders").createOrReplaceTempView(f"pipe_orders_{tag}")
    table(spark, sf, "customer").createOrReplaceTempView(f"pipe_customer_{tag}")
    return spark.sql(f"""
        FROM pipe_orders_{tag}
        |> JOIN pipe_customer_{tag} ON o_custkey = c_custkey
        |> WHERE o_totalprice > 500
        |> AGGREGATE COUNT(*) AS n_orders,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                                AS DOUBLE), 4) AS revenue
           GROUP BY c_mktsegment, o_orderstatus
        |> WHERE n_orders > 10
        |> ORDER BY c_mktsegment, o_orderstatus
    """)


ORACLE["sql_pipe_syntax_family"] = """
    SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 500
    GROUP BY c_mktsegment, o_orderstatus
    HAVING COUNT(*) > 10
    ORDER BY c_mktsegment, o_orderstatus
"""

QUERIES["sql_pipe_syntax_family"] = sql_pipe_syntax_family


def collated_group_family(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 string collations: grouping under ``COLLATE UTF8_LCASE``
    treats case variants as one key at the COMPARISON level — no
    normalizing projection, and at scale no second pass: the collation
    rides the hash/sort keys of the exchange itself.  The query
    manufactures case diversity (even order keys lowercase the
    priority), groups on the collated expression, and emits the
    deterministic lower() representative (a collated GROUP BY may
    surface any case variant as the key).  The oracle is the classic
    lower()-normalized GROUP BY — same relation, which is the contract:
    collation is comparison semantics, not data mutation."""
    import hashlib

    tag = hashlib.md5(sf.encode()).hexdigest()[:10]
    table(spark, sf, "orders").createOrReplaceTempView(f"coll_orders_{tag}")
    return spark.sql(f"""
        SELECT lower(k) AS priority_ci,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                          AS DOUBLE), 4) AS revenue
        FROM (
            SELECT CASE WHEN o_orderkey % 2 = 0
                        THEN lower(o_orderpriority)
                        ELSE o_orderpriority END
                       COLLATE UTF8_LCASE AS k,
                   o_totalprice
            FROM coll_orders_{tag}
        )
        GROUP BY k
        ORDER BY priority_ci
    """)


ORACLE["collated_group_family"] = """
    SELECT lower(o_orderpriority) AS priority_ci,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS revenue
    FROM orders
    GROUP BY lower(o_orderpriority)
    ORDER BY priority_ci
"""

QUERIES["collated_group_family"] = collated_group_family


def group_order_by_all_family(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 ``GROUP BY ALL`` / ``ORDER BY ALL`` surface: the
    analyst-ergonomics syntax that infers the grouping key set from
    the non-aggregate select items and orders by the full output row.
    Both resolve at ANALYSIS time into the explicit forms, so the
    physical plan is identical to spelling the columns out — the
    entry pins that equivalence (same rollup as an explicit GROUP BY
    l_returnflag, l_linestatus ORDER BY 1, 2).  DuckDB pioneered this
    syntax, so the oracle runs the SAME text modulo view names — the
    cross-engine check covers the dialect itself, not just the
    rollup.

    Money discipline as everywhere: DECIMAL(18,6) sums before the
    final double round."""
    import hashlib

    tag = hashlib.md5(sf.encode()).hexdigest()[:10]
    table(spark, sf, "lineitem").createOrReplaceTempView(f"gba_lineitem_{tag}")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                          AS DOUBLE), 4) AS revenue
        FROM gba_lineitem_{tag}
        WHERE l_quantity > 5
        GROUP BY ALL
        ORDER BY ALL
    """)


ORACLE["group_order_by_all_family"] = """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                      AS DOUBLE), 4) AS revenue
    FROM lineitem
    WHERE l_quantity > 5
    GROUP BY ALL
    ORDER BY ALL
"""

QUERIES["group_order_by_all_family"] = group_order_by_all_family
