"""TPC-H-completion fact-table workload: the classic decision-support
shapes NOT already covered by relational.py's Q1/Q3/Q5/Q6/Q7/Q10/Q14/Q15
retargets — outer-join count distributions (Q13), correlated-average
semijoin (Q17), HAVING-subquery lookups (Q18), disjunctive multi-branch
predicates (Q19), multi-EXISTS self-correlation (Q21), and anti-join
with an uncorrelated scalar threshold (Q22).

These complete the relational surface beyond the reference's own 8-query
workload (SURVEY.md §2.12 carries only joins + group-bys + windows); a
warehouse user switching engines expects every one of these shapes to
plan well.

Scale notes (100 TB):
- Q13 shape: the left join shuffles on the customer key once; the
  second aggregation runs over one row per customer — already reduced.
- Q17 shape: the per-part average is a partial+final agg keyed on the
  JOIN key itself, so AQE can plan the avg⋈lineitem join shuffle-free
  on the reused exchange; the filter keeps only ~1/5 of rows before the
  final brand rollup.
- Q18 shape: sum(qty) per order reduces lineitem ~4:1 BEFORE any join;
  the >threshold filter then keeps a tiny key set that broadcast-joins
  back to orders/customer.
- Q19 shape: the disjunction references only scan columns, so it pushes
  into BOTH parquet scans as a residual filter; part broadcasts.
- Q21 shape: expressed as ONE grouped aggregate per order (distinct
  suppliers, distinct returning suppliers) instead of the textbook
  EXISTS + NOT EXISTS pair — the correlated-subquery form decorrelates
  into exactly these self-joins anyway, and the explicit form does one
  pass, not two.
- Q22 shape: the no-orders test is a left-anti hash join (null-safe by
  construction: keys non-null); the balance threshold arrives as a
  1-row broadcast. The double average is NEVER materialized: the
  predicate cross-multiplies (bal * n > sum) in exact decimal so both
  engines agree to the last bit.

Determinism contract: money/quantity sums route through DECIMAL before
the final double cast (partial-agg order cannot perturb them); every
top-k carries a unique tie-break key; thresholds are compared in exact
integer/decimal arithmetic, never via a divided double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pinterest_data_pipeline6_spark.sources.readers import table, widen_small_scan

# Q18-shaped: orders whose total quantity exceeds this (p99 of the
# per-order sum-of-quantity distribution sits near 260 in the testdata
# generator at every SF, so the survivors are a genuinely small set).
LARGE_ORDER_QTY = 300

# Q21-shaped: how many suppliers to report.
SOLE_FAIL_TOP_N = 10


def order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13-shaped: the distribution of per-customer order counts,
    customers with zero qualifying orders included — the left OUTER
    join is the point (an inner join would silently drop the 0 bucket).

    One shuffle on the customer key produces one row per customer; the
    distribution agg then runs on an already-reduced relation (|rows| =
    |customers|), and its own group count is at most the max order
    count — tiny at any scale.
    """
    orders, customer = (table(spark, sf, t) for t in ("orders", "customer"))
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            customer.c_custkey == orders.o_custkey,
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


def small_qty_part_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17-shaped: revenue carried by line items whose quantity is
    below 20% of their part's average quantity, rolled up per brand.

    The correlated scalar subquery (``AVG(l_quantity) WHERE l_partkey =
    outer``) is expressed directly as a per-part aggregate joined back
    on the part key — the exact decorrelation Catalyst would emit, but
    with the aggregate's exchange reusable for the join because both
    hash on l_partkey.

    The 20%-of-average comparison is cross-multiplied into exact
    decimal arithmetic (``5 * qty * n_lines < sum_qty``) so no double
    average exists for the two engines to disagree on.
    """
    li, part = (table(spark, sf, t) for t in ("lineitem", "part"))
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sum_qty"),
        F.count("*").alias("n_lines"),
    )
    return (
        li.join(per_part, li.l_partkey == F.col("pk"))
        .filter(
            F.col("l_quantity").cast("decimal(18,6)") * 5 * F.col("n_lines")
            < F.col("sum_qty")
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_small_qty_items"),
            # total, not the classic /7 "avg yearly": decimal division
            # has different result-scale rules in Spark vs DuckDB, so
            # the derived average is left to the consumer
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("small_qty_revenue"),
        )
    )


def large_order_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18-shaped: the top-20 largest orders by total quantity
    with their customers — the ``HAVING SUM(qty) > k`` IN-subquery
    form, planned as reduce-then-join.

    lineitem reduces to one row per order FIRST (partial+final sum on
    the natural key); the threshold filter then leaves a key set small
    enough that AQE broadcast-joins it to orders and customer. The
    top-20 compiles to TakeOrderedAndProject with o_orderkey as the
    unique tie-break.
    """
    li, orders, customer = (
        table(spark, sf, t) for t in ("lineitem", "orders", "customer")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("dec_qty"))
        .filter(F.col("dec_qty") > LARGE_ORDER_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("dec_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def disjunctive_part_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue from three OR'd (type, size-band,
    quantity-band) branches, reported per branch.

    The disjunction references only scan columns of the two relations,
    so it survives as a pushed residual on both parquet scans (checked
    in tests/test_plans.py); part broadcasts. Branch attribution uses
    first-match CASE so the three output rows partition the matched
    set even where bands overlap.
    """
    li, part = (table(spark, sf, t) for t in ("lineitem", "part"))
    b1 = (
        (F.col("p_type") == "PROMO")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b2 = (
        (F.col("p_type") == "ECONOMY")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    b3 = (
        (F.col("p_type") == "STANDARD")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(b1 | b2 | b3)
        .withColumn(
            "branch",
            F.when(b1, "promo_small").when(b2, "economy_mid").otherwise("standard_large"),
        )
        .groupBy("branch")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        )
    )


def sole_return_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21-shaped: in multi-supplier orders where EXACTLY ONE
    supplier's items came back returned, count such orders per
    culprit supplier and report the top 10.

    The textbook form is EXISTS (another supplier in the order) AND NOT
    EXISTS (another supplier who also returned) — both decorrelate to
    self-joins of lineitem on the order key. This implementation runs
    the decorrelated shape directly as ONE grouped aggregate per order
    (distinct suppliers / distinct returning suppliers via one Expand),
    then joins the distinct (order, returning-supplier) pairs against
    the qualifying order keys: one lineitem-wide shuffle total, versus
    two for the EXISTS pair.
    """
    li, supplier = (table(spark, sf, t) for t in ("lineitem", "supplier"))
    li = widen_small_scan(li)
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    qualifying = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_supp_r") == 1)
    ).select("l_orderkey")
    return_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        return_pairs.join(qualifying, "l_orderkey")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_sole_fail_orders"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "n_sole_fail_orders")
        .orderBy(F.desc("n_sole_fail_orders"), F.asc("s_suppkey"))
        .limit(SOLE_FAIL_TOP_N)
    )


IDLE_PRICE_FLOOR = 350_000


def idle_customer_segments(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22-shaped: per market segment, the count and total balance
    of customers who hold an above-average positive balance yet placed
    no BIG order (``o_totalprice > 350k`` — the testdata generator gives
    every customer some order, so the classic no-orders-at-all form
    would be vacuously empty at every SF).

    The no-big-orders test is a left-anti hash join on the customer key
    against the price-filtered orders (filter pushed to the scan; keys
    are non-null, so no null-aware variant is needed). The threshold —
    the average positive balance — never materializes as a double: the
    1-row exact aggregate (sum as DECIMAL, count) broadcasts and the
    predicate cross-multiplies ``bal * n_pos > sum_pos``, so
    partial-agg order can't flip a boundary customer on either engine.
    """
    orders, customer = (table(spark, sf, t) for t in ("orders", "customer"))
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("sum_pos"),
        F.count("*").alias("n_pos"),
    )
    return (
        customer.join(
            orders.filter(F.col("o_totalprice") > IDLE_PRICE_FLOOR).select(
                "o_custkey"
            ),
            customer.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(pos))
        .filter(
            F.col("c_acctbal").cast("decimal(18,2)") * F.col("n_pos")
            > F.col("sum_pos")
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_idle_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_balance"),
        )
    )


MARKET_REGION = "ASIA"  # Q8-shaped: the market under analysis
MARKET_NATION = "NATION_2"  # ...and the supplier nation whose share we track


def market_share_by_year(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8-shaped: within one region's customer market, the share
    of revenue supplied by one nation's suppliers, per order year — the
    classic two-`nation` (customer side vs supplier side) seven-relation
    join.

    Scale shape: nation⋈region composes into a tiny broadcast keyed on
    nationkey used TWICE — once to filter customers into the market
    region, once to tag each line's supplier nation. The only wide
    shuffles are lineitem⋈orders (order key) and orders⋈customer
    (customer key); supplier joins on suppkey where AQE picks broadcast
    at small SF and a shuffle join at warehouse scale. Revenue sums in
    exact decimal; the share divides two already-rounded doubles so
    both engines round the identical IEEE quotient.
    """
    li, orders, customer, supplier, nation, region = (
        table(spark, sf, t)
        for t in ("lineitem", "orders", "customer", "supplier", "nation", "region")
    )
    nat_reg = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")
    market_cust = customer.join(
        F.broadcast(nat_reg.filter(F.col("r_name") == MARKET_REGION)),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nation = supplier.join(
        F.broadcast(nat_reg),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(market_cust, orders.o_custkey == F.col("c_custkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("market_revenue"),
            F.round(
                F.sum(F.when(F.col("supp_nation") == MARKET_NATION, rev)), 2
            )
            .cast("double")
            .alias("nation_revenue"),
        )
        .withColumn(
            "nation_share",
            F.round(
                F.coalesce(F.col("nation_revenue"), F.lit(0.0))
                / F.col("market_revenue"),
                6,
            ),
        )
        .orderBy("order_year")
    )


FAST_SHIP_DAYS = 30  # ship-latency band edges (days from order to ship)
LATE_SHIP_DAYS = 60


def ship_latency_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12-shaped: line items bucketed by order-to-ship latency
    band, counting lines from high-priority (1-URGENT / 2-HIGH) versus
    lower-priority orders per band — the shipping-SLA-vs-priority audit.
    (The testdata carries no l_shipmode/l_commitdate, so the band plays
    Q12's ship-mode role; the CASE-sum priority split is verbatim Q12.)

    One lineitem⋈orders shuffle on the order key; the band and the two
    priority indicator sums are map-side projections, so the final
    3-row rollup aggregates an already-slim relation. Latency compares
    DATE-truncated calendar days so both engines count identically.
    """
    li, orders = (table(spark, sf, t) for t in ("lineitem", "orders"))
    lat = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(lat < FAST_SHIP_DAYS, "fast")
            .when(lat < LATE_SHIP_DAYS, "normal")
            .otherwise("late")
            .alias("latency_band"),
            high.alias("hi"),
        )
        .groupBy("latency_band")
        .agg(
            F.sum(F.when(F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_priority_lines"),
            F.sum(F.when(F.col("hi"), 0).otherwise(1))
            .cast("bigint")
            .alias("low_priority_lines"),
        )
        .orderBy("latency_band")
    )


def rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer segmentation: quartile each customer on Recency
    (days from last order to the corpus's max order date), Frequency
    (order count), and Monetary (exact-decimal revenue sum), then roll
    up the 4x4x4 segment grid with counts and revenue.

    Quartiles are EQUI-HEIGHT (ntile(4) semantics) over (metric,
    c_custkey) — the unique key makes every assignment deterministic
    cross-engine. A global ``ntile OVER (ORDER BY ...)`` would funnel
    every customer through one task; this stacks the three metrics into
    long format and runs ONE grouped distributed-ntile pass
    (textops._distributed_ntile with group_cols=[metric]): a single
    range shuffle of slim (metric, score, key) triples covers all three
    quartile orderings, the rank-offset prefix-sums partition by metric
    (no SinglePartition exchange anywhere), and a conditional aggregate
    pivots the long assignments back to one row per customer. The
    metric scores travel as doubles — recency/frequency are small ints
    and monetary is a 2-decimal quantity below 2^53, so the cast is
    order-preserving and collision-free, which keeps every assignment
    identical to ntile over the native types. The date anchor is a
    1-row broadcast; recency compares DATE-truncated calendar days so
    both engines count identically.
    """
    from pinterest_data_pipeline6_spark.operators.textops import _distributed_ntile

    orders = table(spark, sf, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("dec_monetary"),
    )
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("anchor"))
    base = per_cust.join(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("anchor", "last_order").alias("recency_days"),
        "frequency",
        "dec_monetary",
    )

    long = base.select(
        F.col("o_custkey").alias("doc_id"),
        F.expr(
            "stack(3, 'r', CAST(recency_days AS DOUBLE),"
            " 'f', CAST(frequency AS DOUBLE),"
            " 'm', CAST(dec_monetary AS DOUBLE)) AS (metric, score)"
        ),
    )
    binned = _distributed_ntile(long, n_buckets=4, group_cols=["metric"])
    quart = binned.groupBy(F.col("doc_id").alias("o_custkey")).agg(
        F.max(F.when(F.col("metric") == "r", F.col("decile"))).alias("r_quartile"),
        F.max(F.when(F.col("metric") == "f", F.col("decile"))).alias("f_quartile"),
        F.max(F.when(F.col("metric") == "m", F.col("decile"))).alias("m_quartile"),
    )

    return (
        base.join(quart, "o_custkey")
        .groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("dec_monetary"), 2).cast("double").alias("total_monetary"),
        )
    )


# CDC snapshot-diff: two overlapping order-date windows play the role
# of "yesterday's" and "today's" table snapshots; rows leaving the
# window are deletes, rows entering are inserts, and every 13th order
# key gets its status amended in snapshot B to simulate in-place
# updates. The checksum modulus keeps per-group key sums inside BIGINT.
CDC_A_LO, CDC_A_HI = "1995-01-01", "1996-12-31"
CDC_B_LO, CDC_B_HI = "1995-07-01", "1997-06-30"
CDC_AMEND_MOD = 13
CDC_CHECKSUM_MOD = 1_000_000_007


def snapshot_diff_cdc(spark: SparkSession, sf: str) -> DataFrame:
    """Change-data-capture between two table snapshots: a full outer
    join on the primary key classifies every row as insert (B only),
    delete (A only), update (both, value changed — null-safe compare),
    or unchanged, and emits per-class row counts plus a key checksum.

    This is the diff an incremental-view-maintenance or replication
    audit runs; ``merge_upsert`` applies changes, this one DETECTS
    them. Scale shape: one full-outer shuffle hash join keyed on the
    primary key (both sides pre-projected to key+compare column), then
    a 4-group aggregate — no sort, no window. The checksum sums
    pre-reduced ``key % M`` terms so the partial aggregates stay inside
    BIGINT at any cardinality."""
    orders = table(spark, sf, "orders")
    a = orders.filter(F.col("o_orderdate").between(CDC_A_LO, CDC_A_HI)).select(
        F.col("o_orderkey").alias("ak"), F.col("o_orderstatus").alias("val_a")
    )
    b = orders.filter(F.col("o_orderdate").between(CDC_B_LO, CDC_B_HI)).select(
        F.col("o_orderkey").alias("bk"),
        F.when(F.col("o_orderkey") % CDC_AMEND_MOD == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("val_b"),
    )
    j = a.join(b, a.ak == b.bk, "full_outer")
    change = (
        F.when(F.col("ak").isNull(), F.lit("insert"))
        .when(F.col("bk").isNull(), F.lit("delete"))
        .when(F.col("val_a").eqNullSafe(F.col("val_b")), F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    key = F.coalesce(F.col("ak"), F.col("bk"))
    return (
        j.select(change.alias("change_type"), (key % CDC_CHECKSUM_MOD).alias("kmod"))
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n_rows"),
            (F.sum("kmod") % CDC_CHECKSUM_MOD).alias("key_checksum"),
        )
        .orderBy("change_type")
    )


ORACLE: dict[str, str] = {
    "snapshot_diff_cdc": """
        WITH a AS (
            SELECT o_orderkey AS ak, o_orderstatus AS val_a FROM orders
            WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        ),
        b AS (
            SELECT o_orderkey AS bk,
                   CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END AS val_b
            FROM orders
            WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1997-06-30'
        ),
        j AS (
            SELECT ak, bk, val_a, val_b,
                   CASE
                       WHEN ak IS NULL THEN 'insert'
                       WHEN bk IS NULL THEN 'delete'
                       WHEN val_a IS NOT DISTINCT FROM val_b THEN 'unchanged'
                       ELSE 'update'
                   END AS change_type,
                   COALESCE(ak, bk) % 1000000007 AS kmod
            FROM a FULL OUTER JOIN b ON ak = bk
        )
        SELECT change_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(CAST(SUM(kmod) AS BIGINT) % 1000000007 AS BIGINT) AS key_checksum
        FROM j
        GROUP BY change_type
        ORDER BY change_type
    """,
    "order_count_distribution": """
        SELECT n_orders, COUNT(*) AS n_customers
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c.c_custkey
        )
        GROUP BY n_orders
    """,
    "small_qty_part_revenue": """
        WITH per_part AS (
            SELECT l_partkey AS pk,
                   SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
                   COUNT(*) AS n_lines
            FROM lineitem GROUP BY l_partkey
        )
        SELECT p.p_brand AS brand,
               COUNT(*) AS n_small_qty_items,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS small_qty_revenue
        FROM lineitem l
        JOIN per_part pp ON l.l_partkey = pp.pk
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE CAST(l.l_quantity AS DECIMAL(18,6)) * 5 * pp.n_lines < pp.sum_qty
        GROUP BY p.p_brand
    """,
    "large_order_customers": """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
               CAST(b.dec_qty AS DOUBLE) AS total_qty
        FROM (
            SELECT l_orderkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS dec_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
        ) b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 20
    """,
    "disjunctive_part_revenue": """
        WITH matched AS (
            SELECT CASE
                     WHEN p_type = 'PROMO' AND p_size BETWEEN 1 AND 15
                          AND l_quantity BETWEEN 1 AND 20 THEN 'promo_small'
                     WHEN p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 30
                          AND l_quantity BETWEEN 10 AND 30 THEN 'economy_mid'
                     ELSE 'standard_large'
                   END AS branch,
                   CAST(l_extendedprice AS DECIMAL(18,6))
                     * CAST(1 - l_discount AS DECIMAL(18,6)) AS rev
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 30)
               OR (p_type = 'STANDARD' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 20 AND 40)
        )
        SELECT branch, COUNT(*) AS n_items,
               CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue
        FROM matched GROUP BY branch
    """,
    "sole_return_supplier": """
        WITH per_order AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                       THEN l_suppkey END) AS n_supp_r
            FROM lineitem GROUP BY l_orderkey
        ),
        qualifying AS (
            SELECT l_orderkey FROM per_order
            WHERE n_supp > 1 AND n_supp_r = 1
        ),
        return_pairs AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM lineitem WHERE l_returnflag = 'R'
        )
        SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_sole_fail_orders
        FROM return_pairs rp
        JOIN qualifying q ON rp.l_orderkey = q.l_orderkey
        JOIN supplier s ON rp.l_suppkey = s.s_suppkey
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY n_sole_fail_orders DESC, s.s_suppkey ASC
        LIMIT 10
    """,
    "idle_customer_segments": """
        WITH pos AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos,
                   COUNT(*) AS n_pos
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_idle_customers,
               CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS total_balance
        FROM customer c, pos
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 350000)
          AND CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n_pos > pos.sum_pos
        GROUP BY c.c_mktsegment
    """,
}

ORACLE["market_share_by_year"] = """
    WITH nat_reg AS (
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    ),
    market_cust AS (
        SELECT c_custkey FROM customer
        JOIN nat_reg ON c_nationkey = n_nationkey
        WHERE r_name = 'ASIA'
    ),
    supp_nation AS (
        SELECT s_suppkey, n_name AS supp_nation FROM supplier
        JOIN nat_reg ON s_nationkey = n_nationkey
    ),
    yearly AS (
        SELECT EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                   * CAST(1 - l.l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS market_revenue,
               CAST(ROUND(SUM(CASE WHEN sn.supp_nation = 'NATION_2'
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,6))
                        * CAST(1 - l.l_discount AS DECIMAL(18,6)) END), 2)
                   AS DOUBLE) AS nation_revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN market_cust mc ON o.o_custkey = mc.c_custkey
        JOIN supp_nation sn ON l.l_suppkey = sn.s_suppkey
        GROUP BY 1
    )
    SELECT order_year, market_revenue, nation_revenue,
           ROUND(COALESCE(nation_revenue, 0.0) / market_revenue, 6)
               AS nation_share
    FROM yearly
    ORDER BY order_year
"""

ORACLE["ship_latency_priority"] = """
    SELECT CASE
             WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) < 30 THEN 'fast'
             WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) < 60 THEN 'normal'
             ELSE 'late'
           END AS latency_band,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    ORDER BY latency_band
"""

ORACLE["rfm_segments"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               MAX(CAST(o_orderdate AS DATE)) AS last_order,
               COUNT(*) AS frequency,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS dec_monetary
        FROM orders GROUP BY o_custkey
    ),
    a AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
    base AS (
        SELECT o_custkey,
               date_diff('day', last_order, anchor) AS recency_days,
               frequency, dec_monetary
        FROM per_cust, a
    ),
    q AS (
        SELECT o_custkey, dec_monetary,
               NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_quartile,
               NTILE(4) OVER (ORDER BY frequency, o_custkey) AS f_quartile,
               NTILE(4) OVER (ORDER BY dec_monetary, o_custkey) AS m_quartile
        FROM base
    )
    SELECT r_quartile, f_quartile, m_quartile,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(dec_monetary), 2) AS DOUBLE) AS total_monetary
    FROM q
    GROUP BY r_quartile, f_quartile, m_quartile
"""

QUERIES = {
    "order_count_distribution": order_count_distribution,
    "snapshot_diff_cdc": snapshot_diff_cdc,
    "market_share_by_year": market_share_by_year,
    "ship_latency_priority": ship_latency_priority,
    "rfm_segments": rfm_segments,
    "small_qty_part_revenue": small_qty_part_revenue,
    "large_order_customers": large_order_customers,
    "disjunctive_part_revenue": disjunctive_part_revenue,
    "sole_return_supplier": sole_return_supplier,
    "idle_customer_segments": idle_customer_segments,
}


# ---------------------------------------------------------------------------
# Round-5 completion: the remaining classic decision-support shapes —
# min-cost-supplier (Q2), product profit (Q9), important-share HAVING
# against a scalar (Q11), supplier-count with NOT-IN exclusion (Q16),
# and the nested share-of-total qualification (Q20).  The testdata has
# no partsupp relation, so the supplier⇄part cost/availability facts
# those queries read are re-derived from lineitem itself (the offer a
# supplier actually shipped), which preserves every plan shape the
# originals exercise: correlated-min decorrelation, HAVING vs scalar
# subquery, NOT IN anti-join, and the >fraction-of-group-total test.
# ---------------------------------------------------------------------------

MIN_COST_TYPES = ("ECONOMY", "PROMO")  # Q2-shaped part filter
MIN_COST_TOP_N = 100

def min_cost_supplier_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2-shaped: for each qualifying part, the supplier offering
    the lowest observed unit price, enriched with the supplier's nation
    — the textbook correlated `= (SELECT MIN ...)` subquery.

    The correlated min decorrelates into ONE grouped aggregate:
    ``min(struct(price, suppkey))`` per part is lexicographic, so it
    yields exactly the two-stage answer (cheapest offer, smallest
    suppkey on ties) in a single partial-aggregatable pass over
    lineitem — no self-join against a per-part MIN relation, which is
    what a naive translation would shuffle twice for.  The part filter
    broadcast-prunes BEFORE the aggregate (cheap side pushed into the
    join), supplier/nation are broadcast dims, and the final global
    top-N is TakeOrderedAndProject — no full sort at any scale.
    """
    li, part, supplier, nation = (
        table(spark, sf, t) for t in ("lineitem", "part", "supplier", "nation")
    )
    wanted = part.filter(
        F.col("p_type").isin(*MIN_COST_TYPES) & (F.col("p_size") % 5 == 0)
    ).select("p_partkey", "p_type", "p_size")
    best = (
        li.join(F.broadcast(wanted), li.l_partkey == wanted.p_partkey)
        .groupBy("p_partkey", "p_type", "p_size")
        .agg(
            F.min(
                F.struct(
                    F.col("l_extendedprice").cast("decimal(18,2)").alias("cost"),
                    F.col("l_suppkey").alias("sk"),
                )
            ).alias("b")
        )
    )
    return (
        best.join(F.broadcast(supplier), F.col("b.sk") == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("s_acctbal").alias("s_acctbal"),
            F.col("s_name").alias("s_name"),
            F.col("n_name").alias("n_name"),
            F.col("p_partkey").alias("p_partkey"),
            F.col("p_type").alias("p_type"),
            F.col("p_size").alias("p_size"),
            F.col("b.cost").cast("double").alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey")
        .limit(MIN_COST_TOP_N)
    )


PROFIT_PART_PREFIX = "red "  # Q9-shaped part-name filter

def nation_profit_trend(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9-shaped: supplier-nation profit per order year for one
    product family, where profit = discounted revenue minus the cost of
    goods (retail price x quantity stands in for ps_supplycost — the
    testdata has no partsupp).

    Q9 is the classic multi-big-join stress test: the only wide shuffle
    here is lineitem⋈orders on the order key (both large); part after
    its name-prefix filter (~1/8 of parts), supplier, and nation are
    broadcast dims, so no second fact-sized exchange exists.  Profit
    terms multiply in exact decimal BEFORE the sum (double products
    would make the partial-agg order observable); the (nation, year)
    group count is bounded at 25 x years regardless of SF.
    """
    li, orders, part, supplier, nation = (
        table(spark, sf, t)
        for t in ("lineitem", "orders", "part", "supplier", "nation")
    )
    wanted = part.filter(part.p_name.startswith(PROFIT_PART_PREFIX)).select(
        "p_partkey", F.col("p_retailprice").cast("decimal(18,2)").alias("cost_unit")
    )
    profit = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,6)") - F.col("cost_unit") * F.col("l_quantity").cast(
        "decimal(18,2)"
    )
    return (
        li.join(F.broadcast(wanted), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.round(F.sum(profit), 2).cast("double").alias("profit"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("nation", F.desc("order_year"))
    )


# keep parts above NUM/DEN x the mean part revenue (1.5x: the synthetic
# part-revenue distribution is near-uniform — max/mean is only ~1.8 — so
# the classic "2x the mean" would return zero rows at every SF)
IMPORTANT_SHARE_NUM = 3
IMPORTANT_SHARE_DEN = 2

def important_part_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11-shaped: parts whose revenue exceeds a fraction of the
    corpus total — HAVING against an uncorrelated scalar subquery.

    The per-part aggregate is one partial+final shuffle on l_partkey;
    the scalar (total revenue + distinct part count) re-derives from
    those SAME per-part rows — a second tiny agg over an already
    |parts|-sized relation, broadcast back as one row.  The threshold
    is self-scaling ("> NUM/DEN x the mean part revenue"), so the
    shape stays non-degenerate at every SF.  The cross-multiplied
    comparison runs in DOUBLE on BOTH sides: a decimal product here is
    NOT portable — Spark's allowPrecisionLoss truncates
    decimal(38,12) x bigint to scale 6 while DuckDB keeps the exact
    scale-12 product, so the engines would compare at different
    precisions near the boundary.  Identical IEEE expressions over the
    same exact decimal sums give bit-identical doubles in both
    engines, which is the property the oracle gate actually needs.
    """
    li = table(spark, sf, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,6)")
    per_part = li.groupBy("l_partkey").agg(F.sum(rev).alias("dec_rev"))
    totals = per_part.agg(
        F.sum("dec_rev").alias("total_rev"), F.count("*").alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .filter(
            F.col("dec_rev").cast("double") * F.col("n_parts") * IMPORTANT_SHARE_DEN
            > F.lit(IMPORTANT_SHARE_NUM) * F.col("total_rev").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("dec_rev"), 2).cast("double").alias("part_revenue"),
        )
        .orderBy(F.desc("part_revenue"), "p_partkey")
    )


EXCLUDED_PART_TYPE = "STANDARD"  # Q16-shaped NOT-IN exclusions

def supplier_count_by_attrs(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16-shaped: how many distinct suppliers can ship each
    (type, size-band) of part, excluding one part family and every
    "complaint" supplier (negative account balance stands in for the
    LIKE '%Customer%Complaints%' comment scan).

    The NOT IN subquery is a left-anti broadcast join (the excluded
    supplier set is tiny by construction); the distinct count shuffles
    (type, band, suppkey) triples that partial-dedup map-side, never
    raw lines.  Output cardinality is |types| x |bands| — bounded.
    """
    li, part, supplier = (
        table(spark, sf, t) for t in ("lineitem", "part", "supplier")
    )
    wanted = part.filter(F.col("p_type") != EXCLUDED_PART_TYPE).select(
        "p_partkey", "p_type", (F.floor(F.col("p_size") / 10)).alias("size_band")
    )
    complaints = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(wanted), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(complaints),
            li.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .groupBy("p_type", "size_band")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_type", "size_band")
    )


QUALIFY_PART_PREFIX = "small "  # Q20-shaped part-name filter
QUALIFY_YEAR = 1996
QUALIFY_DENOM = 12  # supplier qualifies when year qty > total/DENOM
# (TPC-H Q20 uses 0.5 of availqty; here the base is the part's ALL-TIME
# shipped volume across ~7 years spread over ~25 suppliers, so the max
# observed single-(supplier, year) share is ~0.12 — 1/12 keeps the
# qualification selective but non-empty at every SF)

def qualified_part_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20-shaped: suppliers who shipped MORE than a twelfth of a
    qualifying part's all-time volume within one year — the nested
    `IN (parts) ... > 0.5 * (SELECT SUM ...)` qualification chain.

    Both sides of the share test come from ONE aggregate over the
    name-filtered lines: per (part, supplier) the year quantity and the
    all-quantity partial-agg together; the per-part total then derives
    as a window SUM over that already |parts x suppliers|-sized
    relation — the naive plan's second scan of lineitem never happens
    (a separate groupBy branch would defeat exchange reuse here:
    column pruning gives the two consumers different scan schemas, so
    Catalyst cannot canonicalize them into one subtree).  The share
    compares DENOM x supp_qty > part_total in exact decimal
    (quantities are integral), and the supplier set semi-joins back to
    the dimension for names — an EXISTS, not a fact-side fanout.
    """
    li, part, supplier, nation = (
        table(spark, sf, t) for t in ("lineitem", "part", "supplier", "nation")
    )
    wanted = part.filter(part.p_name.startswith(QUALIFY_PART_PREFIX)).select(
        "p_partkey"
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    per_ps = (
        li.join(F.broadcast(wanted), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.year("l_shipdate") == QUALIFY_YEAR, qty)).alias(
                "year_qty"
            ),
            F.sum(qty).alias("all_qty"),
        )
    )
    part_total = F.sum("all_qty").over(Window.partitionBy("l_partkey"))
    qualified = (
        per_ps.withColumn("part_qty", part_total)
        .filter(F.col("year_qty") * QUALIFY_DENOM > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(F.broadcast(qualified), supplier.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


_MIN_COST_TYPES_SQL = ", ".join(f"'{t}'" for t in MIN_COST_TYPES)
ORACLE["min_cost_supplier_parts"] = f"""
    WITH wanted AS (
        SELECT p_partkey, p_type, p_size FROM part
        WHERE p_type IN ({_MIN_COST_TYPES_SQL}) AND p_size % 5 = 0
    ),
    offers AS (
        SELECT w.p_partkey, w.p_type, w.p_size,
               MIN(ROW(CAST(l.l_extendedprice AS DECIMAL(18,2)), l.l_suppkey))
                   AS b
        FROM lineitem l JOIN wanted w ON l.l_partkey = w.p_partkey
        GROUP BY w.p_partkey, w.p_type, w.p_size
    )
    SELECT s.s_acctbal, s.s_name, n.n_name,
           o.p_partkey, o.p_type, o.p_size,
           CAST(b[1] AS DOUBLE) AS min_cost
    FROM offers o
    JOIN supplier s ON b[2] = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY s.s_acctbal DESC, o.p_partkey
    LIMIT {MIN_COST_TOP_N}
"""

ORACLE["nation_profit_trend"] = f"""
    SELECT n.n_name AS nation,
           EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
           CAST(ROUND(SUM(
               CAST(l.l_extendedprice AS DECIMAL(18,6))
                   * CAST(1 - l.l_discount AS DECIMAL(18,6))
               - CAST(p.p_retailprice AS DECIMAL(18,2))
                   * CAST(l.l_quantity AS DECIMAL(18,2))
           ), 2) AS DOUBLE) AS profit,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '{PROFIT_PART_PREFIX}%'
    GROUP BY 1, 2
    ORDER BY nation, order_year DESC
"""

ORACLE["important_part_share"] = f"""
    WITH per_part AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                   * CAST(1 - l_discount AS DECIMAL(18,6))) AS dec_rev
        FROM lineitem GROUP BY l_partkey
    ),
    totals AS (
        SELECT SUM(dec_rev) AS total_rev, COUNT(*) AS n_parts FROM per_part
    )
    SELECT l_partkey AS p_partkey,
           CAST(ROUND(dec_rev, 2) AS DOUBLE) AS part_revenue
    FROM per_part, totals
    WHERE CAST(dec_rev AS DOUBLE) * n_parts * {IMPORTANT_SHARE_DEN}
          > {IMPORTANT_SHARE_NUM} * CAST(total_rev AS DOUBLE)
    ORDER BY part_revenue DESC, p_partkey
"""

ORACLE["supplier_count_by_attrs"] = f"""
    SELECT p.p_type, CAST(FLOOR(p.p_size / 10) AS BIGINT) AS size_band,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> '{EXCLUDED_PART_TYPE}'
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, p_type, size_band
"""

ORACLE["qualified_part_shippers"] = f"""
    WITH per_ps AS (
        SELECT l.l_partkey, l.l_suppkey,
               SUM(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = {QUALIFY_YEAR}
                        THEN CAST(l.l_quantity AS DECIMAL(18,2)) END)
                   AS year_qty,
               SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS all_qty
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE '{QUALIFY_PART_PREFIX}%'
        GROUP BY 1, 2
    ),
    per_part AS (
        SELECT l_partkey, SUM(all_qty) AS part_qty FROM per_ps GROUP BY 1
    ),
    qualified AS (
        SELECT DISTINCT ps.l_suppkey
        FROM per_ps ps JOIN per_part pp ON ps.l_partkey = pp.l_partkey
        WHERE ps.year_qty * {QUALIFY_DENOM} > pp.part_qty
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM qualified)
    ORDER BY s.s_suppkey
"""

QUERIES["min_cost_supplier_parts"] = min_cost_supplier_parts
QUERIES["nation_profit_trend"] = nation_profit_trend
QUERIES["important_part_share"] = important_part_share
QUERIES["supplier_count_by_attrs"] = supplier_count_by_attrs
QUERIES["qualified_part_shippers"] = qualified_part_shippers


def late_ship_order_priorities(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4-shaped (the last uncovered query of the 22): per order
    priority, how many orders placed in the first quarter of 1995 have
    AT LEAST ONE line item that shipped more than ``LATE_SHIP_DAYS``
    days after the order date — Q4's correlated EXISTS, with the
    ship-after-order latency standing in for commitdate < receiptdate
    (the testdata carries neither commit nor receipt dates).

    Spark-first shape: the EXISTS decorrelates to a LEFT SEMI hash join
    orders -> lineitem on the order key with the latency predicate in
    the join condition — one shuffle, no duplicate-orders blowup, no
    distinct.  The quarter filter prunes the probe side at the scan
    (pushed to parquet), and the late-line test needs o_orderdate, so
    the predicate rides the join rather than pre-filtering lineitem.
    """
    li, orders = (table(spark, sf, t) for t in ("lineitem", "orders"))
    q1 = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1995-04-01").cast("date"))
    )
    late = F.datediff(
        F.to_date(li.l_shipdate), F.to_date(q1.o_orderdate)
    ) > F.lit(LATE_SHIP_DAYS)
    return (
        q1.join(li, (q1.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


ORACLE["late_ship_order_priorities"] = f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1995-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE)) > {LATE_SHIP_DAYS}
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["late_ship_order_priorities"] = late_ship_order_priorities


def abc_revenue_classes(spark: SparkSession, sf: str) -> DataFrame:
    """ABC / Pareto classification of customers by revenue — the
    warehouse staple behind "which 20% of accounts carry 80% of
    revenue": customers sort by revenue descending, the top tier
    covering 80% of cumulative revenue is class A, up to 95% class B,
    the tail class C.  Per class: customer count, revenue, and revenue
    share.

    100 TB shape: the per-customer rollup is one partial+final agg on
    the high-cardinality key; the global ordered CUMULATIVE revenue —
    the part a naive ``SUM() OVER (ORDER BY ...)`` would funnel through
    ONE task — distributes exactly like the engine's rank core: one
    range shuffle on (-revenue, custkey), per-partition running
    DECIMAL sums, and a broadcast prefix-sum of the #partitions-row
    per-partition totals.  Sums stay DECIMAL end-to-end so every
    cumulative value (and therefore every A/B/C boundary) is exact and
    engine-independent; only the final share division goes double."""
    orders = table(spark, sf, "orders")
    rev = (
        orders.filter(
            F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull()
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("revenue")
        )
    )
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = rev.select(
        "o_custkey", "revenue", (-F.col("revenue")).alias("score")
    ).repartitionByRange(nparts, "score", "o_custkey").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("score", "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ptot = ranged.groupBy("pid").agg(F.sum("revenue").alias("ptot"))
    w_prev = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = ptot.select(
        "pid",
        F.coalesce(F.sum("ptot").over(w_prev), F.lit(0).cast("decimal(28,6)"))
        .alias("offset"),
        F.sum("ptot").over(w_all).alias("grand"),
    )
    cum = F.sum("revenue").over(w_local) + F.col("offset")
    share = cum.cast("double") / F.col("grand").cast("double")
    classed = ranged.join(F.broadcast(off), "pid").select(
        "revenue",
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C")
        .alias("abc_class"),
        F.col("grand"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("revenue").cast("double"), 4).alias("revenue"),
            F.round(
                (F.sum("revenue") / F.max("grand")).cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


ORACLE["abc_revenue_classes"] = """
    WITH rev AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS revenue
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY o_custkey
    ),
    cum AS (
        SELECT revenue,
               SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey ASC
                                  ROWS UNBOUNDED PRECEDING) AS c,
               SUM(revenue) OVER () AS grand
        FROM rev
    ),
    classed AS (
        SELECT revenue, grand,
               CASE WHEN CAST(c AS DOUBLE) / CAST(grand AS DOUBLE) <= 0.80
                    THEN 'A'
                    WHEN CAST(c AS DOUBLE) / CAST(grand AS DOUBLE) <= 0.95
                    THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM cum
    )
    SELECT abc_class, COUNT(*) AS n_customers,
           ROUND(CAST(SUM(revenue) AS DOUBLE), 4) AS revenue,
           ROUND(CAST(SUM(revenue) / MAX(grand) AS DOUBLE), 6)
               AS revenue_share
    FROM classed GROUP BY abc_class ORDER BY abc_class
"""

QUERIES["abc_revenue_classes"] = abc_revenue_classes


def ols_order_price_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Per-priority OLS trend of order value over time — the
    regression primitive behind "is average order value drifting?"
    dashboards: slope (currency units per day), intercept at the
    group's first order day, and R², all derived from exact integer
    moment sums.

    Determinism contract: both engines scale o_totalprice to integer
    milliunits via ROUND(v * 1000) (identical IEEE product + identical
    half-away-from-zero rounding), shift the day axis to the group's
    first order day (keeps x < ~10^4), and accumulate n/Σx/Σy/Σxy/
    Σx²/Σy² as DECIMAL integers whose declared widths keep every
    product ≤ 38 digits — exact for ≤1e8 orders per group over a
    ≤10-year span (documented domain; today's data is 4 orders of
    magnitude inside it).  Only the final slope/intercept/R² divisions
    run in double, on identical exact inputs.

    100 TB shape: one partial+final agg per group produces the six
    moments (map-side combine does almost all the work); the per-group
    min-day is a 5-row broadcast joined back before the agg.  No
    window, no sort, no per-row state."""
    orders = table(spark, sf, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    day0 = orders.groupBy("o_orderpriority").agg(
        F.min(F.to_date("o_orderdate")).alias("first_day")
    )
    j = orders.join(F.broadcast(day0), "o_orderpriority")
    x = (
        F.unix_date(F.to_date("o_orderdate")) - F.unix_date(F.col("first_day"))
    ).cast("decimal(4,0)")
    y = F.round(F.col("o_totalprice") * 1000).cast("decimal(10,0)")
    m = j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n"),
        F.min("first_day").alias("first_day"),
        F.sum(x).cast("decimal(12,0)").alias("sx"),
        F.sum(y).cast("decimal(17,0)").alias("sy"),
        F.sum(x * x).cast("decimal(16,0)").alias("sxx"),
        F.sum(x * y).cast("decimal(21,0)").alias("sxy"),
        F.sum(y * y).cast("decimal(26,0)").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    slope = num / F.nullif(den, F.lit(0.0)) / F.lit(1000.0)
    nd = F.col("n").cast("double")
    intercept = F.col("sy").cast("double") / F.lit(1000.0) / nd - slope * (
        F.col("sx").cast("double") / nd
    )
    r2 = num * num / F.nullif(den * deny, F.lit(0.0))
    return m.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n_orders"),
        "first_day",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(intercept, 4).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("o_orderpriority")


ORACLE["ols_order_price_trend"] = """
    WITH day0 AS (
        SELECT o_orderpriority,
               MIN(CAST(o_orderdate AS DATE)) AS first_day
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY o_orderpriority
    ),
    m AS (
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS HUGEINT) AS n,
               MIN(d.first_day) AS first_day,
               SUM(CAST(DATEDIFF('day', d.first_day,
                                 CAST(o.o_orderdate AS DATE))
                        AS HUGEINT)) AS sx,
               SUM(CAST(ROUND(o.o_totalprice * 1000) AS HUGEINT)) AS sy,
               SUM(CAST(DATEDIFF('day', d.first_day,
                                 CAST(o.o_orderdate AS DATE)) AS HUGEINT)
                   * CAST(DATEDIFF('day', d.first_day,
                                   CAST(o.o_orderdate AS DATE))
                          AS HUGEINT)) AS sxx,
               SUM(CAST(DATEDIFF('day', d.first_day,
                                 CAST(o.o_orderdate AS DATE)) AS HUGEINT)
                   * CAST(ROUND(o.o_totalprice * 1000) AS HUGEINT)) AS sxy,
               SUM(CAST(ROUND(o.o_totalprice * 1000) AS HUGEINT)
                   * CAST(ROUND(o.o_totalprice * 1000) AS HUGEINT)) AS syy
        FROM orders o JOIN day0 d USING (o_orderpriority)
        WHERE o.o_orderdate IS NOT NULL AND o.o_totalprice IS NOT NULL
        GROUP BY o.o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(n AS BIGINT) AS n_orders,
           first_day,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)
                 / 1000.0, 6) AS slope_per_day,
           ROUND(CAST(sy AS DOUBLE) / 1000.0 / CAST(n AS DOUBLE)
                 - (CAST(n * sxy - sx * sy AS DOUBLE)
                    / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)
                    / 1000.0)
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 4)
               AS intercept,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE), 0.0), 6)
               AS r2
    FROM m ORDER BY o_orderpriority
"""

QUERIES["ols_order_price_trend"] = ols_order_price_trend


def lineitem_corr_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's four numeric measures
    (quantity, extendedprice, discount, tax) — the profiling primitive
    behind feature-redundancy checks before a model ingests a fact
    table.  All six unordered pairs in one scan.

    Determinism contract: every measure scales to integer centiunits
    via ROUND(v * 100) (all four have ≤2 decimal digits), and the 14
    moment sums accumulate as DECIMAL integers sized so every later
    product stays ≤38 digits for ≤1e9 rows.  Pearson r is scale-
    invariant, so the ×100 cancels; the final r divides once in double
    (IEEE sqrt on identical exact inputs).

    100 TB shape: ONE partial+final global aggregate computes all 14
    sums map-side; the 6-row matrix explodes from that single row.
    Nothing shuffles but the 14-value partial rows."""
    li = table(spark, sf, "lineitem")
    cols = {
        "quantity": "l_quantity",
        "extendedprice": "l_extendedprice",
        "discount": "l_discount",
        "tax": "l_tax",
    }
    # null-filter the RAW columns with an explicit IsNotNull conjunction
    # so the predicates reach the parquet scan as PushedFilters —
    # na.drop compiles to AtLeastNNonNulls, which the parquet source
    # cannot translate, and filtering the casted aliases would strand
    # the predicates behind the projection entirely
    notnull = F.lit(True)
    for c in cols.values():
        notnull = notnull & F.col(c).isNotNull()
    # the 15 decimal moment aggregates and 6 result structs are emitted
    # as expr text — same trees, one parser call each instead of ~10
    # py4j Column builds (construction-tax remedy; A/B 2.42 → 1.85 s,
    # identical rows and schema)
    scaled = widen_small_scan(li.filter(notnull)).selectExpr(
        *[
            f"CAST(ROUND({c} * 100, 0) AS DECIMAL(10,0)) AS {k}"
            for k, c in cols.items()
        ]
    )
    names = list(cols)
    aggs = [F.expr("CAST(count(1) AS DECIMAL(10,0)) AS n")]
    for k in names:
        aggs.append(F.expr(f"CAST(sum({k}) AS DECIMAL(17,0)) AS s_{k}"))
        aggs.append(
            F.expr(f"CAST(sum({k} * {k}) AS DECIMAL(24,0)) AS ss_{k}")
        )
    pairs = [
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(
            F.expr(f"CAST(sum({a} * {b}) AS DECIMAL(24,0)) AS sp_{a}_{b}")
        )
    m = scaled.agg(*aggs)

    def _r(a: str, b: str) -> str:
        num = f"CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
        dena = f"CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE)"
        denb = f"CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)"
        return f"ROUND({num} / nullif(sqrt({dena} * {denb}), 0.0D), 6)"

    rows = "array(" + ", ".join(
        f"struct('{a}' AS metric_a, '{b}' AS metric_b,"
        f" {_r(a, b)} AS pearson_r)"
        for a, b in pairs
    ) + ")"
    return (
        m.selectExpr("CAST(n AS BIGINT) AS n_rows", f"explode({rows}) AS p")
        .select("p.metric_a", "p.metric_b", "n_rows", "p.pearson_r")
        .orderBy("metric_a", "metric_b")
    )


def _corr_oracle() -> str:
    names = ["quantity", "extendedprice", "discount", "tax"]
    cols = {
        "quantity": "l_quantity",
        "extendedprice": "l_extendedprice",
        "discount": "l_discount",
        "tax": "l_tax",
    }
    sums = ["CAST(COUNT(*) AS HUGEINT) AS n"]
    for k in names:
        sums.append(
            f"SUM(CAST(ROUND({cols[k]} * 100) AS HUGEINT)) AS s_{k}"
        )
        sums.append(
            f"SUM(CAST(ROUND({cols[k]} * 100) AS HUGEINT)"
            f" * CAST(ROUND({cols[k]} * 100) AS HUGEINT)) AS ss_{k}"
        )
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
    for a, b in pairs:
        sums.append(
            f"SUM(CAST(ROUND({cols[a]} * 100) AS HUGEINT)"
            f" * CAST(ROUND({cols[b]} * 100) AS HUGEINT)) AS sp_{a}_{b}"
        )
    branches = []
    for a, b in pairs:
        branches.append(
            f"SELECT '{a}' AS metric_a, '{b}' AS metric_b,"
            f" CAST(n AS BIGINT) AS n_rows,"
            f" ROUND(CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
            f" / NULLIF(SQRT(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE)"
            f" * CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)), 0.0), 6)"
            f" AS pearson_r FROM m"
        )
    union = " UNION ALL ".join(branches)
    where = " AND ".join(f"{c} IS NOT NULL" for c in cols.values())
    return (
        f"WITH m AS (SELECT {', '.join(sums)} FROM lineitem"
        f" WHERE {where}) {union} ORDER BY metric_a, metric_b"
    )


ORACLE["lineitem_corr_matrix"] = _corr_oracle()

QUERIES["lineitem_corr_matrix"] = lineitem_corr_matrix


def basket_brand_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-occurrence of part brands within an order —
    the Apriori-style association primitive (support / lift) behind
    "customers who bought X also bought Y".  Top 25 brand pairs by
    co-order count, ties broken lexically.

    Determinism contract: support and lift derive from four exact
    integer counts (co-orders, per-brand orders, total orders); the
    single double division happens after all integer math, so both
    engines divide identical exact operands.

    100 TB shape: part is a broadcast dim; the order→brand distinct
    reduces lineitem BEFORE the self-join; the pair join keys on
    l_orderkey (high cardinality, co-partitioned on one shuffle — the
    distinct already hashed on (orderkey, brand), and AQE reuses that
    exchange); brand-level tables are ≤25 rows and broadcast.  Pair
    cardinality is bounded by brands²/2, not data size."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    totals = base.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    brand_n = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_brand")
    )
    a = base.select(
        F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_a")
    )
    b = base.select(
        F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_b")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = brand_n.select(
        F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("n_a")
    )
    nb = brand_n.select(
        F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / F.col("n_orders").cast("double"),
                6,
            ).alias("support"),
            # Cast each count to double BEFORE multiplying: at ~100 TB
            # (~1.5e11 orders, 25 brands so n_a ~ n_orders) the bigint
            # products n_both*n_orders and n_a*n_b exceed int64; double
            # products stay exact below 2^53 and degrade gracefully above.
            F.round(
                (
                    F.col("n_both").cast("double")
                    * F.col("n_orders").cast("double")
                )
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                ),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.desc("n_both"), "brand_a", "brand_b"
    ).limit(25)


ORACLE["basket_brand_pairs"] = """
    WITH base AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    totals AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM base),
    brand_n AS (
        SELECT p_brand, COUNT(*) AS n_brand FROM base GROUP BY p_brand
    ),
    pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS n_both
        FROM base a JOIN base b ON a.l_orderkey = b.l_orderkey
        WHERE a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand
    )
    SELECT brand_a, brand_b, n_both,
           ROUND(CAST(n_both AS DOUBLE) / CAST(t.n_orders AS DOUBLE), 6)
               AS support,
           ROUND((CAST(n_both AS DOUBLE) * CAST(t.n_orders AS DOUBLE))
                 / (CAST(na.n_brand AS DOUBLE) * CAST(nb.n_brand AS DOUBLE)),
                 6) AS lift
    FROM pairs
    JOIN brand_n na ON na.p_brand = brand_a
    JOIN brand_n nb ON nb.p_brand = brand_b
    CROSS JOIN totals t
    ORDER BY n_both DESC, brand_a, brand_b
    LIMIT 25
"""

QUERIES["basket_brand_pairs"] = basket_brand_pairs
