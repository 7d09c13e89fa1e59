"""Subquery operator family: correlated EXISTS / NOT EXISTS, IN /
NOT IN, uncorrelated scalar subqueries, correlated LATERAL (top-k per
group), explicit GROUPING SETS, and ordered-set aggregates
(listagg / mode / median / percentile_disc).

The reference's SQL surface is CTEs + joins + group-bys (SURVEY.md
§2.12); it contains no subquery of any kind. These operators complete
the relational surface a SQL user expects of the engine.

Where both dialects accept the identical text, ONE SQL string is the
implementation AND the oracle (``_PORTABLE``): the engine runs it via
``spark.sql`` over the registered testdata views, the harness runs the
same text on DuckDB — a textual sqllogictest. Catalyst plans each
construct idiomatically at scale:

- **EXISTS / IN** → left-semi hash joins; **NOT EXISTS / NOT IN** →
  left-anti (no NULL hazard: keys are non-null in testdata; NOT IN over
  a nullable key would need the null-aware anti-join Catalyst also
  provides).
- **scalar subquery** → computed once (a one-row exchange), broadcast
  into the filter/projection — not re-evaluated per row.
- **LATERAL (ORDER BY ... LIMIT k)** → decorrelated into a
  row_number window over the join of the outer keys, never a per-row
  re-execution.
- **GROUPING SETS** → one Expand + single partial+final hash agg (one
  scan for all four granularities).
- decimal-routed sums keep value hashes engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pinterest_data_pipeline6_spark.sources.readers import load_testdata_tables

# ---------------------------------------------------------------------------
# Portable queries: the SAME text is the Spark implementation and the
# DuckDB oracle.
# ---------------------------------------------------------------------------

_PORTABLE: dict[str, str] = {
    # EXISTS and NOT EXISTS branches over the same correlated predicate,
    # tagged and unioned: per segment, customers with / without a
    # >250k order. Catalyst: two semi/anti hash joins on c_custkey.
    "exists_segment_activity": """
        SELECT 'with_big_order' AS grp, c_mktsegment AS segment, COUNT(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'without_big_order' AS grp, c_mktsegment AS segment, COUNT(*) AS n_customers
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
        GROUP BY c_mktsegment
    """,
    # IN / NOT IN over a non-null key (semi/anti join after subquery
    # de-dup; the heavy-part key set is far smaller than lineitem)
    "in_subquery_parts": """
        SELECT 'heavy' AS grp, p_brand AS brand, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
        GROUP BY p_brand
        UNION ALL
        SELECT 'never_heavy' AS grp, p_brand AS brand, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
        GROUP BY p_brand
    """,
    # uncorrelated scalar subquery used in WHERE and SELECT: computed
    # once, broadcast. ROUND pins the threshold so both engines compare
    # against the identical literal.
    "scalar_subquery_price": """
        SELECT o_orderpriority AS priority,
               COUNT(*) AS n_above,
               ROUND(CAST(SUM(CAST(o_totalprice -
                     (SELECT ROUND(AVG(o_totalprice), 2) FROM orders)
                     AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_excess
        FROM orders
        WHERE o_totalprice > (SELECT ROUND(AVG(o_totalprice), 2) FROM orders)
        GROUP BY o_orderpriority
    """,
    # correlated LATERAL with ORDER BY ... LIMIT 2: top-2 order prices
    # per customer, rolled up per segment. Catalyst decorrelates to a
    # rank-2 window — one shuffle on o_custkey, no per-row subquery.
    "lateral_top2_orders": """
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_top_orders,
               ROUND(CAST(SUM(CAST(t.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
                   AS sum_top_prices
        FROM customer c,
             LATERAL (SELECT o.o_totalprice
                      FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o.o_totalprice DESC, o.o_orderkey
                      LIMIT 2) t
        GROUP BY c.c_mktsegment
    """,
    # inline VALUES relation joined as a broadcast lookup — the idiom
    # for small literal dimension tables (weights, code mappings)
    # shipped inside the query text instead of a side file
    "values_inline_join": """
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice * w.weight AS DECIMAL(18,6))) AS DOUBLE), 2)
                   AS weighted_price
        FROM orders o
        JOIN (VALUES ('1-URGENT', 1.0), ('2-HIGH', 0.8), ('3-MEDIUM', 0.5),
                     ('4-NOT SPECIFIED', 0.3), ('5-LOW', 0.1))
             AS w(priority, weight)
          ON o.o_orderpriority = w.priority
        GROUP BY o_orderstatus
    """,
    # recursive CTE (Spark 4 native): walk same-lang doc_id runs to
    # their full depth — linear recursion whose depth is the longest
    # run, each step one equi-join of the frontier against the base
    # relation. The declarative twin of the iterative label-propagation
    # loop in dedup.dedup_clusters.
    "recursive_lang_runs": """
        WITH RECURSIVE starts AS (
            SELECT d.doc_id, d.lang
            FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1
            WHERE p.doc_id IS NULL OR p.lang <> d.lang
        ),
        walk(start_id, cur_id, lang, depth) AS (
            -- explicit aliases: "doc_id, doc_id" would give the anchor
            -- two attributes with ONE exprId, and Spark's recursion
            -- materialization (LogicalRDD) warns on every execution
            -- about the duplicate output (bench-tail noise)
            SELECT doc_id AS start_id, doc_id AS cur_id, lang, 1 AS depth FROM starts
            UNION ALL
            SELECT w.start_id, n.doc_id, w.lang, w.depth + 1
            FROM walk w JOIN documents n
              ON n.doc_id = w.cur_id + 1 AND n.lang = w.lang
        )
        SELECT lang, MAX(depth) AS max_run,
               COUNT(DISTINCT start_id) AS n_runs,
               CAST(COUNT(*) AS BIGINT) AS n_steps
        FROM walk GROUP BY lang
    """,
    # explicit GROUPING SETS (finer control than the rollup/cube
    # operators in relational.py): all four granularities in one Expand
    # + hash agg pass, gid from the portable GROUPING() pair
    "grouping_sets_revenue": """
        SELECT o_orderpriority AS priority, o_orderstatus AS status,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT) AS gid,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
    """,
}


def _portable(name: str):
    def run(spark: SparkSession, sf: str) -> DataFrame:
        load_testdata_tables(spark, sf)
        return spark.sql(_PORTABLE[name])

    return run


# ---------------------------------------------------------------------------
# Dialect-split queries (function names differ between engines)
# ---------------------------------------------------------------------------

# Spark: listagg ... WITHIN GROUP (ANSI); DuckDB: string_agg ... ORDER BY.
# Statuses are pre-deduped per priority so the ordered concatenation is
# deterministic on both engines.
_LISTAGG_SPARK = """
    SELECT priority, listagg(status, ',') WITHIN GROUP (ORDER BY status) AS statuses
    FROM (SELECT DISTINCT o_orderpriority AS priority, o_orderstatus AS status
          FROM orders)
    GROUP BY priority
"""

_LISTAGG_DUCK = """
    SELECT priority, string_agg(status, ',' ORDER BY status) AS statuses
    FROM (SELECT DISTINCT o_orderpriority AS priority, o_orderstatus AS status
          FROM orders)
    GROUP BY priority
"""


def listagg_statuses(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (listagg/string_agg): the one agg
    whose result depends on input order, pinned by WITHIN GROUP."""
    load_testdata_tables(spark, sf)
    return spark.sql(_LISTAGG_SPARK)


# mode() buckets are floor(price/500000): bucket 0 dominates by >10x,
# so tie-breaking (engine-defined) never decides the result. median of
# an even count is the midpoint average in both engines; percentile_disc
# picks an actual value — both deterministic on identical inputs.
_ORDERED_SET_SPARK = """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           mode(CAST(FLOOR(o_totalprice / 500000) AS INT)) AS mode_bucket,
           ROUND(CAST(median(o_totalprice) AS DOUBLE), 4) AS median_price,
           ROUND(CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 4)
               AS p25_price,
           ROUND(CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 4)
               AS p90_price
    FROM orders
    GROUP BY o_orderpriority
"""


def ordered_set_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-set / positional aggregates: mode, exact median,
    percentile_disc — the exact-quantile complements of the
    percentile_approx sketch family (relational.py)."""
    load_testdata_tables(spark, sf)
    return spark.sql(_ORDERED_SET_SPARK)


ORACLE: dict[str, str] = {
    **_PORTABLE,
    "listagg_statuses": _LISTAGG_DUCK,
    "ordered_set_stats": _ORDERED_SET_SPARK,  # identical text runs on DuckDB
}

QUERIES = {
    **{name: _portable(name) for name in _PORTABLE},
    "listagg_statuses": listagg_statuses,
    "ordered_set_stats": ordered_set_stats,
}
