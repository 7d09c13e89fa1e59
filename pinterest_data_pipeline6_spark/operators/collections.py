"""Collection-type operator family: higher-order array functions, map
construction/lookup, positional explode, array set algebra, unpivot,
date-sequence densification, and safe-arithmetic scalars.

The reference touches arrays only once (``array(latitude, longitude)``
— BATCH:83, SURVEY.md §2.8 F8) and has no map/unpivot/sequence usage at
all; this module is part of the beyond-reference completeness surface a
training-data pipeline needs once documents carry token arrays,
metadata maps, and per-position features.

Scale posture, per operator:

- **Higher-order functions** (``transform``/``filter``/``aggregate``/
  ``zip_with``) evaluate per element INSIDE the row — no explode, no
  shuffle, no row-count amplification. The per-element lambda is
  interpreted (not codegen'd), so the hot path keeps lambdas tiny
  (length/compare/add) and anything heavier goes through explode +
  codegen projection instead (see dedup.py's post-explode hashing).
- **posexplode** amplifies rows by array length BEFORE its group-by
  shuffle; the projection list is pruned to (lang, pos, tok) first so
  the exchange carries three narrow columns, never the document text.
- **map_from_entries** builds each user's map inside a hash aggregate
  (one shuffle on user_id); lookups/cardinality are then per-row
  expressions. Map columns never cross an exchange here.
- **unpivot** is an Expand node: k measure columns → k rows per input
  row, map-side, then a 4-group hash agg — same shape Catalyst uses
  for cube/rollup.
- **sequence + explode** densifies each group's [min, max] day range;
  the left-anti join that finds gap days broadcasts the per-day
  distinct (bounded by calendar days, tiny at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline6_spark.sources.readers import table

def _toks():
    """Token array of ``text`` (built lazily — Column exprs need a live session)."""
    return F.split(F.col("text"), " ")


def hof_token_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """filter → transform → aggregate entirely inside the array cell:
    per lang, how many "long" tokens (>3 chars) documents carry and
    their total length. No explode — row count never amplifies."""
    docs = table(spark, sf, "documents")
    longs = F.filter(_toks(), lambda x: F.length(x) > 3)
    sum_len = F.aggregate(
        F.transform(longs, lambda x: F.length(x)), F.lit(0), lambda a, b: a + b
    )
    return (
        docs.select(
            "lang",
            F.size(longs).alias("n_long"),
            sum_len.alias("sum_len"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_long").alias("n_long_tokens"),
            F.sum("sum_len").alias("sum_long_len"),
        )
        .orderBy("lang")
    )


def hof_exists_forall(spark: SparkSession, sf: str) -> DataFrame:
    """The two array PREDICATE higher-order functions (exists/forall)
    completing the HOF surface next to transform/filter/aggregate/
    zip_with: per lang, docs containing at least one long token
    (exists) and docs made only of short tokens (forall). Short-circuit
    evaluation inside the cell — no explode, no row amplification."""
    docs = table(spark, sf, "documents")
    has_long = F.exists(_toks(), lambda x: F.length(x) > 8)
    all_short = F.forall(_toks(), lambda x: F.length(x) <= 5)
    return (
        docs.select("lang", has_long.alias("hl"), all_short.alias("als"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("hl"), 1).otherwise(0)).alias("n_with_long_token"),
            F.sum(F.when(F.col("als"), 1).otherwise(0)).alias("n_all_short"),
        )
        .orderBy("lang")
    )


def hof_position_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """zip_with over (1-based position sequence, token lengths): a
    position-weighted length sum per document, rolled up per source —
    the access pattern of positional feature extraction (e.g. position
    embeddings) without leaving the array cell."""
    docs = table(spark, sf, "documents")
    weighted = F.zip_with(
        F.sequence(F.lit(1), F.size(_toks())),
        _toks(),
        lambda i, x: i * F.length(x),
    )
    total = F.aggregate(weighted, F.lit(0), lambda a, b: a + b)
    return (
        docs.select("source", total.alias("w"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("w").alias("sum_weighted_len"),
        )
        .orderBy("source")
    )


def posexplode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Positional explode (ordinality-preserving flatten): token counts
    and distinct-token counts per (lang, position-bucket). The pre-
    explode projection drops ``text`` so the shuffle after the explode
    carries (lang, pos%3, tok) only."""
    docs = table(spark, sf, "documents")
    return (
        docs.select("lang", F.posexplode(_toks()).alias("pos", "tok"))
        .select("lang", (F.col("pos") % 3).alias("pos_bucket"), "tok")
        .groupBy("lang", "pos_bucket")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_distinct("tok").alias("n_distinct"),
        )
        .orderBy("lang", "pos_bucket")
    )


def map_event_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user event-type map: counts per type are aggregated into a
    MapType cell (map_from_entries over collect_list), then queried
    with element_at / map_keys / cardinality. The map never crosses an
    exchange — it is built after the (user_id, event_type) count and
    consumed in the same stage's projection."""
    ev = table(spark, sf, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("event_type"), F.col("n")))
    )
    return (
        per_type.groupBy("user_id")
        .agg(m.alias("m"))
        .select(
            "user_id",
            F.cardinality("m").alias("n_types"),
            F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias("n_click"),
            F.coalesce(F.element_at("m", F.lit("purchase")), F.lit(0)).alias("n_purchase"),
            F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("types_csv"),
        )
        .orderBy("user_id")
    )


def array_setops_neighbor_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Array set algebra (intersect/union/except) between consecutive
    documents' distinct-token sets — the cell-level primitive under
    shingle overlap scoring. The pairing key (doc_id+1) makes the join
    a narrow equi-join, linear in the corpus (never pairwise)."""
    docs = table(spark, sf, "documents")
    d = docs.select("doc_id", F.array_distinct(_toks()).alias("toks"))
    a = d.alias("a")
    b = d.select((F.col("doc_id") - 1).alias("prev_id"), F.col("toks").alias("btoks"))
    return (
        a.join(b, F.col("a.doc_id") == F.col("prev_id"))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.size(F.array_intersect("a.toks", "btoks")).alias("n_common"),
            F.size(F.array_union("a.toks", "btoks")).alias("n_union"),
            F.size(F.array_except("a.toks", "btoks")).alias("n_only_a"),
        )
        .orderBy("doc_id")
    )


_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def unpivot_measures(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (melt) the four lineitem measures into (measure, val)
    rows and aggregate each: wide→long via one map-side Expand, then a
    4-group hash agg. Sums route through DECIMAL so both engines hash
    the same value regardless of summation order."""
    li = table(spark, sf, "lineitem")
    long = li.unpivot(
        ids=[],
        values=list(_MEASURES),
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("val").cast("decimal(18,6)")).cast("double"), 4).alias(
                "sum_val"
            ),
        )
        .orderBy("measure")
    )


def sequence_day_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar densification: per order priority, generate every day in
    [min(o_orderdate), max(o_orderdate)] with sequence()+explode and
    count the days with no orders (gap days). The generated calendar is
    bounded by days-in-range (tiny at any data scale), so the anti
    lookup broadcasts."""
    orders = table(spark, sf, "orders")
    od = orders.select(
        F.col("o_orderpriority").alias("priority"), F.to_date("o_orderdate").alias("d")
    )
    bounds = od.groupBy("priority").agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    cal = bounds.select(
        "priority",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))).alias("d"),
    )
    # left join + conditional count, NOT anti-join + regroup: a group
    # with zero gaps must still emit (priority, n_days, 0) — the
    # anti-join formulation silently drops it (caught by running the
    # oracle differential at sf0.1, where the calendar is gap-free)
    actual = od.distinct().withColumn("hit", F.lit(1))
    return (
        cal.join(actual, ["priority", "d"], "left")
        .groupBy("priority")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.col("hit").isNull().cast("int")).alias("n_gap_days"),
        )
        .orderBy("priority")
    )


def safe_arith_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe scalar family over a quantity histogram: width_bucket
    drives the bucketing, try_divide turns division-by-zero into NULL
    (counted, not thrown), greatest/least clamp the tax into a band
    before the decimal sum. All codegen'd scalar expressions — the only
    shuffle is the final 2-key hash agg."""
    li = table(spark, sf, "lineitem")
    wb = F.width_bucket(F.col("l_quantity"), F.lit(0.0), F.lit(50.0), F.lit(5))
    div_null = F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).isNull()
    clamped = F.least(F.greatest(F.col("l_tax"), F.lit(0.02)), F.lit(0.06))
    return (
        li.select(
            F.col("l_returnflag").alias("flag"),
            wb.cast("int").alias("qty_bucket"),
            div_null.cast("int").alias("is_div_null"),
            clamped.cast("decimal(18,6)").alias("clamped_tax"),
        )
        .groupBy("flag", "qty_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("is_div_null").alias("n_null_div"),
            F.round(F.sum("clamped_tax").cast("double"), 4).alias("sum_clamped_tax"),
        )
        .orderBy("flag", "qty_bucket")
    )


def regexp_bitagg_orders(spark: SparkSession, sf: str) -> DataFrame:
    """regexp_extract_all + bitwise aggregates: the numeric prefix of
    the priority label ('1-URGENT' → 1) keys bit_and/bit_or/bit_xor
    folds of the order keys — commutative single-pass aggregates that
    need no sort and combine map-side."""
    orders = table(spark, sf, "orders")
    pn = F.regexp_extract_all(F.col("o_orderpriority"), F.lit("[0-9]+"), 0).getItem(0)
    return (
        orders.select(pn.cast("int").alias("priority_num"), "o_orderkey")
        .groupBy("priority_num")
        .agg(
            F.count("*").alias("n"),
            F.bit_and("o_orderkey").alias("key_and"),
            F.bit_or("o_orderkey").alias("key_or"),
            F.bit_xor("o_orderkey").alias("key_xor"),
        )
        .orderBy("priority_num")
    )


def map_explode_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Map explode (the inverse of map_from_entries): per-user type→
    count maps are exploded back to (key, value) rows and re-aggregated
    globally — proving the map cell round-trips losslessly. The explode
    emits exactly cardinality(m) rows per user; the final agg is a
    5-group hash agg. Null event types are dropped BEFORE the map build
    (a map key cannot be null — on a null-bearing corpus the unfiltered
    form throws NULL_MAP_KEY; the oracle carries the same filter)."""
    ev = table(spark, sf, "events")
    per_type = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m")
    )
    return (
        maps.select("user_id", F.explode("m").alias("event_type", "n"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n").alias("n_events"),
        )
        .orderBy("event_type")
    )


def morton_bucket_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Morton (Z-order) bucketing of (l_partkey, l_suppkey): row counts
    per high-order Morton bucket. The code itself is the layout key
    ``functions/partitioning.zorder_by`` sorts files by — this query
    pins its arithmetic against the identical SQL in DuckDB. High bits
    of the interleave = the coarse Z-curve cell, the unit of
    multi-dimensional data skipping."""
    from pinterest_data_pipeline6_spark.functions.partitioning import morton_code

    li = table(spark, sf, "lineitem")
    code = morton_code(F.pmod("l_partkey", F.lit(1 << 16)), F.pmod("l_suppkey", F.lit(1 << 16)))
    return (
        li.select(F.shiftright(code, 24).alias("z_bucket"))
        .groupBy("z_bucket")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("z_bucket")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins. Dialect notes embedded where the engines diverge:
# DuckDB lambdas index 1-based (Spark transform's index param is 0-based),
# list_reduce has no init (list_sum + coalesce instead), width_bucket does
# not exist (expanded to its CASE definition), and array set ops are
# replaced by size identities on distinct inputs.
# ---------------------------------------------------------------------------


LONG_TOKEN = 7  # longest corpus tokens are 8 chars: >7 exercises BOTH branches


def explode_outer_rare_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """NULL-preserving explode (`explode_outer`): flatten each
    document's rare (>LONG_TOKEN chars) tokens, keeping docs with NO
    rare token as a single NULL row — the left-join-lateral semantics
    a flatten must have when downstream counts still need every parent
    row. Per language: exploded row count, how many of those are the
    NULL placeholders, and the distinct rare-token count.

    The filter + explode are row-local (one scan, no shuffle before the
    per-language agg); the oracle computes the same numbers in closed
    form (rows per doc = max(len, 1)) — no lateral join needed to
    CHECK the semantics, which is itself the point: explode_outer adds
    exactly one row for an empty array."""
    docs = table(spark, sf, "documents")
    rare = F.filter(
        F.split(F.col("text"), " "), lambda t: F.length(t) > LONG_TOKEN
    )
    return (
        docs.select("lang", F.explode_outer(rare).alias("tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("tok").isNull().cast("bigint")).alias("n_null_rows"),
            F.count_distinct(F.col("tok")).alias("n_rare_tokens"),
        )
        .orderBy("lang")
    )


ORACLE: dict[str, str] = {
    "hof_token_metrics": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                   x -> length(x) > 3))) AS BIGINT) AS n_long_tokens,
               CAST(SUM(COALESCE(list_sum(list_transform(
                   list_filter(string_split(text, ' '), x -> length(x) > 3),
                   x -> length(x))), 0)) AS BIGINT) AS sum_long_len
        FROM documents GROUP BY lang
    """,
    "hof_exists_forall": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '),
                                  x -> length(x) > 8)) > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_with_long_token,
               CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '),
                                  x -> length(x) > 5)) = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_all_short
        FROM documents GROUP BY lang
    """,
    "hof_position_weighted": """
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(COALESCE(list_sum(list_transform(
                   generate_series(1, len(string_split(text, ' '))),
                   i -> i * length(string_split(text, ' ')[i]))), 0)) AS BIGINT)
                   AS sum_weighted_len
        FROM documents GROUP BY source
    """,
    "posexplode_tokens": """
        SELECT lang, pos % 3 AS pos_bucket, COUNT(*) AS n_tokens,
               COUNT(DISTINCT tok) AS n_distinct
        FROM (
            SELECT lang, unnest(list_transform(
                       generate_series(1, len(string_split(text, ' '))),
                       i -> {'pos': i - 1, 'tok': string_split(text, ' ')[i]}),
                   recursive := true)
            FROM documents
        )
        GROUP BY lang, pos % 3
    """,
    "map_event_counts": """
        WITH per_type AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        maps AS (
            SELECT user_id, map_from_entries(list({'k': event_type, 'v': n})) AS m
            FROM per_type GROUP BY user_id
        )
        SELECT user_id,
               CAST(cardinality(m) AS INT) AS n_types,
               COALESCE(m['click'][1], 0) AS n_click,
               COALESCE(m['purchase'][1], 0) AS n_purchase,
               array_to_string(list_sort(map_keys(m)), ',') AS types_csv
        FROM maps
    """,
    # set-op sizes on distinct inputs: |A∩B| from list_intersect,
    # |A∪B| = |A|+|B|-|A∩B|, |A\\B| = |A|-|A∩B|
    "array_setops_neighbor_docs": """
        WITH d AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
            FROM documents
        )
        SELECT a.doc_id AS doc_id,
               len(list_intersect(a.toks, b.toks)) AS n_common,
               len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS n_union,
               len(a.toks) - len(list_intersect(a.toks, b.toks)) AS n_only_a
        FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
    """,
    "unpivot_measures": """
        SELECT measure, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_val
        FROM (
            SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem
        ) UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
        GROUP BY measure
    """,
    "sequence_day_gaps": """
        WITH od AS (
            SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d
            FROM orders
        ),
        bounds AS (
            SELECT priority, MIN(d) AS mn, MAX(d) AS mx FROM od GROUP BY priority
        ),
        cal AS (
            SELECT priority, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
            FROM bounds
        ),
        actual AS (SELECT DISTINCT priority, d FROM od)
        SELECT c.priority,
               COUNT(*) AS n_days,
               CAST(SUM(CASE WHEN a.d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_days
        FROM cal c LEFT JOIN actual a ON c.priority = a.priority AND c.d = a.d
        GROUP BY c.priority
    """,
    # width_bucket(v, 0, 50, 5) expanded to its definition; try_divide's
    # NULL-on-zero-divisor becomes an explicit divisor=0 test
    "safe_arith_buckets": """
        SELECT l_returnflag AS flag,
               CASE WHEN l_quantity < 0 THEN 0
                    WHEN l_quantity >= 50 THEN 6
                    ELSE CAST(FLOOR(l_quantity / 10) AS INT) + 1 END AS qty_bucket,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_div,
               ROUND(CAST(SUM(CAST(LEAST(GREATEST(l_tax, 0.02), 0.06) AS DECIMAL(18,6))) AS DOUBLE), 4)
                   AS sum_clamped_tax
        FROM lineitem
        GROUP BY 1, 2
    """,
    # DuckDB map explode: unnest over map_entries (struct list)
    "map_explode_roundtrip": """
        WITH per_type AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events WHERE event_type IS NOT NULL
            GROUP BY user_id, event_type
        ),
        maps AS (
            SELECT user_id, map_from_entries(list({'k': event_type, 'v': n})) AS m
            FROM per_type GROUP BY user_id
        ),
        exploded AS (
            SELECT user_id, unnest(map_entries(m), recursive := true) FROM maps
        )
        SELECT key AS event_type, COUNT(*) AS n_users,
               CAST(SUM(value) AS BIGINT) AS n_events
        FROM exploded
        GROUP BY key
    """,
    "morton_bucket_counts": "",  # assembled below (generated arithmetic)
    "regexp_bitagg_orders": """
        SELECT CAST(regexp_extract_all(o_orderpriority, '[0-9]+')[1] AS INT) AS priority_num,
               COUNT(*) AS n,
               bit_and(o_orderkey) AS key_and,
               bit_or(o_orderkey) AS key_or,
               bit_xor(o_orderkey) AS key_xor
        FROM orders
        GROUP BY 1
    """,
}

def _morton_oracle() -> str:
    from pinterest_data_pipeline6_spark.functions.partitioning import morton_sql

    code = morton_sql("(l_partkey % 65536)", "(l_suppkey % 65536)")
    return f"""
        SELECT (({code}) >> 24) AS z_bucket, COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY 1
    """


ORACLE["morton_bucket_counts"] = _morton_oracle()

ORACLE["explode_outer_rare_tokens"] = f"""
    WITH per_doc AS (
        SELECT lang,
               list_filter(string_split(text, ' '), x -> length(x) > {LONG_TOKEN})
                   AS rare
        FROM documents
    )
    SELECT lang,
           CAST(SUM(greatest(len(rare), 1)) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN len(rare) = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_rows,
           (SELECT COUNT(DISTINCT t)
            FROM per_doc p2, unnest(p2.rare) AS u(t)
            WHERE p2.lang = per_doc.lang) AS n_rare_tokens
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
"""

QUERIES = {
    "explode_outer_rare_tokens": explode_outer_rare_tokens,
    "hof_token_metrics": hof_token_metrics,
    "hof_exists_forall": hof_exists_forall,
    "hof_position_weighted": hof_position_weighted,
    "posexplode_tokens": posexplode_tokens,
    "map_event_counts": map_event_counts,
    "array_setops_neighbor_docs": array_setops_neighbor_docs,
    "unpivot_measures": unpivot_measures,
    "sequence_day_gaps": sequence_day_gaps,
    "safe_arith_buckets": safe_arith_buckets,
    "regexp_bitagg_orders": regexp_bitagg_orders,
    "morton_bucket_counts": morton_bucket_counts,
    "map_explode_roundtrip": map_explode_roundtrip,
}


HEAVY_TYPE_MIN = 3  # per-user count above which an event type is "heavy"


def map_hof_family(spark: SparkSession, sf: str) -> DataFrame:
    """Map higher-order-function surface: per user, the event-type
    count map is reshaped with ``transform_values`` (counts -> global
    shares), pruned with ``map_filter`` (heavy types only), and
    reduced with ``aggregate`` over ``map_values`` — the map-cell
    toolkit ``map_event_counts`` doesn't cover.  The DuckDB oracle
    derives the identical numbers relationally from the
    (user, type, n) counts — map HOFs are Spark plan surface, not
    semantics, so the twin pins the RESULTS.

    100 TB shape: the map is built and consumed inside one
    post-aggregation projection — it never crosses an exchange."""
    ev = table(spark, sf, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("event_type"), F.col("n")))
    )
    # total materializes as a COLUMN before any lambda consumes it: an
    # aggregate() fold embedded in the transform_values body would
    # re-evaluate once per map ENTRY (the HOF-recompute pathology the
    # registry sweep guards); the multi-referenced attribute survives
    # CollapseProject, so the body only ever sees total#N.
    built = per_type.groupBy("user_id").agg(m.alias("m")).withColumn(
        "total",
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ),
    )
    heavy = F.map_filter("m", lambda k, v: v >= HEAVY_TYPE_MIN)
    shares = F.transform_values(
        "m", lambda k, v: F.round(v / F.col("total").cast("double"), 6)
    )
    return built.select(
        "user_id",
        F.col("total").alias("n_events"),
        F.cardinality(heavy).cast("int").alias("n_heavy_types"),
        F.concat_ws(",", F.array_sort(F.map_keys(heavy))).alias(
            "heavy_types_csv"
        ),
        F.round(
            F.aggregate(
                F.map_values(shares),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ),
            6,
        ).alias("max_share"),
    ).orderBy("user_id")


ORACLE["map_hof_family"] = f"""
    WITH per_type AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT user_id, SUM(n) AS n_events FROM per_type GROUP BY user_id
    )
    SELECT t.user_id,
           CAST(t.n_events AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN p.n >= {HEAVY_TYPE_MIN} THEN 1 END)
                AS INT) AS n_heavy_types,
           COALESCE(string_agg(CASE WHEN p.n >= {HEAVY_TYPE_MIN}
                               THEN p.event_type END, ','
                               ORDER BY p.event_type), '')
               AS heavy_types_csv,
           ROUND(MAX(ROUND(p.n / CAST(t.n_events AS DOUBLE), 6)), 6)
               AS max_share
    FROM tot t JOIN per_type p USING (user_id)
    GROUP BY t.user_id, t.n_events
    ORDER BY t.user_id
"""

QUERIES["map_hof_family"] = map_hof_family
