"""Batch sources and table registry.

Scans are declared with explicit schemas (no inference pass — the
reference's ``inferSchema`` costs an extra full scan of the data,
SURVEY.md §4 last row) so predicate pushdown and column pruning reach
the parquet reader from the first job.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from pinterest_data_pipeline6_spark.functions.cleaning import clean_geo, clean_pin, clean_user
from pinterest_data_pipeline6_spark.schemas import RAW_GEO_SCHEMA, RAW_PIN_SCHEMA, RAW_USER_SCHEMA

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

RAW_SCHEMAS: dict[str, StructType] = {
    "pin": RAW_PIN_SCHEMA,
    "geo": RAW_GEO_SCHEMA,
    "user": RAW_USER_SCHEMA,
}


def read_raw_json(
    spark: SparkSession, entity: str, path: str, infer: bool = False
) -> DataFrame:
    """JSON directory scan (reference semantics: one JSON object per
    record — BATCH:40-48). Schema-first by default so the first job can
    push down and prune; ``infer=True`` is the SURVEY §1.3 optional
    inference path (the reference's behavior) for exploring payloads
    whose shape isn't declared yet — it costs one extra full scan and
    types every ambiguous field by sampling, so it never belongs in a
    recurring pipeline, only in a notebook."""
    if infer:
        return spark.read.option("inferSchema", "true").json(path)
    return spark.read.schema(RAW_SCHEMAS[entity]).json(path)


def read_raw_parquet(spark: SparkSession, entity: str, path: str) -> DataFrame:
    """Parquet scan for a raw entity table. The schema is asserted (not
    inferred) so drift fails fast instead of silently changing types."""
    df = spark.read.parquet(path)
    expected = {f.name for f in RAW_SCHEMAS[entity].fields}
    missing = expected - set(df.columns)
    if missing:
        raise ValueError(f"raw {entity} at {path} missing columns: {sorted(missing)}")
    return df


def register_cleaned_views(
    spark: SparkSession,
    pin_path: str,
    geo_path: str,
    user_path: str,
    deterministic: bool = True,
    fmt: str = "parquet",
) -> dict[str, DataFrame]:
    """Read raw pin/geo/user, clean, and register the three analytics
    views (``pin_table``/``geo_table``/``user_table`` — the tables the
    8-query workload runs over, cf. BATCH:108-109,190)."""
    reader = read_raw_parquet if fmt == "parquet" else read_raw_json
    pin = clean_pin(reader(spark, "pin", pin_path), deterministic=deterministic)
    geo = clean_geo(reader(spark, "geo", geo_path), deterministic=deterministic)
    user = clean_user(reader(spark, "user", user_path), deterministic=deterministic)
    pin.createOrReplaceTempView("pin_table")
    geo.createOrReplaceTempView("geo_table")
    user.createOrReplaceTempView("user_table")
    return {"pin_table": pin, "geo_table": geo, "user_table": user}


def load_testdata_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver-provided TPC-H-ish parquet tables and register a
    temp view per table (used by ``__spark_entry__.queries()``)."""
    out = {}
    for name in TESTDATA_TABLES:
        p = Path(sf_dir) / f"{name}.parquet"
        if p.exists():
            df = table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


# Parquet TIMESTAMP(NANOS) columns: Spark has no nanosecond timestamp type
# (PARQUET_TYPE_ILLEGAL on read), so these are read as raw nano longs via the
# legacy conf and truncated to microsecond timestamps — the oracle SQL applies
# the same truncation (CAST(ts AS TIMESTAMP) in DuckDB) so orderings agree.
# The conversion is type-gated at read time: a regenerated dataset that ships
# the same column as TIMESTAMP(MICROS) loads as a timestamp directly and
# needs (and tolerates) no rewrite.
_TS_NANO_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def widen_small_scan(df: DataFrame) -> DataFrame:
    """Spread a small scan across the cluster before CPU-heavy per-row
    expressions (shingling, per-shingle hashing, signature arithmetic).

    A table that fits in one parquet split arrives as ONE input
    partition, serializing all downstream per-row compute onto a single
    core (measured 25x slowdown on the sf0.1 dedup family). Guarded by
    an input-size estimate: at real scale the scan already carries
    >= cores splits and this is a no-op — it never shuffles a large
    input. The estimate reads file sizes driver-side (microseconds);
    probing ``df.rdd.getNumPartitions()`` instead costs a full physical
    planning pass (~1 s) PER CALL, which dominated the small-SF bench.
    """
    import os
    from urllib.parse import unquote, urlparse

    spark = df.sparkSession
    sc = spark.sparkContext
    target = sc.defaultParallelism

    def _bytes_conf(key: str, default: int) -> int:
        raw = spark.conf.get(key, str(default))
        digits = "".join(ch for ch in raw if ch.isdigit())
        val = int(digits) if digits else default
        if raw.lower().endswith(("m", "mb")):
            val *= 1 << 20
        elif raw.lower().endswith(("k", "kb")):
            val *= 1 << 10
        elif raw.lower().endswith(("g", "gb")):
            val *= 1 << 30
        return val

    try:
        files = df.inputFiles()
        sizes = sum(os.path.getsize(unquote(urlparse(f).path)) for f in files)
        # Mirror FilePartition.maxSplitBytes: each file pays an open cost,
        # and the split size shrinks toward bytesPerCore so a scan big
        # enough to feed every core is never estimated as one split. The
        # old maxPartitionBytes-only estimate undercounted many-small-file
        # inputs and re-shuffled scans that already had enough partitions.
        max_pb = _bytes_conf("spark.sql.files.maxPartitionBytes", 134_217_728)
        open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4_194_304)
        total = sizes + open_cost * len(files)
        bytes_per_core = total // max(1, target)
        max_split = min(max_pb, max(open_cost, bytes_per_core))
        est_splits = -(-total // max(1, max_split))  # ceil; bin-packed bound
    except Exception:  # non-file source — fall back to the exact probe
        est_splits = df.rdd.getNumPartitions()
    if est_splits < target:
        return df.repartition(target)
    return df


# (applicationId, sf_dir, name) → DataFrame. A DataFrame is an immutable
# logical plan, so reuse across queries in one session is safe — and it
# skips the per-call parquet footer read that otherwise taxes every
# query with driver-side I/O (10 tables × ~30 ms adds up across a
# 98-query bench run).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided testdata table (explicit path, no catalog).

    Pins the session timezone to UTC: every calendar function
    (year/date_trunc/date_format) downstream of these tables must match
    DuckDB's timezone-naive arithmetic regardless of which SparkSession
    the caller built (the oracle harness uses its own)."""
    # Pin BEFORE the cache lookup: a cache hit must still pin the
    # calling session (a sibling SparkSession.newSession shares the
    # applicationId, and a caller may have changed the tz between calls).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (spark.sparkContext.applicationId, str(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    path = str(Path(sf_dir) / f"{name}.parquet")
    nano_cols = _TS_NANO_COLS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        # only rewrite when the column actually arrived as nano longs;
        # integer DIV keeps full precision (ns values overflow double)
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
        else:
            # TIMESTAMP(MICROS) parquet loads as TIMESTAMP_NTZ; normalize
            # to session-UTC TIMESTAMP so downstream epoch functions
            # (unix_micros etc.) resolve — wall-clock values are unchanged
            # because the session timezone is pinned to UTC above
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def register_catalog_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ),
    analyze: bool = True,
    column_stats: bool = True,
    prefix: str = "",
) -> list[str]:
    """Register the testdata parquet tables as EXTERNAL catalog tables
    and (by default) run ``ANALYZE TABLE ... COMPUTE STATISTICS [FOR
    ALL COLUMNS]`` on each — the ingest-path step that feeds Spark's
    cost-based optimizer.  Without catalog statistics a table's size
    estimate defaults to Long.MaxValue and every selective-filter
    broadcast opportunity is lost (the flip is plan-asserted in
    tests/test_plans.py::test_cbo_stats_flip_sortmerge_to_broadcast
    and documented in docs/SCALE.md §"Stats-driven planning (CBO)").
    At 100 TB, shipping ANALYZE with ingestion is the difference
    between a stats-informed broadcast decision and a guessed one.

    Tables are external (``USING parquet LOCATION ...``): dropping
    them never touches the data files.  Returns the registered table
    names.  Set ``column_stats=False`` to collect table-level stats
    only (row count + size — enough for join-side sizing, not for
    filter selectivity)."""
    registered = []
    for name in names:
        path = Path(sf_dir) / f"{name}.parquet"
        if not path.exists():
            continue
        tbl = f"{prefix}{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(
            f"CREATE TABLE {tbl} USING parquet LOCATION '{path}'"
        )
        if analyze:
            analyze_table(spark, tbl, column_stats=column_stats)
        registered.append(tbl)
    return registered


def analyze_table(
    spark: SparkSession, tbl: str, column_stats: bool = True
) -> None:
    """Run ``ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]``
    on a catalog table — the CBO-feeding step shared by
    ``register_catalog_tables`` (external testdata tables) and
    ``pipeline.run_batch`` (the engine's own persisted tables)."""
    suffix = ""
    if column_stats:
        # ANALYZE ... FOR COLUMNS rejects complex types (e.g.
        # embeddings' array<float>): collect per-column stats
        # for the atomic columns only, table-level otherwise
        atomic = [
            f.name
            for f in spark.table(tbl).schema.fields
            if f.dataType.typeName()
            not in ("array", "map", "struct", "binary")
        ]
        if atomic:
            suffix = " FOR COLUMNS " + ", ".join(atomic)
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS{suffix}")
