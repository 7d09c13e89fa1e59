"""Table sinks and auxiliary sources (SURVEY.md §2.1 S1/S3/S5).

- ``read_csv``: the S1 scan shape (``header``/``sep`` options, optional
  declared schema). The reference reads its credential file as
  ``format("delta")`` with CSV options (BATCH:14-17) — on a stock local
  session Delta needs the delta-spark package, so ``read_table_any``
  gates it behind availability and falls back to parquet/csv.
- ``save_table``: S5 — persist a DataFrame as a managed table
  (``saveAsTable``, overwrite), the unit the 8-query workload reads.
- ``rm_checkpoint``: S3's ``dbutils.fs.rm(path, True)`` analog for
  local checkpoints (plain shutil — dbutils is Databricks-only).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with explicit options; schema-first when provided (no
    inference scan)."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def delta_available(spark: SparkSession) -> bool:
    """True if the delta-spark package is on the classpath.

    Must force an actual JVM class LOAD: py4j attribute traversal
    (``_jvm.org.apache...DeltaLog``) never raises for a missing class —
    it returns a ``JavaPackage`` stub — so the previous bare-attribute
    probe reported True on every classpath and the gate was dead."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def read_table_any(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Format-dispatching load. ``delta`` resolves in order: real
    delta-spark if on the classpath → the in-repo delta-lite log reader
    if the directory carries a ``_delta_log`` (sources/delta_lite.py —
    snapshot semantics, honors remove actions) → plain parquet (the
    layout-only fallback; SURVEY.md §1.1)."""
    if fmt == "delta" and not delta_available(spark):
        if (Path(path) / "_delta_log").is_dir():
            from pinterest_data_pipeline6_spark.sources.delta_lite import read_delta

            return read_delta(spark, path)
        fmt = "parquet"
    return spark.read.format(fmt).load(path)


def save_table(
    df: DataFrame, name: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """S5: persist as a managed table (BATCH:108-109,174,190). At scale,
    callers partition/bucket via ``df.repartition``/``bucketBy`` before
    handing the frame in; this function owns only the catalog write.

    Defensive against orphaned locations: a fresh session has an empty
    in-memory catalog, but a previous run's warehouse directory may
    survive — Spark then refuses the managed-table name
    (LOCATION_ALREADY_EXISTS). Overwrite semantics here mean the orphan
    dir is removed."""
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(name):
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = Path(warehouse.removeprefix("file:")) / name.lower()
        if loc.exists():
            shutil.rmtree(loc, ignore_errors=True)
    df.write.format(fmt).mode(mode).saveAsTable(name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned layout (``partitionBy``): the at-rest
    organization that turns partition-key predicates into directory
    pruning — a filter on the partition column reads ONLY the matching
    directories, which at 100 TB is the difference between scanning a
    day and scanning a decade. Callers pick LOW-cardinality columns
    (date, region, kind); high-cardinality partitioning creates a
    small-files problem instead."""
    df.write.format(fmt).mode("overwrite").partitionBy(*partition_cols).save(path)


def rm_checkpoint(path: str | Path) -> None:
    """Remove a streaming checkpoint dir (STREAM:168-170 analog)."""
    shutil.rmtree(path, ignore_errors=True)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S7: RDBMS source over ``spark.read.jdbc`` — the reference ingests
    its three raw tables from MySQL (user_posting_emulation.py:25,40-56,
    a driver-side pymysql cursor loop); here the SAME ingestion is a
    declarative, executor-parallel scan.

    Exactly one of ``table``/``query`` must be given (``query`` becomes
    a pushed-down derived table: filters and projections named in it
    run inside the database). Partitioned reads — the property that
    makes JDBC ingest scale past one connection — need all four of
    ``partition_column``/``lower_bound``/``upper_bound``/
    ``num_partitions``: Spark issues one range-predicated query per
    stride, so the table streams through N parallel connections instead
    of one driver-side cursor. ``fetchsize`` tunes rows-per-network-
    round-trip (MySQL's default is pathologically small).

    Tested against Derby embedded (the JDBC engine Spark already
    ships); any server database is the same call with its driver jar on
    the classpath."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("fetchsize", str(fetchsize))
    )
    if table is not None:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if driver is not None:
        reader = reader.option("driver", driver)
    part_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(o is not None for o in part_opts):
        if any(o is None for o in part_opts):
            raise ValueError(
                "partitioned JDBC reads need partition_column, lower_bound, "
                "upper_bound AND num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def compact_files(
    spark: SparkSession,
    path: str | Path,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a directory of many small files
    into ~target_file_mb outputs. The small-file problem is the classic
    ingest pathology at scale (streaming sinks and per-partition
    writers emit one file per task per trigger; a 100 TB table ingested
    that way ends up with millions of KB-sized files whose open/footer
    cost dominates scans).

    Sizing: file count = ceil(bytes_on_disk / target). ``coalesce``
    (not ``repartition``) merges read-splits without a shuffle — the
    rewrite is one scan + one write. Returns the new file count.
    Compaction writes to a temp sibling then atomically swaps, so a
    concurrent reader sees old or new layout, never a mix."""
    p = Path(path)
    data_files = [f for f in p.rglob("*") if f.is_file() and not f.name.startswith(("_", "."))]
    total_bytes = sum(f.stat().st_size for f in data_files)
    n_out = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(str(p))
    tmp = p.with_name(p.name + "__compact_tmp")
    df.coalesce(int(n_out)).write.format(fmt).mode("overwrite").save(str(tmp))
    swap = p.with_name(p.name + "__compact_old")
    p.rename(swap)
    tmp.rename(p)
    shutil.rmtree(swap)
    return int(n_out)
