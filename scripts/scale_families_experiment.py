"""Scaling measurement for the round-3 operator families (data quality,
graph, events, index build): replicate the sf0.1 fact tables K times
with shifted keys and time each operator best-of-2 — the linear-scan
counterpart of scripts/scale_experiment.py's dup-heavy dedup protocol.

Key shifting keeps cardinalities realistic: order/lineitem keys and
event ids move to disjoint ranges per copy (so joins and distincts
grow linearly), user ids and document ids are also shifted so
per-entity group counts stay constant while group COUNT grows with K.

Run: python scripts/scale_families_experiment.py [K ...]  (default: 1 4 10)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"

# operator -> module holding its QUERIES entry
OPS = (
    ("dataquality", "dq_expectations"),
    ("dataquality", "dq_column_profile"),
    ("dataquality", "freshness_lag_stats"),
    ("graph", "pagerank_bipartite"),
    ("graph", "triangle_counts"),
    ("events", "attribution_last_touch"),
    ("events", "activity_streaks"),
    ("textops", "inverted_index_sample"),
    ("relational", "price_equidepth_histogram"),
    ("relational", "mad_price_outliers"),
)


def replicate(spark, k: int) -> str:
    """K key-shifted copies of the sf0.1 fact tables (+ the dimension
    tables copied through unchanged)."""
    out = tempfile.mkdtemp(prefix=f"famscale_x{k}_")
    copies = spark.range(k).withColumnRenamed("id", "copy")

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
    n_cust = orders.agg(F.max("o_custkey")).first()[0] + 1
    (
        orders.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("copy") * n_ord).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("copy") * n_cust).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_part = li.agg(F.max("l_partkey")).first()[0] + 1
    n_supp = li.agg(F.max("l_suppkey")).first()[0] + 1
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("copy") * n_ord).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("copy") * n_part).alias("l_partkey"),
            (F.col("l_suppkey") + F.col("copy") * n_supp).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_evt = ev.agg(F.max("event_id")).first()[0] + 1
    n_usr = ev.agg(F.max("user_id")).first()[0] + 1
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * n_evt).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("copy") * n_usr).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * n_doc).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    return out


def main() -> None:
    import importlib

    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("famscale-experiment")
    for k in ks:
        d = replicate(spark, k)
        print(f"--- x{k} ({d})")
        for modname, op in OPS:
            mod = importlib.import_module(
                f"pinterest_data_pipeline6_spark.operators.{modname}"
            )
            fn = mod.QUERIES[op]
            best = float("inf")
            rows = -1
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            print(f"{op:28s} x{k:<3d} {best:7.2f}s  rows={rows}")


if __name__ == "__main__":
    main()
