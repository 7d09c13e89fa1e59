"""Scaling measurement for the round-5 wave-2..4 additions (TPC-H
Q2/Q9/Q11/Q16/Q20 analogs, exact quantiles, Gopher rules, embedding
dim profile, SemDeDup, hard negatives, cell purity, co-occurrence
lift, power curve).

Replication protocols:
- fact tables: scripts/scale_families_experiment.replicate (K
  key-shifted copies — joins/distincts grow linearly, no hot keys),
  EXTENDED here with key-shifted part/supplier copies (the wave-2
  shapes join dimensions the older experiments never read) and
  verbatim nation/region (bounded real dimensions).
- embeddings: K key-shifted EXACT copies — the worst case for
  SemDeDup (each vector gains K-1 perfect duplicates in its own cell,
  so within-cell qualifying pairs grow ~K^2 — the dup-heavy shape the
  operator exists to prune), while (cell x label) aggregates stay
  K-invariant. Only copy-0 vectors satisfy vec_id < N_CELLS, so the
  centroid set — and therefore the cell geometry — is identical at
  every K.

Run: python scripts/scale_r5w2_families_experiment.py [K ...]
(default: 1 5 10)
"""

from __future__ import annotations

import importlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from scale_families_experiment import SF, replicate  # noqa: E402

OPS = (
    ("facts", "min_cost_supplier_parts"),
    ("facts", "nation_profit_trend"),
    ("facts", "important_part_share"),
    ("facts", "supplier_count_by_attrs"),
    ("facts", "qualified_part_shippers"),
    ("relational", "exact_price_quantiles"),
    ("textops", "gopher_quality_flags"),
    ("similarity", "embedding_dim_profile"),
    ("similarity", "semdedup_prune"),
    ("similarity", "hard_negative_mining"),
    ("similarity", "cell_label_purity"),
    ("events", "event_cooccurrence_lift"),
    ("events", "user_power_curve"),
)


def replicate_r5w2(spark, k: int) -> str:
    """Fact replication + shifted part/supplier + verbatim nation/region
    + key-shifted embedding copies."""
    out = replicate(spark, k)  # orders, lineitem, events, documents
    copies = spark.range(k).withColumnRenamed("id", "copy")

    # replicate() shifts l_partkey/l_suppkey by LINEITEM maxima; the
    # dimension copies must shift by the SAME base or every copy>0
    # join key dangles and the experiment silently measures K=1 work.
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    li_part, li_supp = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()

    part = spark.read.parquet(f"{SF}/part.parquet")
    n_part = part.agg(F.max("p_partkey")).first()[0] + 1
    assert n_part == li_part + 1, (
        f"dim/fact shift bases desynced: max(p_partkey)={n_part - 1} vs "
        f"max(l_partkey)={li_part} — align replicate()'s shift first"
    )
    (
        part.crossJoin(copies)
        .select(
            (F.col("p_partkey") + F.col("copy") * n_part).alias("p_partkey"),
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/part.parquet")
    )

    supp = spark.read.parquet(f"{SF}/supplier.parquet")
    n_supp = supp.agg(F.max("s_suppkey")).first()[0] + 1
    assert n_supp == li_supp + 1, (
        f"dim/fact shift bases desynced: max(s_suppkey)={n_supp - 1} vs "
        f"max(l_suppkey)={li_supp} — align replicate()'s shift first"
    )
    (
        supp.crossJoin(copies)
        .select(
            (F.col("s_suppkey") + F.col("copy") * n_supp).alias("s_suppkey"),
            "s_name",
            "s_nationkey",
            "s_acctbal",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/supplier.parquet")
    )

    for dim in ("nation", "region"):
        spark.read.parquet(f"{SF}/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{dim}.parquet")

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * n_vec).alias("vec_id"),
            "embedding",
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    return out


def main() -> None:
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("r5w2scale-experiment")
    for k in ks:
        d = replicate_r5w2(spark, k)
        print(f"--- x{k} ({d})", flush=True)
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
            print(f"{op:28s} x{k:<3d} {best:7.2f}s  rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
