"""Scaling measurement for the round-5 additions (tokenizer fertility,
padding waste, code-switching, normalization dedup lift, prefix-filtered
Jaccard, cross-split leakage, embedding centroid shift, trailing
distinct users, tolerance as-of join).

Replication protocols, chosen per family's worst realistic shape:
- documents: the near-dup protocol of scripts/scale_experiment.py
  (K copies, one appended copy-specific token) — worst case for the
  prefix-filter join (every original gains K-1 near-identical
  neighbors, candidate cliques grow ~K^2) and for the digest
  aggregates (dup mass grows with K).
- embeddings: K key-shifted exact copies — (label, dim) cell counts
  are K-invariant, so centroid_shift should stay FLAT except the scan.
- events: K copies with shifted event ids and DISJOINT user ids over
  the same date range — per-day distinct users and as-of chains grow
  linearly with no hot keys.

Run: python scripts/scale_r5_families_experiment.py [K ...]  (default: 1 5 10)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"

DOC_OPS = (
    ("textops", "tokenizer_fertility_stats"),
    ("textops", "padding_waste_bins"),
    ("textops", "code_switch_stats"),
    ("dedup", "normalization_dedup_lift"),
    ("dedup", "jaccard_prefix_filter_pairs"),
    ("privacy", "cross_split_leakage"),
)
EMB_OPS = (("similarity", "embedding_centroid_shift"),)
EV_OPS = (
    ("events", "trailing_distinct_users"),
    ("events", "asof_tolerance_join"),
)


def replicate_r5(spark, k: int) -> str:
    """documents via the near-dup protocol; embeddings key-shifted;
    events key- and user-shifted over the same date range."""
    from scripts.scale_experiment import replicate

    out = replicate(spark, k)  # writes documents.parquet
    copies = spark.range(k).withColumnRenamed("id", "copy")

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

    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_ev = ev.agg(F.max("event_id")).first()[0] + 1
    n_u = ev.agg(F.max("user_id")).first()[0] + 1
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("copy") * n_u).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    return out


def main() -> None:
    import importlib

    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("r5scale-experiment")
    for k in ks:
        d = replicate_r5(spark, k)
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"--- x{k}: {n} docs ({d})", flush=True)
        for modname, op in DOC_OPS + EMB_OPS + EV_OPS:
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
            print(f"{op:30s} x{k:<3d} {best:7.2f}s  rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
