"""Dup-heavy scaling experiment (the docs/SCALE.md §'Measured scaling'
protocol): replicate sf0.1 documents K times with per-copy perturbation
— every original doc gains K-1 near-duplicate copies, the worst
realistic shape for the dedup family — and time the operators best-of-2.

Run: python scripts/scale_experiment.py [K ...]   (default: 1 10 50)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
OPS = ("dedup_exact_text", "minhash_band_pairs", "dedup_clusters")


def replicate(spark, k: int) -> str:
    """K copies of every sf0.1 document, each perturbed by one appended
    copy-specific token (shingle sets stay ~identical → near-dups)."""
    out = tempfile.mkdtemp(prefix=f"scale_x{k}_")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    copies = docs.crossJoin(spark.range(k).withColumnRenamed("id", "copy"))
    (
        copies.select(
            (F.col("doc_id") * k + F.col("copy")).alias("doc_id"),
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", F.col("text"), F.concat(F.lit("c"), F.col("copy"))))
            .alias("text"),
            "lang",
            "source",
            F.col("n_chars"),
        ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    )
    return out


def main() -> None:
    from pinterest_data_pipeline6_spark.operators import dedup
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark("scale-experiment")
    for k in ks:
        d = replicate(spark, k)
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"--- x{k}: {n} docs ({d})")
        for op in OPS:
            fn = dedup.QUERIES[op]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            print(f"{op:24s} {best:7.2f}s  ({rows} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
