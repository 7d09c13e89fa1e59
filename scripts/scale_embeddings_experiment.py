"""Scaling measurement for the embedding family (ANN searches +
k-means): replicate the sf0.1 embeddings table K times with shifted
vec_ids and per-copy vector perturbation, and time each operator
best-of-2 — the reproducible form of the round-2 one-off behind
docs/SCALE.md §'Embedding family'.

Perturbation adds copy/1000 to the first component: vectors stay in
the same region (realistic near-duplicate embedding mass) while no two
copies are bit-identical, so LSH/IVF bucket occupancy grows with K the
way a real corpus's would. Query vectors (vec_id < N_QUERIES) and the
k-means init set (lowest K ids) keep their original values because
copy 0 keeps vec_ids 0..n-1 and shifted copies land above them.

Run: python scripts/scale_embeddings_experiment.py [K ...]
     (default: 1 10 50 -> 2k / 20k / 100k vectors)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"

OPS = (
    "knn_brute_force",
    "knn_lsh_bucketed",
    "knn_ivf",
    "kmeans_embeddings",
)


def replicate(spark, k: int) -> str:
    out = tempfile.mkdtemp(prefix=f"scale_emb_x{k}_")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    copies = emb.crossJoin(spark.range(k).withColumnRenamed("id", "copy"))
    (
        copies.select(
            (F.col("vec_id") + F.col("copy") * n).alias("vec_id"),
            F.when(F.col("copy") == 0, F.col("embedding"))
            .otherwise(
                F.concat(
                    F.array(
                        (
                            F.element_at("embedding", 1)
                            + F.col("copy").cast("float") / F.lit(1000.0)
                        ).cast("float")
                    ),
                    F.slice("embedding", 2, 10_000),
                )
            )
            .alias("embedding"),
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    return out


def main() -> None:
    from pinterest_data_pipeline6_spark.operators import similarity
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark("scale-emb", shuffle_partitions=32)
    results: dict[int, dict[str, float]] = {}
    for k in ks:
        d = replicate(spark, k)
        n = spark.read.parquet(f"{d}/embeddings.parquet").count()
        row: dict[str, float] = {}
        for op in OPS:
            fn = similarity.QUERIES[op]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            row[op] = round(best, 2)
            print(f"x{k} ({n} vecs) {op}: {row[op]} s", flush=True)
        results[k] = row
    print(results)


if __name__ == "__main__":
    main()
