"""Dup-heavy scaling run for the round-3 verification-stage additions
(estimate-vs-exact audit, banding sweep, boilerplate accounting,
incremental batch dedup, BPE merge mining, quality/near-dup
correlation): same replication protocol as scripts/scale_experiment.py
— K copies of every sf0.1 document, each perturbed by one appended
copy-specific token, so every original gains K-1 NEAR-duplicates and
the LSH candidate volume grows ~K^2 inside each clique (the worst
realistic shape for candidate-verification operators).

Run: python scripts/scale_verify_family_experiment.py [K ...]  (default: 1 5 10)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OPS = (
    "boilerplate_ngram_stats",
    "incremental_dedup_batch",
    "bpe_merge_candidates",
    "quality_dup_correlation",
    "lsh_tuning_sweep",
    "minhash_estimate_error",
)


def main() -> None:
    from scripts.scale_experiment import replicate

    from pinterest_data_pipeline6_spark.operators import dedup, textops
    from pinterest_data_pipeline6_spark.session import get_spark

    registry = dict(dedup.QUERIES)
    registry.update(textops.QUERIES)

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("scale-verify-family")
    for k in ks:
        d = replicate(spark, k)
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"--- x{k}: {n} docs ({d})", flush=True)
        for op in OPS:
            fn = registry[op]
            best = float("inf")
            rows = -1
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            print(f"{op}: {best:.2f}s rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
