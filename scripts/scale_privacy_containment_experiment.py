"""Scaling run for this round's additions: n-gram containment pairs,
the k-anonymity / l-diversity audits, and the grouped-ntile
rfm_segments rebuild.

Two replication protocols, matched to what each operator must prove:

- ``ngram_containment_pairs`` uses the DUP-HEAVY protocol
  (scripts/scale_experiment.replicate — K perturbed copies of every
  document): every original gains K-1 near-duplicates, so candidate
  volume inside each clique grows ~K^2. Containment must track the
  candidate-pair count (the same curve as ngram_jaccard_pairs), since
  its only non-linear stage IS the pair materialization.
- the audits + rfm use KEY-SHIFTED fact replication (disjoint keys —
  no artificial dup cliques): k-anonymity/l-diversity cost must grow
  with the DISTINCT-QI count and rfm with the customer count, both
  linearly.

The customer table is replicated here (the shared fact replicator
covers orders/lineitem/events/documents only): balances get a
copy-specific +10000*copy shift so QI classes stay disjoint across
copies — class COUNT grows K-fold while class sizes stay constant,
which is exactly the regime where a scale-broken audit (e.g. one that
windowed over people) would blow up.

Run: python scripts/scale_privacy_containment_experiment.py [K ...]
(default: 1 4 10)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SF = "/root/testdata/sf0.1"


def replicate_customer(spark, base_dir: str, k: int) -> None:
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    n_cust = cust.agg(F.max("c_custkey")).first()[0] + 1
    copies = spark.range(k).withColumnRenamed("id", "copy")
    (
        cust.crossJoin(copies)
        .select(
            (F.col("c_custkey") + F.col("copy") * n_cust).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            (F.col("c_acctbal") + F.col("copy") * 10_000).alias("c_acctbal"),
            "c_mktsegment",
        )
        .write.mode("overwrite")
        .parquet(f"{base_dir}/customer.parquet")
    )


def best_of(fn, spark, d, reps=2):
    best, rows = float("inf"), -1
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = fn(spark, d).count()
        best = min(best, time.perf_counter() - t0)
    return best, rows


def main() -> None:
    from scale_experiment import replicate as replicate_dups
    from scale_families_experiment import replicate as replicate_facts

    from pinterest_data_pipeline6_spark.operators import dedup, facts, privacy
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("scale-privacy-containment")

    for k in ks:
        d = replicate_dups(spark, k)
        best, rows = best_of(dedup.QUERIES["ngram_containment_pairs"], spark, d)
        print(f"ngram_containment_pairs   x{k:<3d} {best:7.2f}s rows={rows}", flush=True)

    for k in ks:
        d = replicate_facts(spark, k)
        replicate_customer(spark, d, k)
        for op in ("k_anonymity_report", "l_diversity_check"):
            best, rows = best_of(privacy.QUERIES[op], spark, d)
            print(f"{op:25s} x{k:<3d} {best:7.2f}s rows={rows}", flush=True)
        best, rows = best_of(facts.QUERIES["rfm_segments"], spark, d)
        print(f"{'rfm_segments':25s} x{k:<3d} {best:7.2f}s rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
