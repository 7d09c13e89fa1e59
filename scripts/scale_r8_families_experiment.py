"""Scaling measurement for the round-8 additions (paragraph removal,
iterative BPE, PQ/RVQ, preference, KMV, k-core, temporal split, media
byte entropy).

Replication protocol: scale_r5w2_families_experiment.replicate_r5w2 —
K key-shifted fact copies (events user/event ids shifted per copy,
orders/lineitem keys shifted, documents/embeddings key-shifted; doc
TEXT is replicated verbatim, so every paragraph/word becomes K-plicated
content).  What each op should do as K grows:

- `ccnet_paragraph_dedup_stats`, `boilerplate_para_removal_by_source`:
  the paragraph explode and the hash-keyed min/count-distinct aggs grow
  linearly; under verbatim replication every paragraph is duplicated,
  so the removal MASS grows with K while the distinct-hash table stays
  corpus-invariant — wall tracks the scan, output stays bounded
  (#langs / #sources rows).
- `bpe_iterative_merges`: the corpus collapses to the word-frequency
  vocabulary first; verbatim replication leaves the vocab IDENTICAL
  (only freq scales), so the three train rounds are K-invariant work on
  top of one linear corpus agg.
- `pq_codebook_train` / `pq_adc_recall` / `rq_two_stage_error`: the
  embedding corpus grows Kx; every round is a broadcast join against a
  constant-size codebook plus a decimal mean whose shuffle carries
  k x dim cells — near-linear wall, K-invariant codebooks.
- `pairwise_preference_matrix` / `bradley_terry_strengths`: user-day
  aggregates grow Kx (shifted user ids), but the win matrix and the MM
  rounds run on the #types² table — near-linear wall, K-invariant
  output shape.
- `kmv_distinct_estimate`: distinct (type, user) grows Kx; the rank is
  a range shuffle (no per-type single-task sort); estimate quality is
  what the entry audits.
- `kcore_peeling_rounds`: the contracted node space is fixed (TRI_K),
  so edges saturate — wall should go FLAT after the distinct.
- `temporal_split_audit`: linear tag + two bounded aggs.
- `media_byte_entropy_by_kind`: the byte explode is linear by
  definition (the floor for any byte statistic); the shuffle carries
  <= 256 rows per kind per task.

Run: python scripts/scale_r8_families_experiment.py [K ...]
(default: 1 5 10)
"""

from __future__ import annotations

import importlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from scale_r5w2_families_experiment import replicate_r5w2  # noqa: E402

OPS = (
    ("dedup", "ccnet_paragraph_dedup_stats"),
    ("dedup", "boilerplate_para_removal_by_source"),
    ("textops", "bpe_iterative_merges"),
    ("similarity", "pq_codebook_train"),
    ("similarity", "pq_adc_recall"),
    ("similarity", "rq_two_stage_error"),
    ("preference", "pairwise_preference_matrix"),
    ("preference", "bradley_terry_strengths"),
    ("sketches", "kmv_distinct_estimate"),
    ("graph", "kcore_peeling_rounds"),
    ("events", "temporal_split_audit"),
    ("multimodal", "media_byte_entropy_by_kind"),
)


def main() -> None:
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("r8scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")
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
            print(f"{op:38s} x{k:<3d} {best:8.2f}s  rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
