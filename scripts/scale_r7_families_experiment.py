"""Scaling measurement for the round-7 additions (substring-level
dedup, the two streaming-sink ledger twins, the stats/governance/
retrieval/event waves).

Replication protocol: scale_r5w2_families_experiment.replicate_r5w2 —
K key-shifted fact copies (events user/event ids shifted per copy,
orders/lineitem keys shifted, documents verbatim-text with shifted doc
ids, key-shifted embedding copies). What each op should do as K grows:

- `longest_dup_substring_stats`: verbatim doc copies are the
  adversarial case by construction — every seed gram gains K-fold
  sites, so matching pairs grow ~K^2 inside each gram group (the same
  output-bound class as jaccard_prefix_filter_pairs; the hot-gram cap
  bounds the worst group). Wall time should track the pair mass, not
  exceed it.
- `neardup_suppression_ledger` / `curation_funnel_batch_ledger`:
  copies collide with the first-accepted copy's band buckets, so the
  accepted set (and the band state) stays ~K-invariant while the
  per-batch semi-joins grow linearly.
- `unicode_fold_dedup_stats`, `mannwhitney_value_shift`,
  `order_reconciliation_buckets`, `embedding_covariance_matrix`:
  map-side projections + shrinking aggregates — near-linear wall,
  K-invariant (or value-space-bounded) output.
- `winsorized_mean_prices`, `inter_event_time_quantiles`: the
  `_distributed_rank` range shuffle grows linearly; no per-group
  single-task sort to collapse.
- `rrf_fusion_topk`: 5 broadcast queries x a K-fold corpus — linear
  scan growth, bounded windows.

Run: python scripts/scale_r7_families_experiment.py [K ...]
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
    ("dedup", "longest_dup_substring_stats"),
    ("dedup", "neardup_suppression_ledger"),
    ("curation", "curation_funnel_batch_ledger"),
    ("dedup", "unicode_fold_dedup_stats"),
    ("dataquality", "mannwhitney_value_shift"),
    ("dataquality", "order_reconciliation_buckets"),
    ("dataquality", "winsorized_mean_prices"),
    ("events", "inter_event_time_quantiles"),
    ("similarity", "rrf_fusion_topk"),
    ("similarity", "embedding_covariance_matrix"),
)


def main() -> None:
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("r7scale-experiment")
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
            print(f"{op:35s} x{k:<3d} {best:8.2f}s  rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
