"""Scaling measurement for the round-6 additions (streaming batch
twins, TPC-H Q4, LPA communities, watermark lateness, skip-grams,
pseudonymization, Theil-Sen) plus the re-shaped PPJoin entry.

Replication protocol: scale_r5w2_families_experiment.replicate_r5w2 —
K key-shifted fact copies (events user/event ids shifted per copy,
lineitem part/supplier keys shifted, documents verbatim-text with
shifted doc ids). What each op should do as K grows:

- `dq_gate_ledger` / `trending_topk_snapshot`: the day / hour-window
  key spaces are K-invariant while row counts grow K-fold — both are
  one partial+final agg, so map-side combine must absorb the growth
  (near-linear wall, flat output).
- `late_arrival_accounting`: the distributed prefix-max scan grows
  linearly; the only windows are per-range-partition and over the
  #partitions-row max table.
- `session_skipgram_pairs`: user ids shift per copy, so sequences stay
  copy-local; lead() windows grow linearly with no fanout.
- `pseudonymize_consistency`: distinct users grow K-fold; the
  (type, user) agg key stays high-cardinality — no funnel.
- `quality_trend_theilsen`: K-fold rows per (type, day) flow through
  the grouped distributed rank; the slope stage is K-invariant
  (#days^2 pairs per type regardless of corpus size).
- `label_propagation_communities` / `late_ship_order_priorities`:
  shifted lineitem keys contract onto the SAME node space — the
  dup-heavy worst case for the edge-dedup distinct and the semi-join.
- `jaccard_prefix_filter_pairs`: verbatim-text copies are the
  adversarial near-dup shape — candidate pairs grow ~K^2 inside hot
  (lang, token) posting groups; included to keep the trimmed plan's
  growth curve on record.

Run: python scripts/scale_r6_families_experiment.py [K ...]
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
    ("dataquality", "dq_gate_ledger"),
    ("events", "trending_topk_snapshot"),
    ("events", "late_arrival_accounting"),
    ("events", "session_skipgram_pairs"),
    ("privacy", "pseudonymize_consistency"),
    ("dataquality", "quality_trend_theilsen"),
    ("graph", "label_propagation_communities"),
    ("facts", "late_ship_order_priorities"),
    ("dedup", "jaccard_prefix_filter_pairs"),
)


def main() -> None:
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("r6scale-experiment")
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
            print(f"{op:28s} x{k:<3d} {best:7.2f}s  rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
