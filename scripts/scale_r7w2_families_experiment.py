"""Scaling measurement for the round-7 WAVE-2 additions (the stats /
SPC / retention / association entries).

Replication protocol: scale_r5w2_families_experiment.replicate_r5w2 —
K key-shifted fact copies (events user/event ids shifted per copy,
orders/lineitem keys shifted, documents/embeddings key-shifted).
What each op should do as K grows:

- `ols_order_price_trend`, `lineitem_corr_matrix`,
  `moment_stats_family`: pure moment pipelines — ONE partial+final
  agg whose partial rows are fixed-width, so wall grows with the scan
  only (near-linear) and output is K-invariant.
- `shewhart_control_limits`, `reid_risk_entropy`: reduce to bounded
  (#types x #days / #QI-classes) aggregates map-side — near-linear
  wall, K-invariant output.
- `mad_robust_outliers`: two `_distributed_rank` range shuffles grow
  linearly; no per-group single-task sort to collapse.
- `kendall_tau_daily`, `runs_test_daily`: reduce to the bounded
  #types x #days aggregate map-side; the O(days^2) pair join and the
  lag windows run on that aggregate — near-linear wall, K-invariant
  output.
- `event_transition_matrix`: the user-keyed LEAD window grows
  linearly in rows; output is bounded by #types^2.
- `basket_brand_pairs`: the orderkey-keyed self-join grows linearly
  (per-order brand sets are corpus-invariant); output is bounded by
  brands^2 and the LIMIT.
- `ann_ndcg_eval`: two broadcast-query searches over a K-fold corpus
  — linear scan growth, bounded result-set evaluation.
- `group_order_by_all_family`: one rollup — near-linear.

Run: python scripts/scale_r7w2_families_experiment.py [K ...]
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
    ("facts", "ols_order_price_trend"),
    ("facts", "lineitem_corr_matrix"),
    ("facts", "basket_brand_pairs"),
    ("dataquality", "mad_robust_outliers"),
    ("dataquality", "moment_stats_family"),
    ("dataquality", "shewhart_control_limits"),
    ("dataquality", "kendall_tau_daily"),
    ("dataquality", "runs_test_daily"),
    ("events", "event_transition_matrix"),
    ("similarity", "ann_ndcg_eval"),
    ("privacy", "reid_risk_entropy"),
    ("relational", "group_order_by_all_family"),
)


def main() -> None:
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("r7w2scale-experiment")
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
