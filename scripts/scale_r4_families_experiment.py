"""Scaling measurement for the round-4 operator families (Bloom join
pruning, count-min sketch, calendar gap-fill, CDC snapshot diff):
replicate the sf0.1 fact tables K times with shifted keys (the same
protocol as scripts/scale_families_experiment.py) and time each
operator best-of-2.

What linear behavior proves per family:
- bloom_prune_stats: the filter stays 256 words at every K — the cost
  is the probe-side scan + one partial agg, so time grows with rows.
- cms_frequency_estimates: the sketch stays 2048 cells at every K —
  only the exploded scan grows.
- gapfill_hourly_interpolate: the calendar (720 rows) is K-invariant;
  only the hourly pre-aggregate sees more rows.
- snapshot_diff_cdc: one full-outer join whose both sides grow
  linearly with disjoint keys.

Run: python scripts/scale_r4_families_experiment.py [K ...]  (default: 1 4 10)
"""

from __future__ import annotations

import importlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from scale_families_experiment import replicate  # noqa: E402

OPS = (
    ("sketches", "bloom_prune_stats"),
    ("sketches", "cms_frequency_estimates"),
    ("events", "gapfill_hourly_interpolate"),
    ("facts", "snapshot_diff_cdc"),
)


def main() -> None:
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("r4scale-experiment")
    for k in ks:
        d = replicate(spark, k)
        print(f"--- x{k} ({d})")
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
            print(f"{op:28s} x{k:<3d} {best:7.2f}s  rows={rows}")


if __name__ == "__main__":
    main()
