"""Scaling measurement for the round-5 wave-5/6 additions (data
selection: DSIR importance weights, winnowing fingerprints, per-source
caps, token-budget allocation, matryoshka truncation audit).

Replication protocol: scale_r5w2_families_experiment.replicate_r5w2 —
K key-shifted copies of documents (text verbatim, doc_id shifted) and
embeddings (vectors verbatim, vec_id shifted). For this family that is
the adversarial shape on purpose:

- `winnowing_fingerprints`: every copy re-contributes the SAME
  fingerprints, so the corpus-distinct count is K-invariant while the
  per-source rollup grows linearly — the distinct shuffle's map-side
  partial dedup should absorb the duplication.
- `dsir_importance_weights`: bucket counts grow K-fold but stay 128
  rows; the per-doc scoring join grows linearly.
- `source_quality_cap`: per-source doc counts grow K-fold while the
  cap stays 20 — the distributed-rank core must not develop a
  single-task sort as domains grow.
- `token_budget_allocation`: a #sources-row aggregate at any K.
- `matryoshka_truncation_error`: candidates grow linearly; only copy-0
  vectors are queries (vec_id < N_QUERIES), so pair count is 5 x N.

Run: python scripts/scale_r5w5_families_experiment.py [K ...]
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
    ("curation", "dsir_importance_weights"),
    ("curation", "source_quality_cap"),
    ("curation", "token_budget_allocation"),
    ("textops", "winnowing_fingerprints"),
    ("similarity", "matryoshka_truncation_error"),
    # wave 6 (LM prep) rides the same protocol: verbatim-text copies are
    # the dup-heavy worst case for the distinct bigram-TYPE reduction
    # (types stay K-invariant while occurrences grow K-fold)
    ("textops", "kn_continuation_stats"),
    ("textops", "pmi_collocations"),
)


def main() -> None:
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("r5w5scale-experiment")
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
