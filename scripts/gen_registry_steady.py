"""Generate tests/data/registry_steady_sf001.json — the per-query
steady-state table backing the registry-wide latency budgets in
tests/test_bench_contract.py (the round-5 verdict's directive: budgets
covered only the 30 headline queries, so a 25x artifact lie on any of
the other 201 entries — arrow_batch_norms' phantom 16.3 s row — had no
in-suite guard).

Method mirrors the headline table's calibration (test_bench_contract
docstring): two full passes over the registry at sf0.01 under the test
fixture config (8 shuffle partitions), best-of-3 per query with one
untimed warm rep, elementwise MAX across the passes — a conservative
steady state that absorbs pass-to-pass host drift. Re-run this script
on a calibration box whenever operators change materially; commit the
regenerated JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.01"
OUT = os.path.join(ROOT, "tests", "data", "registry_steady_sf001.json")

# Budget classes (tests/test_bench_contract.py). Every entry gets a
# wall-clock budget from the steady table this script writes; the
# entries below ADDITIONALLY carry a unit-cost pin, because for them a
# wall budget alone would hide the structural regression that matters:
#   output-bound   — wall grows with the (proven-legitimate) answer
#                    size; pin = us per OUTPUT pair
#                    (test_jaccard_unit_cost_per_output_pair)
#   state-bounded-recurrence — a 3-round unrolled accept/suppress
#                    recurrence whose band state is K-invariant; a lost
#                    localCheckpoint compounds lineage and multiplies
#                    the per-document cost; pin = us per INPUT doc
#                    (test_ledger_twin_unit_cost_per_doc)
#   iterative-trainer — fixed-round unrolled training loop (Lloyd /
#                    BPE merge / MM / k-core peel); a lost
#                    localCheckpoint or a new second read of the
#                    previous round's state compounds the plan per
#                    round; pin = us per input row of the training
#                    table (test_trainer_unit_cost_per_input_row)
BUDGET_CLASSES = {
    "jaccard_prefix_filter_pairs": "output-bound",
    "neardup_suppression_ledger": "state-bounded-recurrence",
    "curation_funnel_batch_ledger": "state-bounded-recurrence",
    "pq_codebook_train": "iterative-trainer",
    "rq_two_stage_error": "iterative-trainer",
    "bpe_iterative_merges": "iterative-trainer",
    "bradley_terry_strengths": "iterative-trainer",
    "kcore_peeling_rounds": "iterative-trainer",
    "unigram_lm_train": "iterative-trainer",
    "unigram_viterbi_fertility": "iterative-trainer",
    "unigram_compression_curve": "iterative-trainer",
    "wordpiece_iterative_merges": "iterative-trainer",
}


def measure_pass(spark, qs) -> dict[str, float]:
    best: dict[str, float] = {}
    for name, fn in qs.items():
        fn(spark, SF).count()  # untimed warm rep (codegen/JIT)
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF).count()
            b = min(b, time.perf_counter() - t0)
        best[name] = b
    return best


def main() -> None:
    import __spark_entry__ as e

    from pinterest_data_pipeline6_spark.session import get_spark

    spark = get_spark("gen-steady", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    # warm the Python-worker pool once so the first Pandas-UDF query
    # doesn't absorb the per-core spawn cost
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    p1 = measure_pass(spark, qs)
    p2 = measure_pass(spark, qs)
    steady = {n: round(max(p1[n], p2[n]), 4) for n in sorted(qs)}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(steady, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}: {len(steady)} entries, "
          f"sum p1={sum(p1.values()):.1f}s p2={sum(p2.values()):.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
