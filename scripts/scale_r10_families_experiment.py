"""Scaling measurement for the round-10 additions: unigram-LM
Viterbi-EM, data-constrained accounting, cross-modal pair operators,
NSW beam search, and the classifier gate ledger.

K-replication curves (protocol: scale_r5w2_families_experiment.
replicate_r5w2 — key-shifted fact/embedding copies, document text
verbatim):

- unigram family: the corpus collapses to the distinct-WORD table
  first, and verbatim replication leaves that table IDENTICAL (only
  freq scales Kx) — EM rounds and Viterbi passes are flat by
  construction; the linear part is the one corpus scan into `words`.
  This is the measurement that justifies the train-on-the-vocabulary
  design at 100 TB.
- data-constrained accounting: one scan to a 1-row aggregate +
  literal spines; the flattest possible shape.
- cross-modal pairs: both candidate generators are band joins —
  verbatim replication K-plicates every hash, so candidate pairs grow
  ~K^2 BY CONSTRUCTION (the r9 perceptual caveat); the cross-modal
  intersection itself stays proportional to the candidate sets.
- nsw_beam_search_recall: the graph is built over the capped node
  subset (vec_id < NSW_NODE_CAP) and queried by N_QUERIES broadcast
  vectors, so the whole entry is bounded — the curve should be flat
  and any slope is scan overhead.
- classifier_gate_stream_ledger: map-only gate + bounded ledger agg.

Run: python scripts/scale_r10_families_experiment.py [K ...]
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
    ("textops", "unigram_lm_train"),
    ("textops", "unigram_viterbi_fertility"),
    ("textops", "unigram_compression_curve"),
    ("curation", "epoch_token_value_decay"),
    ("curation", "data_constrained_tradeoff"),
    ("multimodal", "crossmodal_pair_dedup"),
    ("multimodal", "caption_media_consistency"),
    ("multimodal", "crossmodal_contamination"),
    ("similarity", "nsw_beam_search_recall"),
    ("scoring", "classifier_gate_stream_ledger"),
)


def run_op(spark, modname: str, op: str, d: str, label: str) -> None:
    mod = importlib.import_module(
        f"pinterest_data_pipeline6_spark.operators.{modname}"
    )
    fn = mod.QUERIES[op]
    best, rows = float("inf"), -1
    for _ in range(2):
        t0 = time.perf_counter()
        rows = fn(spark, d).count()
        best = min(best, time.perf_counter() - t0)
    print(f"{op:34s} {label:8s} {best:8.2f}s  rows={rows}", flush=True)


def main() -> None:
    from pyspark.sql import SparkSession

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k in ks:
        d = replicate_r5w2(spark, k)
        for modname, op in OPS:
            run_op(spark, modname, op, d, f"x{k}")
    spark.stop()


if __name__ == "__main__":
    main()
