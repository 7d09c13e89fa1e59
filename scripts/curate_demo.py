"""End-to-end LLM corpus curation demo — the engine driven as a user
would drive it, from raw documents to training-ready shards with an
auditable card. Chains the registry operators in their production
order and prints each gate's ledger:

  1. quality + dedup funnel      corpus_curation_pipeline
  2. benchmark decontamination   decontamination_overlap (exact 8-gram)
                                 + semantic_decontamination (embedding LSH)
  3. source mixture weights      source_mixture_weights
  4. boilerplate + novelty audit boilerplate_ngram_stats, ngram_novelty_profile
  5. dataset card + hash shards  write_dataset_card, write_training_shards
  6. split accounting            dataset_split_counts

Every stage is deterministic (hash-gated sampling, min-doc_id
representatives), so re-running on the same input reproduces the card
byte-for-byte — the reproducibility contract training pipelines need.

Run: python scripts/curate_demo.py [sf_dir] [out_dir]
     (defaults: /root/testdata/sf0.01, a temp dir)
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pinterest_data_pipeline6_spark.operators import curation, dedup, privacy
    from pinterest_data_pipeline6_spark.session import get_spark
    from pinterest_data_pipeline6_spark.sources.readers import table

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curate_demo_")
    spark = get_spark("curate-demo")

    print(f"== curating {sf} -> {out}\n")

    print("-- 1. quality + dedup funnel (per lang, source; first 10 rows)")
    curation.corpus_curation_pipeline(spark, sf).show(10, truncate=False)

    print("-- 2a. exact 8-gram benchmark decontamination (per lang)")
    privacy.decontamination_overlap(spark, sf).show(truncate=False)

    print("-- 2b. semantic (embedding-LSH) decontamination (per label)")
    privacy.semantic_decontamination(spark, sf).show(truncate=False)

    print("-- 3. temperature-scaled source mixture")
    privacy.source_mixture_weights(spark, sf).show(5, truncate=False)

    print("-- 4a. boilerplate phrase audit (per source, first 5)")
    dedup.boilerplate_ngram_stats(spark, sf).show(5, truncate=False)

    print("-- 4b. n-gram novelty profile (per source, first 5)")
    dedup.ngram_novelty_profile(spark, sf).show(5, truncate=False)

    print("-- 5. dataset card + hash-shard export")
    manifest = curation.write_dataset_card(spark, sf, f"{out}/card")
    print(f"card manifest: {manifest}")
    n = curation.write_training_shards(table(spark, sf, "documents"), f"{out}/shards")
    print(f"wrote {n} hash shards under {out}/shards")

    print("\n-- 6. train/val/test split accounting (first 10 rows)")
    curation.dataset_split_counts(spark, sf).show(10, truncate=False)

    print(f"\n== done; artifacts under {out}")
    spark.stop()


if __name__ == "__main__":
    main()
