"""Scaling + SKEW measurement for the round-9 additions (perceptual
hashing, byte-window fingerprints, quality classifier) plus the
skew-adversarial protocol the r8 verdict asked for.

Part 1 — K-replication curves (protocol:
scale_r5w2_families_experiment.replicate_r5w2, verbatim doc text):

- perceptual hashes: row-local projections, linear scan wall; under
  verbatim replication every hash is K-plicated, so the band join's
  bucket sizes grow Kx — candidate pairs grow ~K² BY CONSTRUCTION
  (every copy matches every copy; real corpora don't replicate
  verbatim).  The inventory/bit-stability entries stay bounded-output.
- fingerprints: gram explode linear; the FP_MAX_DF stop cut is the
  guard being measured — replication pushes shared fingerprints' df
  ABOVE the cut, so pair work collapses instead of exploding.
- classifier: pure map + two bounded aggs — the flattest curve here.

Part 2 — HOT-KEY adversaries (new in r9; volume replication proves
linear scaling but not skew tolerance):

- hot paragraph: one fixed PARA_TOKENS-word template prepended to 10%
  of documents — ONE paragraph hash then owns 10% of all chunk
  occurrences.  The first-occurrence agg must stay a partial+final
  hash agg (map-side combine collapses the hot hash to one row per
  task BEFORE the shuffle), so wall stays at the x1 level; the plan is
  asserted to carry partial_min and no driver-side collect.
- hot user-day: 10% of events remapped onto ONE (user, day, type) —
  the preference fact agg's hot key.  Same defense: partial_sum
  pre-aggregates per task; the downstream type-pair self-join runs on
  the (user, day)-aggregated table where the hot key is ONE row.

Run: python scripts/scale_r9_families_experiment.py [K ...]
(default: 1 5 10, then the two hot-key variants)
"""

from __future__ import annotations

import importlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from scale_r5w2_families_experiment import replicate_r5w2  # noqa: E402

SF = "/root/testdata/sf0.1"

OPS = (
    ("multimodal", "perceptual_ahash_inventory"),
    ("multimodal", "perceptual_hash_band_pairs"),
    ("multimodal", "perceptual_dual_hash_agreement"),
    ("multimodal", "perceptual_hash_bit_stability"),
    ("multimodal", "media_fingerprint_minima"),
    ("multimodal", "media_fingerprint_band_pairs"),
    ("multimodal", "media_fingerprint_containment"),
    ("multimodal", "media_meta_consistency"),
    ("scoring", "quality_classifier_scores"),
    ("scoring", "quality_classifier_gate_ledger"),
    ("scoring", "quality_classifier_calibration"),
    ("scoring", "hashed_feature_buckets"),
)

HOT_PARA = " ".join(f"hotpara{i}" for i in range(12))  # one PARA_TOKENS chunk


def make_hot_paragraph_dir(spark) -> str:
    """documents with the SAME 12-token paragraph prepended to 10% of
    docs: one paragraph hash owns ~10% of chunk occurrences."""
    out = "/tmp/r9skew_hotpara"
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hot = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.lit(HOT_PARA + " "), F.col("text")),
    ).otherwise(F.col("text"))
    docs.withColumn("text", hot).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def make_hot_userday_dir(spark) -> str:
    """events with 10% of rows remapped onto ONE (user, day, type)."""
    out = "/tmp/r9skew_hotuser"
    ev = spark.read.parquet(f"{SF}/events.parquet")
    hot = F.col("event_id") % 10 == 0
    (
        ev.withColumn(
            "user_id", F.when(hot, F.lit(0)).otherwise(F.col("user_id"))
        )
        .withColumn(
            "ts",
            F.when(hot, F.lit("2024-01-01 00:00:00").cast("timestamp"))
            .otherwise(F.col("ts")),
        )
        .withColumn(
            "event_type",
            F.when(hot, F.lit("click")).otherwise(F.col("event_type")),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    return out


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


def assert_skew_safe_plan(spark, modname: str, op: str, d: str,
                          partial_token: str) -> None:
    """The hot key must die in the map-side partial aggregate, and the
    plan must never fall back to a driver-side or all-pairs shape."""
    mod = importlib.import_module(
        f"pinterest_data_pipeline6_spark.operators.{modname}"
    )
    df = mod.QUERIES[op](spark, d)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert partial_token in plan, (
        f"{op}: no map-side combine ({partial_token}) — the hot key "
        "would ship every occurrence through the shuffle"
    )
    assert "CartesianProduct" not in plan, f"{op}: cartesian under skew"
    assert "CollectLimit" not in plan, f"{op}: driver-side path under skew"
    print(f"{op}: skew-safe plan OK ({partial_token} present)", flush=True)


def main() -> None:
    from pinterest_data_pipeline6_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("r9scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    for k in ks:
        d = replicate_r5w2(spark, k)
        print(f"--- x{k} ({d})", flush=True)
        for modname, op in OPS:
            run_op(spark, modname, op, d, f"x{k}")

    print("--- hot-key adversaries (sf0.1 base)", flush=True)
    base = SF
    hp = make_hot_paragraph_dir(spark)
    hu = make_hot_userday_dir(spark)
    for modname, op, dvar in (
        ("dedup", "ccnet_paragraph_dedup_stats", hp),
        ("dedup", "boilerplate_para_removal_by_source", hp),
        ("preference", "bradley_terry_strengths", hu),
        ("preference", "pairwise_preference_matrix", hu),
    ):
        run_op(spark, modname, op, base, "base")
        run_op(spark, modname, op, dvar, "hot10%")
    assert_skew_safe_plan(
        spark, "dedup", "ccnet_paragraph_dedup_stats", hp, "partial_min"
    )
    # bradley_terry's own executed plan starts AT its localCheckpoint
    # lineage cut, so the fact aggregate (where the hot user-day must
    # die map-side) is asserted on the comparison builder directly.
    from pinterest_data_pipeline6_spark.operators.preference import (
        _comparisons,
    )

    cdf = _comparisons(spark, hu)
    cdf.count()
    cplan = cdf._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in cplan, (
        "preference fact agg lost its map-side combine — the hot "
        "user-day would ship every event through the shuffle"
    )
    assert "CartesianProduct" not in cplan
    print("preference _comparisons: skew-safe plan OK (partial_sum "
          "present)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
