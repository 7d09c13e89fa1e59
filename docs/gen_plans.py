"""Regenerate PLANS.md: formatted physical plans of representative
queries at sf0.01, annotated with the property each plan is expected to
exhibit (the same properties tests/test_plans.py asserts).

Run: python docs/gen_plans.py  (from the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

# (query name, the plan property worth reading the plan for)
SHOWCASE = [
    ("q1_category_per_country", "dimension joins broadcast; partial+final hash agg"),
    ("scan_filter_project", "PushedFilters + pruned ReadSchema reach the parquet scan"),
    ("q3b_global_top_account", "ORDER BY .. LIMIT 1 compiles to TakeOrderedAndProject"),
    ("minhash_band_pairs", "band self-join is a hash equi-join; signature agg is one shuffle"),
    ("grouping_sets_revenue", "four granularities in ONE Expand over ONE scan"),
    ("lateral_top2_orders", "correlated LATERAL LIMIT decorrelates to a rank window"),
    ("exists_segment_activity", "EXISTS/NOT EXISTS become LeftSemi/LeftAnti hash joins"),
    ("corpus_curation_pipeline", "the full curation funnel stays in one Catalyst DAG"),
    ("curriculum_deciles", "exact ntile, fully lazy: range partition + per-partition rank; the offsets prefix-sum is a ReusedExchange branch whose only SinglePartition exchange moves #partitions scalar count rows"),
    ("rfm_segments", "GROUPED ntile: three quartile orderings in ONE range shuffle of stacked (metric, score, key) triples; prefix-sums partition by metric — no SinglePartition anywhere"),
    ("k_anonymity_report", "privacy audit: QI-keyed agg (shuffle carries classes, not people) + band re-agg — no join, no window"),
    ("sequence_packing_bins", "cumulative window keyed (lang, shard) — packing never funnels through one task"),
    ("bigram_perplexity_buckets", "instance stream reduced per doc BEFORE the LM join; LM side is vocabulary-bounded"),
    ("neardup_edit_verify", "LSH candidates only: every join hash equi — no nested loop around the Levenshtein"),
    ("dq_expectations", "five rules in ONE orders aggregate; both cross-table rules share ONE lineitem join"),
    ("skyline_docs", "dominance window runs over the groupBy(m1) aggregate; skyline set broadcasts back"),
    ("pagerank_bipartite", "three fixed rounds compile to one lazy DAG of equi-joins + partial-agg shuffles"),
    ("dq_column_profile", "distinct counts hash-aggregate on the narrow (cid, v) pair key — no wide-key SortAggregate"),
    ("minhash_estimate_error", "signatures ride THROUGH the band self-join (ReusedExchange); exact-verify joins stay keyed on the candidate set"),
    ("bpe_merge_candidates", "corpus reduced to the word-frequency table FIRST; pair counting runs over the vocabulary; top-20 is TakeOrderedAndProject"),
    ("semantic_decontamination", "benchmark embeddings broadcast; contamination join keyed on the LSH bucket — corpus never shuffles"),
    ("volume_shipping_pairs", "both nation dims broadcast-attach before the single fact-fact shuffle on orderkey"),
    ("bloom_prune_stats", "the 256-word Bloom bitset broadcasts to the probe; verdicts are one partial+final agg on the probe key"),
    ("cms_frequency_estimates", "exploded sketch cells collapse map-side (partial+final pair); the 2048-row sketch broadcasts to the top-k probe"),
    ("gapfill_hourly_interpolate", "event_type filter pushed to the scan; hourly agg partial+final; the fill window spans only the span-bounded calendar"),
    ("snapshot_diff_cdc", "ONE full-outer hash join on the key over two pre-projected pushed-filter scans; no window"),
    ("cogroup_order_reconciliation", "FlatMapCoGroupsInPandas keyed on the fixed 256-key bucket; both scans pruned to the reconcile columns"),
    ("freshness_lag_stats", "r5 fix: per-type watermark is a partial-aggregated groupBy broadcast-joined back — NO exchange ever hash-partitions raw event rows on the #types-value key (the r4 raw-row window did)"),
    ("token_gini_per_lang", "r5 fix: exact per-language Gini rank rides _distributed_rank (range shuffle + prefix-sum offsets, ReusedExchange) — no per-language single-task sort"),
    ("jaccard_prefix_filter_pairs", "EXACT Jaccard self-join: only each doc's rarest prefix tokens enter the inverted-index equijoin; PPJoin size+positional filters prune inside the join; verify joins stay hash-keyed — no nested loop anywhere"),
    ("trailing_distinct_users", "sliding DISTINCT reduced to (user, day) first; x7 coverage explode applies to the reduced relation; the observed-day calendar broadcasts"),
    ("embedding_centroid_shift", "one posexplode scan to decimal-exact (label, dim) cells; the per-dim global centroid (a second tiny agg) broadcasts back — vectors never join"),
    ("late_ship_order_priorities", "TPC-H Q4: the correlated EXISTS decorrelates to a LeftSemi hash join; the quarter filter is pushed to the orders parquet scan"),
    ("late_arrival_accounting", "watermark lateness: running prefix-max over arrival order distributes as range shuffle + per-partition window + broadcast prefix-max of the #partitions-row max table (ReusedExchange) — no global sort"),
    ("trending_topk_snapshot", "per-window top-k compiles to WindowGroupLimit: the rank exchange carries at most k rows per window per map partition"),
    ("label_propagation_communities", "two synchronous LPA rounds in ONE lazy DAG: edge⋈label equijoins + plurality via max(struct) aggregates — no label-column window"),
    ("lineitem_corr_matrix", "6-pair Pearson matrix: ONE pruned scan with IsNotNull PushedFilters, ONE partial+final agg carrying all 15 decimal moment sums, the matrix exploded from the single result row"),
    ("shewhart_control_limits", "SPC limits: events reduce to #types x #days in one agg; the moment sums ride a window over that bounded aggregate — one scan, no join"),
    ("kendall_tau_daily", "tau-b: the O(days^2) concordance join runs on the bounded daily aggregate; tie corrections are two more tiny aggs broadcast back"),
]


def main() -> None:
    from pinterest_data_pipeline6_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("gen-plans")
    qs = entry.queries()
    out = [
        "# Physical plan snapshots (generated by docs/gen_plans.py at sf0.01)",
        "",
        "Each section lists the plan property the query is designed around —",
        "`tests/test_plans.py` asserts these properties; this file lets a",
        "reviewer read the actual plans without running Spark.",
        "",
    ]
    for name, why in SHOWCASE:
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Why this plan matters:** {why}")
        out.append("")
        out.append("```")
        out.append(plan.strip())
        out.append("```")
        out.append("")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
