"""Physical-plan inspection helpers.

The engine adds no custom Catalyst rules (SURVEY.md §4: every operator
maps to a stock primitive) — what it DOES own is the obligation that
the plans Catalyst produces are the plans you'd want at 100 TB:
filters reaching the parquet scan, tight ReadSchema, dims broadcast,
top-k compiled to TakeOrderedAndProject, hot expressions inside
whole-stage codegen. These helpers make those properties assertable in
tests (tests/test_plans.py) so a regression in plan shape fails CI,
not a production run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Physical plan string BEFORE adaptive re-optimization (the static
    plan Catalyst picked)."""
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """Physical plan AFTER execution — includes AQE's final decisions
    (runs the query via a count-like no-op materialization)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True if the parquet scan received a pushed filter on ``column``."""
    plan = executed_plan(df)
    return any(
        column in m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
    )


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read from each parquet scan (column-pruning
    check: a 2-column projection must not scan 11 columns). Parsed from
    the FileScan output list — the ReadSchema string is truncated in
    plan text."""
    plan = executed_plan(df)
    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", plan):
        cols = {c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    """ORDER BY .. LIMIT k must compile to top-k, never a global sort."""
    return "TakeOrderedAndProject" in executed_plan(df)


def wholestage_codegen_count(df: DataFrame) -> int:
    """Codegen stage count. AQE plans only annotate codegen stages
    (``*(n)``) once finalized, so this materializes the query first."""
    plan = executed_plan(df)
    if "AdaptiveSparkPlan" in plan:
        plan = final_plan(df)
    return len(set(re.findall(r"\*\(\d+\)", plan)))


def plan_audit(df: DataFrame) -> dict:
    """One-call cost audit of a DataFrame's physical plan — the numbers
    a reviewer asks about before shipping a query to a 1000-executor
    cluster, parsed from the executed plan:

    - ``n_scans`` / ``scan_columns``: file scans and what each reads
      (column pruning);
    - ``n_exchanges``: shuffle count — each is a full network pass;
    - ``n_broadcasts``: broadcast exchanges (small-side joins);
    - ``has_cartesian`` / ``has_bnlj``: nested-loop hazards;
    - ``take_ordered``: top-k compiled without a global sort;
    - ``pushed_filters``: predicates that reached the scans.

    Text parsing keeps it dependency-free and version-tolerant; the
    same properties are pinned per-operator in tests/test_plans.py —
    this function is the interactive/reporting form.
    """
    plan = executed_plan(df)
    return {
        "n_scans": plan.count("FileScan parquet"),
        "scan_columns": [sorted(s) for s in read_schema_columns(df)],
        "n_exchanges": len(re.findall(r"Exchange (?!SinglePartition)", plan))
        + plan.count("Exchange SinglePartition"),
        "n_single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "n_broadcasts": plan.count("BroadcastExchange"),
        "has_cartesian": "CartesianProduct" in plan,
        "has_bnlj": "BroadcastNestedLoopJoin" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
    }
