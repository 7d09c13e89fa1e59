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


class _wide_plan_strings:
    """Temporarily raise ``spark.sql.debug.maxToStringFields`` (default
    25) while rendering a plan.  Spark truncates long expression trees
    in plan text with ``... N more fields`` — which can hide the very
    producer tokens ``nested_hof_filters`` and the low-cardinality
    exchange sweep grep for, silently false-negating the registry-wide
    hygiene sweeps on exactly the deep pipelines they guard."""

    KEY = "spark.sql.debug.maxToStringFields"

    def __init__(self, df: DataFrame):
        self.conf = df.sparkSession.conf

    def __enter__(self):
        self.old = self.conf.get(self.KEY, None)
        self.conf.set(self.KEY, "100000")

    def __exit__(self, *exc):
        if self.old is None:
            self.conf.unset(self.KEY)
        else:
            self.conf.set(self.KEY, self.old)


def executed_plan(df: DataFrame) -> str:
    """Physical plan string BEFORE adaptive re-optimization (the static
    plan Catalyst picked), rendered without field-count truncation."""
    with _wide_plan_strings(df):
        return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """Physical plan AFTER execution — includes AQE's final decisions
    (runs the query via a count-like no-op materialization), rendered
    without field-count truncation."""
    df.collect()
    with _wide_plan_strings(df):
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


# Columns whose distinct-value count is a small constant at ANY corpus
# size (enum-like labels, not ids): an Exchange that hash-partitions
# RAW rows solely on these keys funnels the whole input into a handful
# of reducers — and when a Window forces the co-location, map-side
# combining can't shrink it either. Aggregated rows (a HashAggregate
# below the exchange, partial or final) are fine: the shuffle then
# carries at most #distinct-keys rows per task.
LOW_CARDINALITY_COLUMNS = frozenset(
    {
        "event_type",
        "lang",
        "source",
        "pred_lang",
        "l_returnflag",
        "l_linestatus",
        "l_shipmode",
        "l_shipinstruct",
        "o_orderstatus",
        "o_orderpriority",
        "c_mktsegment",
        "p_brand",
        "p_container",
        "r_name",
    }
)


def _node_depth(line: str) -> int:
    """Depth of a node in Spark's plan-tree text = where the node name
    starts (after the ``:  +- `` tree art)."""
    i = 0
    while i < len(line) and line[i] in " :+-*(0123456789)":
        i += 1
    return i


def raw_low_cardinality_exchanges(plan: str) -> list[str]:
    """Scale-hygiene sweep: return every ``Exchange hashpartitioning``
    whose partition keys are ALL low-cardinality label columns and
    whose input subtree reaches a file scan without passing through any
    row-reducing node — i.e. a raw-row shuffle onto a handful of
    reducers (the ``freshness_lag_stats`` r4 anti-pattern). Walks the
    executed-plan text: for each flagged exchange, scan its subtree
    (deeper-indented lines until depth returns to the exchange's
    level); seeing a HashAggregate/ObjectHashAggregate/SortAggregate OR
    a WindowGroupLimit (the map-side top-k cut: the shuffle then
    carries ≤ k rows per key per map partition) before any FileScan
    means the shuffled rows were already reduced — fine. Returns the
    offending exchange lines (empty = clean)."""
    lines = plan.splitlines()
    flagged: list[str] = []
    for i, line in enumerate(lines):
        m = re.search(r"Exchange hashpartitioning\(([^)]*)\)", line)
        if not m:
            continue
        keys = {
            p.strip().split("#")[0]
            for p in m.group(1).split(",")
            if p.strip() and not p.strip().isdigit()
        }
        if not keys or not keys <= LOW_CARDINALITY_COLUMNS:
            continue
        depth = _node_depth(line)
        aggregated = False
        for sub in lines[i + 1 :]:
            if not sub.strip():
                continue
            if _node_depth(sub) <= depth:
                break  # left the exchange's subtree
            if re.search(r"\b((Hash|ObjectHash|Sort)Aggregate|WindowGroupLimit)\b", sub):
                aggregated = True
                break
            if "FileScan" in sub or "Scan ExistingRDD" in sub:
                break  # raw rows reached the exchange
        if not aggregated:
            flagged.append(line.strip())
    return flagged


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


def nested_hof_filters(plan: str) -> list[str]:
    """Scale-hygiene sweep: return every plan node — Filter, Generate,
    Project, Aggregate, ... — that re-computes a DERIVED ARRAY inside a
    lambda body.

    Why this exists: Spark evaluates a higher-order function's array
    argument once per row, but everything inside the lambda body once
    per ELEMENT. When an array-producing expression (transform / split
    / sequence / zip_with / array_distinct / array_sort / aggregate
    fold) appears inside a lambda, the full derived array is rebuilt
    per element — an O(n^2)-per-row interpreter loop. Two optimizer
    rules manufacture exactly that shape out of innocent-looking code:
    PushDownPredicate (a filter on a derived array column replays the
    column's defining expression inside the predicate) and
    InferFiltersFromGenerate (a plain explode gains inferred
    ``size(arr) > 0 AND arr IS NOT NULL`` filters carrying the same
    substitution), both usually landing below the repartition on a
    single input partition. winnowing_fingerprints measured
    260 s -> 1.2 s at sf0.1 when both were removed (cheap raw-column
    predicate + explode_outer + hash array materialized as a column).

    Attribute-based lambdas — exists/forall predicates, dot-product
    folds over an attribute array, ``slice(attr, i, k)`` window reads,
    per-element scalar hashing — have no array producer in the body
    and pass."""
    producers = (
        "transform(",
        "split(",
        "sequence(",
        "zip_with(",
        "aggregate(",
        "array_distinct(",
        "array_sort(",
        "array_repeat(",
        "shuffle(",
    )
    flagged = []
    for line in plan.splitlines():
        stripped = line.strip()
        bodies = []
        i = 0
        while True:
            j = line.find("lambdafunction(", i)
            if j == -1:
                break
            k = j + len("lambdafunction(") - 1
            depth = 0
            for p in range(k, len(line)):
                if line[p] == "(":
                    depth += 1
                elif line[p] == ")":
                    depth -= 1
                    if depth == 0:
                        bodies.append(line[k + 1 : p])
                        break
            i = j + 1
        if any(tok in body for body in bodies for tok in producers):
            flagged.append(stripped[:300])
    return flagged
