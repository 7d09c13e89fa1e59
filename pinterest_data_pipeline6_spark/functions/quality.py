"""Pipeline data-quality instrumentation via ``DataFrame.observe`` —
named accumulator metrics collected DURING an action, with zero extra
scans.

The reference verifies data by eyeballing ``display(df)`` after every
step (SURVEY.md §5.1); this is the production replacement: every batch
run can assert row counts, null rates, and domain violations from the
metrics of the job it already ran. At 100 TB an extra validation scan
is hours — ``observe`` metrics are aggregated map-side inside the
existing job, so quality checking is free.

Streaming twin: the same ``Observation``-style metrics surface per
micro-batch via ``StreamingQueryListener``/``lastProgress`` — the
``observe`` call is identical on an unbounded DataFrame.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    name: str = "quality",
    not_null: tuple[str, ...] = (),
    positive: tuple[str, ...] = (),
) -> tuple[DataFrame, Observation]:
    """Attach free quality metrics to ``df``: total rows, per-column
    null counts for ``not_null``, and non-positive counts for
    ``positive``. Returns (instrumented df, observation); read
    ``observation.get`` AFTER an action has run the plan."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    for c in positive:
        metrics.append(
            F.sum(F.when(F.col(c) <= 0, 1).otherwise(0)).alias(f"n_nonpos_{c}")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def check_quality(
    metrics: dict[str, Any],
    max_null_rate: float = 0.0,
    max_nonpos_rate: float = 0.0,
) -> list[str]:
    """Evaluate observed metrics against thresholds; returns the list
    of violation messages (empty = clean)."""
    n = metrics.get("n_rows", 0) or 0
    violations: list[str] = []
    if n == 0:
        return ["n_rows == 0"]
    for key, val in metrics.items():
        if key.startswith("n_null_") and val / n > max_null_rate:
            violations.append(f"{key}: {val}/{n} exceeds null-rate {max_null_rate}")
        if key.startswith("n_nonpos_") and val / n > max_nonpos_rate:
            violations.append(f"{key}: {val}/{n} exceeds non-positive rate {max_nonpos_rate}")
    return violations
