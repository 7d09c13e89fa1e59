"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap count() action (no driver collect of
the full result). Times include Catalyst planning + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(path: str) -> float:
    tag = os.path.basename(path.rstrip("/"))
    try:
        return float(tag.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pinterest_data_pipeline6_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("bench")
    qs = e.queries()

    # warm the JVM + parquet footer caches once so per-query numbers
    # measure the plan, not first-touch JIT
    next(iter(qs.values()))(spark, SF_DIR).count()
    # ...and the Python-worker pool: the first Pandas-UDF stage otherwise
    # pays one worker spawn per core (~10 s on local[32]) — a fixed local
    # startup cost, not a property of any query's plan
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    # best-of-2 per query: the first execution of a plan pays one-time
    # JIT/codegen compilation (a fixed cost amortized away on any real
    # workload); the min measures the steady-state latency of the plan
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_label(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
