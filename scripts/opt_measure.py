"""Optimization measurement harness (rounds 10/11).

Times individual registry queries with the SAME methodology as bench.py
(warm session, best-of-N ``count()`` per the frozen bench contract) and
captures ``explain("formatted")`` per query so plan-shape claims in
OPTIMIZATION_r*.md are backed by committed artifacts.

Usage:
    python scripts/opt_measure.py q1_category_per_country dedup_clusters
    python scripts/opt_measure.py --top 25            # 25 slowest per BENCH_DETAIL.json
    python scripts/opt_measure.py --all               # every registry entry
    python scripts/opt_measure.py --plans-tag before --top 25   # also dump plans
    python scripts/opt_measure.py --split q1_...      # construction vs execution

Plans go to plans/$OPT_PLANS_DIR/<query>_<tag>.txt (default r11).
Timings print as one JSON line and append to /tmp/opt_measure_history.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("OPT_REPS", "3"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_tag = None
    if "--plans-tag" in args:
        i = args.index("--plans-tag")
        plans_tag = args[i + 1]
        del args[i : i + 2]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    split = "--split" in args
    if split:
        args.remove("--split")

    from pinterest_data_pipeline6_spark.session import get_spark

    import __spark_entry__ as e

    qs = e.queries()
    if "--all" in args:
        names = list(qs)
    elif "--top" in args:
        i = args.index("--top")
        n = int(args[i + 1])
        detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
        ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
        # filter to live registry entries FIRST, then slice, so stale
        # BENCH_DETAIL rows cannot shrink the measured set below N
        names = [k for k, _ in ranked if k in qs][:n]
    else:
        names = args
    missing = [n for n in names if n not in qs]
    assert not missing, f"unknown queries: {missing}"

    spark = get_spark("opt_measure")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py: JVM/codegen + Python worker pool
    for fn in list(qs.values())[:5]:
        fn(spark, SF_DIR).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    plans_dir = os.environ.get("OPT_PLANS_DIR", "r11")
    results: dict[str, float] = {}
    construct: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_measure: {name}")
        best = float("inf")
        best_c = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            best = min(best, time.perf_counter() - t0)
            best_c = min(best_c, t1 - t0)
        results[name] = round(best, 4)
        if split:
            construct[name] = round(best_c, 4)
        if plans_tag:
            import contextlib
            import io

            os.makedirs(os.path.join(REPO, "plans", plans_dir), exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            with open(
                os.path.join(REPO, "plans", plans_dir, f"{name}_{plans_tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        extra = f"  (construct {construct[name]:6.3f})" if split else ""
        print(f"{results[name]:8.3f}  {name}{extra}", file=sys.stderr, flush=True)
    spark.sparkContext.setJobDescription(None)

    payload = {"sf_dir": SF_DIR, "reps": REPS, "noop": noop, "queries": results}
    if split:
        payload["construct"] = construct
    line = json.dumps(payload, separators=(",", ":"))
    print(line)
    with open("/tmp/opt_measure_history.jsonl", "a") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
