"""SparkSession factory tuned for this engine.

Scale posture: the same builder settings are what we would ship on a
1000-executor cluster — AQE (runtime re-plan, skew-join splitting,
partition coalescing) on, broadcast threshold explicit, shuffle
partitions env-tunable (32 for local[32] tests; thousands on a real
cluster), Arrow enabled for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "pinterest_data_pipeline6_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    Config rationale (each matters at 100 TB, not just locally):
    - ``spark.sql.adaptive.enabled`` + skewJoin: runtime re-planning turns
      skewed shuffle joins into split subjoins and coalesces tiny
      post-shuffle partitions.
    - ``spark.sql.autoBroadcastJoinThreshold``: dims (region/nation/
      supplier-scale tables) broadcast instead of shuffling the fact side.
    - ``spark.sql.files.maxPartitionBytes`` 128m: scan parallelism that
      keeps per-task memory bounded on wide parquet.
    - ``spark.sql.shuffle.partitions``: 32 locally; on a cluster this is
      sized ~2-3x total cores (AQE coalesces down when partitions are small).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's parallelism-first coalescing targets max(shuffleBytes /
        # defaultParallelism, minPartitionSize). The 1m default floor
        # serializes small-but-CPU-heavy post-shuffle stages (candidate
        # verification, codebook assignment, fold projections) onto 1-2
        # tasks whenever a shuffle carries < ~32 MB — measured 2-2.5x
        # on the pair-verify and ANN queries at sf0.1. At cluster scale
        # shuffleBytes/parallelism >> 1m, so the floor never binds and
        # this is a no-op; it is env-tunable for operators who want the
        # stock floor back.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        # guide §9/§3.1: let the planner pick shuffled-hash join when its
        # build-side size conditions hold instead of always sort-merge —
        # drops the two per-partition sorts from every equi-join whose
        # build side fits (measured 1.5-2x on the join-heavy event/fact
        # queries; the planner's own size checks still gate the choice,
        # so a build side that cannot fit falls back to sort-merge).
        # AQE additionally rewrites an already-planned SMJ to SHJ when
        # every post-shuffle partition is under the local-map threshold.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", "64m"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # full PushedFilters/ReadSchema in plan text (default truncates at
        # 100 chars, which breaks plan-shape assertions in tests)
        .config("spark.sql.maxMetadataStringLength", "2000")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: driver heap IS the executor heap for all 32 task
        # threads — 8g thrashes GC once a few dozen stages have run;
        # size it to the box (128 GiB here). On a real cluster this
        # setting moves to spark.executor.memory per-node.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # whole-stage codegen emits a new class per query stage; across a
        # long-lived session the JIT's default 240 MB code cache fills and
        # the sweeper starts flushing/deoptimizing hot methods (measured
        # 10x latency spikes on HOF-heavy plans ~40 queries in). 1 GB +
        # explicit flushing keeps compiled code resident.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        # no [Stage ...] progress bars on stderr: the driver's bench
        # capture keeps only the last ~2000 chars of output, and
        # progress art was crowding out the JSON headline line
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
