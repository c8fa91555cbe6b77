"""SparkSession factory tuned for the engine.

Scale posture: these configs are the single-JVM local equivalents of what the
job would set on a 1000-executor cluster — AQE on (runtime re-plan + skew-join
splitting), adaptive partition coalescing, Arrow for all pandas-UDF exchange,
and a shuffle-partition count sized to cores locally (on a real cluster:
~2-3x total cores, or leave to AQE initialPartitionNum).

Oversubscription note (measured, see BENCH.md §3): when concurrent Python
UDF workers exceed the *effective* core count (vCPUs minus SMT/steal — ~22
of 32 on this sandbox VM), throughput collapses 5-15x (scheduler/lock-holder
preemption, worker sys-time > user-time). The fix is the same knob a real
cluster uses for CPU-heavy Python stages: cap task concurrency with
``spark.task.cpus=2`` (local[32] + task.cpus=2 == local[16] throughput,
measured identical), rather than shrinking executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "insights-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
        )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # smaller Arrow batches keep per-task JVM buffers smooth when UDF
        # output fan-out is high (one input page → tens of element rows);
        # 10k-page batches at 32 concurrent tasks caused GC storms.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: the driver IS the executor — size it like one
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter join pruning: on a shuffle join with a
        # selective build side, inject might_contain(bloom(build keys)) into
        # the fact-side SCAN — a semi-join reduction that skips shuffling
        # fact rows that cannot match. Default size thresholds (10 GB
        # application side) keep it dormant at test scale and activate it
        # exactly where it pays at 100 TB; tests/test_plans.py pins the
        # injection with thresholds lowered.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Split sizing for CPU-DENSE columnar text (measured, r4/r5): parquet
        # compresses web text ~10×, and Spark sizes file splits by
        # COMPRESSED bytes — maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes/minPartitionNum)). The r4 fix
        # lowered BOTH knobs; measurement this round showed only the
        # open-cost FLOOR matters for the small hot text tables (584 KB -
        # 6 MB compressed → the totalBytes/cores term is already < 256 KiB,
        # so the floor alone yields the same 24-of-32-core fan-out the 1 MiB
        # ceiling did), while the 1 MiB *ceiling* was actively wrong at the
        # 100 TB posture (10⁸ splits per table) and already wrong at sf1
        # (135 splits for a 135 MB fact table vs 32 with the default
        # ceiling). So: ceiling stays at Spark's 128 MiB default — inert
        # locally, correct at scale — and only the floor is lowered. Split
        # counts verified r5: sf1 documents 24 (unchanged), sf1 lineitem
        # 32 (was 135).
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    return b.getOrCreate()
