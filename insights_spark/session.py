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
        # Split sizing for CPU-DENSE columnar text (measured, r4): parquet
        # compresses web text ~10×, and Spark sizes file splits by
        # COMPRESSED bytes — maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes/cores)). A 50k-doc text table
        # compresses to ~7 MB → 2 splits → every interpreted-HOF / Arrow
        # text kernel runs on 2 of 32 cores (lang_id measured 23.6 s; same
        # table at proper parallelism ~2 s). Lowering the split ceiling and
        # the open-cost floor keys parallelism to DECOMPRESSED CPU cost:
        # 1 MiB ceiling still gives a 100 MB fact table ~100 splits (fine)
        # while small hot text tables fan out to ~file/256 KiB tasks. On a
        # real cluster with many files per table this matters less; the
        # knob is the honest single-file equivalent.
        .config("spark.sql.files.maxPartitionBytes", str(1 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    return b.getOrCreate()
