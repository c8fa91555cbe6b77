"""Per-partition lineage + row-count metrics (north_rule X13).

The reference's only observability is progress prints
(changesetmd.py:152-153, osmh.py:516-522). The engine writes one lineage
row per (run_id, stage, partition_id) with rows_in/rows_out so that
- skew is visible (a hot partition shows up as a row-count outlier),
- extraction drops are visible (rows_in vs rows_out per partition),
- resumable runs can be audited against checkpoints.

Implementation: `observe()`-style accumulation is per-query not
per-partition, so we use a mapPartitions-shaped pass: `count_partition`
tags every row with its partition id (pure column expr —
spark_partition_id), and `capture` aggregates to one row per partition.
This costs one extra narrow aggregation per observed stage, nothing else —
the observed DataFrame itself is passed through unchanged.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import LINEAGE


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def partition_counts(df: DataFrame) -> DataFrame:
    """(partition_id, rows) of a DataFrame — one narrow pass."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("rows"))
    )


class LineageLog:
    def __init__(self, spark: SparkSession, path: str, run_id: str | None = None):
        self.spark = spark
        self.path = path
        self.run_id = run_id or new_run_id()

    def record(self, stage: str, df_in: DataFrame | None, df_out: DataFrame,
               sequence: int | None = None) -> None:
        """Write per-partition row counts for a stage (in optional)."""
        out_counts = partition_counts(df_out).collect()
        in_by_pid: dict[int, int] = {}
        if df_in is not None:
            in_by_pid = {r["_pid"]: r["rows"] for r in partition_counts(df_in).collect()}
        rows = [
            (
                self.run_id,
                stage,
                int(r["_pid"]),
                int(in_by_pid.get(r["_pid"], 0)) if df_in is not None else None,
                int(r["rows"]),
                sequence,
            )
            for r in out_counts
        ]
        if not rows:
            rows = [(self.run_id, stage, -1, 0, 0, sequence)]
        self.spark.createDataFrame(rows, LINEAGE).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE).parquet(self.path)

    def skew_report(self, stage: str) -> DataFrame:
        """Partition row-count spread for one stage — max/median ratio."""
        lin = self.read().filter(F.col("stage") == stage)
        return lin.agg(
            F.max("rows_out").alias("max_rows"),
            F.expr("percentile_approx(rows_out, 0.5)").alias("p50_rows"),
            F.count(F.lit(1)).alias("partitions"),
        )
