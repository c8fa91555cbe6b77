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
        """Write per-partition row counts for a stage (in optional).

        Fully distributed — the counts DataFrame is written directly, never
        collected to the driver, so 10⁵-partition stages cost the executors
        one narrow aggregation and the driver nothing. The in-side is
        full-outer joined so a partition whose rows were ALL dropped still
        appears (rows_in>0, rows_out=0) — that row IS the extraction-drop
        signal. A (-1, 0, 0) sentinel row is always appended so `read()`
        proves the stage ran even when it produced zero partitions; it
        carries zero counts (sums unaffected) and per-partition readers
        (`skew_report`) exclude it.
        """
        out_c = partition_counts(df_out).withColumnRenamed("rows", "rows_out")
        if df_in is not None:
            in_c = partition_counts(df_in).withColumnRenamed("rows", "rows_in")
            j = out_c.join(in_c, "_pid", "full_outer").select(
                "_pid",
                F.coalesce("rows_in", F.lit(0)).alias("rows_in"),
                F.coalesce("rows_out", F.lit(0)).alias("rows_out"),
            )
        else:
            j = out_c.select(
                "_pid", F.lit(None).cast("long").alias("rows_in"), "rows_out"
            )
        counts = j.select(
            F.lit(self.run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("_pid").cast("int").alias("partition_id"),
            F.col("rows_in").cast("long"),
            F.col("rows_out").cast("long"),
            F.lit(sequence).cast("long").alias("sequence"),
        )
        sentinel = self.spark.createDataFrame(
            [(self.run_id, stage, -1, 0, 0, sequence)], LINEAGE
        )
        counts.unionByName(sentinel).coalesce(1).write.mode("append").parquet(
            self.path
        )

    def read(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE).parquet(self.path)

    def skew_report(self, stage: str) -> DataFrame:
        """Partition row-count spread for one stage — max/median ratio."""
        lin = self.read().filter(
            (F.col("stage") == stage) & (F.col("partition_id") >= 0)
        )
        return lin.agg(
            F.max("rows_out").alias("max_rows"),
            F.expr("percentile_approx(rows_out, 0.5)").alias("p50_rows"),
            F.count(F.lit(1)).alias("partitions"),
        )
