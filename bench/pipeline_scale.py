"""One end-to-end warehouse pipeline pass at 10× the §2b input.

BENCH.md §2b measures jobs/pipeline.py at 96k pages; this script runs the
IDENTICAL job at 960k pages (10×) and reports wall time plus the
per-stage lineage row counts the pipeline itself wrote — the closest
in-sandbox proxy for "the warehouse path holds its plan at 100×": if any
stage's plan degraded super-linearly (a collapsed-parallelism sink, a
re-executed ingest, an accidental cartesian), the 10× wall time and the
lineage row ratios expose it.

    python bench/pipeline_scale.py [--pages N] [--cpus 16]

Prints one JSON line: {pages, cpus, sec, pages_per_sec, lineage:
{stage: {rows_in, rows_out, partitions}}, tables: {name: rows}}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def ensure_pages(n_pages: int) -> str:
    path = f"/tmp/spark_graft_pages_parquet_{n_pages}"
    if os.path.isdir(path):
        return path
    from insights_spark import synth
    from insights_spark.session import get_spark

    spark = get_spark("gen-pages", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    synth.pages_df_dist(spark, n_pages, partitions=256).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()
    return path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", type=int, default=960_000)
    p.add_argument("--cpus", type=int, default=16)
    p.add_argument("--out", default="/tmp/spark_graft_wh_scale")
    args = p.parse_args()

    pages_path = ensure_pages(args.pages)

    from pyspark.sql import functions as F

    from insights_spark.jobs import pipeline as pj
    from insights_spark.session import get_spark

    shutil.rmtree(args.out, ignore_errors=True)
    spark = get_spark(
        f"pipeline-scale-{args.cpus}", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
        # same split override as bench/scaling.py: pages are
        # small-bytes/high-CPU, so task granularity must track parse cost
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()

    t0 = time.perf_counter()
    tables = pj.run(spark, pages, args.out)
    elapsed = time.perf_counter() - t0

    lineage = {}
    lin = spark.read.parquet(os.path.join(args.out, "_lineage"))
    for r in (
        lin.filter(F.col("partition_id") >= 0)
        .groupBy("stage")
        .agg(F.sum("rows_in").alias("rows_in"),
             F.sum("rows_out").alias("rows_out"),
             F.count(F.lit(1)).alias("partitions"))
        .collect()
    ):
        lineage[r["stage"]] = {
            "rows_in": int(r["rows_in"] or 0),
            "rows_out": int(r["rows_out"] or 0),
            "partitions": int(r["partitions"]),
        }
    counts = {
        name: spark.read.parquet(path).count()
        for name, path in sorted(tables.items())
    }
    print(json.dumps({
        "pages": n_pages,
        "cpus": args.cpus,
        "sec": round(elapsed, 1),
        "pages_per_sec": round(n_pages / elapsed, 1),
        "lineage": lineage,
        "tables": counts,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
