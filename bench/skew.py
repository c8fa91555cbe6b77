"""Skew benefit, MEASURED (X10): salted vs plain on a hot-key fixture.

The registered salted queries (`conditional_battery_salted`,
`semi_join_salted`) prove EQUIVALENCE on uniform TPC-H-like keys, where
salting cannot win. This bench proves (and bounds) BENEFIT on the profile
that actually hurts — ONE key holding 50% of all rows, the mega-changeset
shape the reference suffers silently (README.md:77, the 9.5 h Indonesia
load README.md:193). Three comparisons, min-of-3 each, noop sink:

  battery   plain groupBy(k) conditional battery vs salted_agg.
            EXPECTED ~no win: decomposable JVM aggregates map-side-combine
            a hot key to one partial per map task BEFORE the shuffle —
            reported to show we measured, not guessed.
  semi join fact ⋈ dim left-semi with broadcast disabled (the 100 TB case
            where the dim outgrows the broadcast threshold), three ways:
            AQE skew-split OFF (the naive straggler), AQE skew-split ON
            (Spark's own mitigation — layer 1 of the defense), and
            salted_join_skewed. Honest comparison against AQE, not a
            strawman.
  kernel    per-key applyInPandas stats kernel, plain vs salted_group_apply
            two ways. This is the load-bearing case: an Arrow kernel has NO
            map-side combine and AQE cannot split an aggregation partition,
            so the hot key serializes ~N/2 rows through ONE Python worker.
            Measured lesson encoded in the operator itself: BLANKET salting
            (every key × buckets) multiplies the per-group Arrow/pandas
            fixed cost and is ~27× SLOWER than plain on a many-small-keys
            profile; hot-ONLY salting (measure with top_keys, salt just the
            hot keys) is the production pattern.

Also reports the mechanical layout ratio (unsalted hot-task input /
salted max-task input) that tests/test_runtime.py asserts ≥ 8.

Usage: python bench/skew.py   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_ROWS = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "2000000"))
N_COLD_KEYS = 9999
BUCKETS = 32
REPS = 3


def fixture(spark):
    from pyspark.sql import functions as F

    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(N_COLD_KEYS)) + 1)
        .cast("long").alias("k"),
        F.col("id").alias("payload"),
        (F.col("id") % 1000).cast("long").alias("v"),
    )


def timed(thunk) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from insights_spark.runtime.skew import (
        salted_agg, salted_group_apply, salted_join_skewed, with_salt)
    from insights_spark.session import get_spark

    spark = get_spark("bench-skew", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    df = fixture(spark).persist()
    df.count()
    timings: dict[str, float] = {}

    # --- battery: decomposable agg (expected ~parity; map-side combine) ---
    aggs = {
        "n": F.count(F.lit(1)),
        "hi": F.sum((F.col("v") > 500).cast("int")),
        "lo": F.sum((F.col("v") <= 500).cast("int")),
        "s": F.sum("v"),
    }
    timings["battery_plain"] = timed(lambda: sink(
        df.groupBy("k").agg(*[c.alias(n) for n, c in aggs.items()])))
    timings["battery_salted"] = timed(lambda: sink(
        salted_agg(df, ["k"], aggs, ["payload"], buckets=BUCKETS)))

    # --- semi join, broadcast disabled (dim bigger than threshold at scale) ---
    dim = spark.range(0, N_COLD_KEYS // 2).select(F.col("id").alias("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timings["semi_plain_no_aqe_fix"] = timed(lambda: sink(
        df.join(dim, "k", "left_semi")))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timings["semi_plain_aqe_skewfix"] = timed(lambda: sink(
        df.join(dim, "k", "left_semi")))
    timings["semi_salted"] = timed(lambda: sink(
        salted_join_skewed(df, dim, "k", ["payload"], BUCKETS, "left_semi")))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # --- per-key Python kernel: the load-bearing case ---
    # Mega-key fixture: the kernel demo needs the REFERENCE's profile — a
    # handful of huge keys among moderate ones (a 1M-element Indonesia
    # changeset vs thousands of ordinary ones), NOT the 10k-small-keys
    # shape above, where per-group Arrow overhead dominates and salting
    # (any flavor) cannot win. Kernel = sort-based per-key median: real
    # per-row work, decomposable via per-salt partial sort + merge-by-
    # weighted-median is NOT exact, so the partial carries count+sum+sorted
    # extremes — we merge count/sum/min/max (exact, decomposable).
    # 10× the base fixture: at 2M rows the 1M-row straggler costs ~1 s and
    # the salted path's fixed overhead (top_keys count + broadcast join +
    # second-level agg) eats the win; at 20M the hot key serializes ~10 s
    # of Arrow+sort through one worker and salting pays for itself
    n_mega = N_ROWS * 10
    mega = spark.range(n_mega).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(200)) + 1)
        .cast("long").alias("k"),
        F.col("id").alias("payload"),
        (F.col("id") % 1_000_003).cast("long").alias("v"),
    ).persist()
    mega.count()

    def partial(pdf):
        import numpy as np
        import pandas as pd

        v = np.sort(pdf["v"].to_numpy())   # O(n log n): real per-row work
        return pd.DataFrame({
            "k": [pdf["k"].iloc[0]],
            "_salt": [pdf["_salt"].iloc[0] if "_salt" in pdf else 0],
            "n": [len(v)],
            "vmin": [int(v[0])],
            "vmax": [int(v[-1])],
            "vsum": [int(v.sum())],
        })

    schema = "k long, _salt int, n long, vmin long, vmax long, vsum long"

    def kernel_plain():
        sink(
            mega.withColumn("_salt", F.lit(0)).groupBy("k")
            .applyInPandas(partial, schema)
            .drop("_salt")
        )

    merge = {"n": F.sum("n"), "vmin": F.min("vmin"),
             "vmax": F.max("vmax"), "vsum": F.sum("vsum")}
    timings["kernel_plain"] = timed(kernel_plain)
    # hot-only salting: measure hot keys first (top_keys), salt only those
    timings["kernel_salted_hot_only"] = timed(lambda: sink(
        salted_group_apply(mega, ["k"], partial, schema, merge,
                           ["payload"], buckets=BUCKETS,
                           hot_threshold_rows=n_mega // 100)))
    # blanket salting on the MANY-SMALL-KEYS fixture: the measured
    # ANTI-pattern (single pass — ~27× slower than plain from per-group
    # Arrow overhead at 10k keys × 32 salts; no need to burn reps on it)
    t0 = time.perf_counter()
    sink(salted_group_apply(df, ["k"], partial, schema, merge,
                            ["payload"], buckets=BUCKETS))
    timings["kernel_salted_all_keys_10k"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    sink(df.withColumn("_salt", F.lit(0)).groupBy("k")
         .applyInPandas(partial, schema).drop("_salt"))
    timings["kernel_plain_10k"] = round(time.perf_counter() - t0, 3)

    # --- mechanical layout ratio (what the pytest asserts ≥ 8) ---
    def max_part(d, *cols):
        return (
            d.repartition(32, *[F.col(c) for c in cols])
            .select(F.spark_partition_id().alias("p"))
            .groupBy("p").count().agg(F.max("count")).first()[0]
        )

    plain_max = max_part(df, "k")
    salted_max = max_part(with_salt(df, ["payload"], BUCKETS), "k", "_salt")

    print(json.dumps({
        "metric": "skew_salted_vs_plain_hotkey",
        "n_rows": N_ROWS,
        "hot_frac": 0.5,
        "buckets": BUCKETS,
        "reps": REPS,
        "timings_sec": timings,
        "kernel_speedup_hot_only": round(
            timings["kernel_plain"] / timings["kernel_salted_hot_only"], 2),
        "n_rows_kernel": N_ROWS * 10,
        "n_cold_keys_kernel": 200,
        "max_task_input_plain": plain_max,
        "max_task_input_salted": salted_max,
        "max_task_ratio": round(plain_max / salted_max, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
