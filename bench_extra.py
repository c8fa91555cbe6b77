"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§7.2).

NOT part of the driver contract — bench.py is the frozen measurement
harness; this file exists so optimization work can time ONE query at a
time with the noop sink, label jobs, and save .explain("formatted") for
the plans/r06/ evidence files.

Usage:
    python bench_extra.py q1 q2 ...            # time + plan for named queries
    python bench_extra.py --plans-only q1 ...  # just dump plans (no timing)
    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python bench_extra.py q1
    PLAN_SUFFIX=after python bench_extra.py q1 # write <q>_after.txt

Prints one line per query: name, per-rep seconds, min.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from insights_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans_only = "--plans-only" in sys.argv
    no_plans = "--no-plans" in sys.argv
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    plan_dir = os.environ.get(
        "PLAN_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "plans", "r06"),
    )
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("insights-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # same warmup as bench.py so numbers are comparable
    force(qs["semi_join"](spark, sf_dir))
    force(qs["pip_countries"](spark, sf_dir))

    for name in args:
        if name not in qs:
            print(f"{name}: UNKNOWN")
            continue
        if not no_plans:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
        if plans_only:
            print(f"{name}: plan written")
            continue
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {times} min={min(times)}")
    spark.stop()


if __name__ == "__main__":
    main()
