"""Per-query time breakdown for the bench headline set (guide §1).

Splits each bench-tagged query's wall time into:
  build  — Python-side DataFrame construction (spec.fn call)
  plan   — analysis + optimization + physical planning
           (forcing queryExecution().executedPlan())
  noop   — execution timed against the noop sink (computes every
           column of every row, no driver collect)
  collect — execution timed exactly like bench.py (df.collect())

Each phase is min-of-3 after one warm-up execution, matching the
bench protocol. The build/plan columns expose DRIVER-side overhead
(plan size, py4j round-trips) that no executor-side optimization
can touch; noop-vs-collect exposes the driver-materialization cost
bench.py pays on top of the computation.

Usage: python tools/bench_profile.py [--only substr] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wilayah_aceh_etl_spark.plans.registry import all_specs  # noqa: E402
from wilayah_aceh_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _min_of(n, f):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        f()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    specs = {k: v for k, v in all_specs().items() if v.bench}
    if args.only:
        specs = {k: v for k, v in specs.items() if args.only in k}

    print(f"{'query':<34} {'build':>7} {'plan':>7} {'noop':>7} {'collect':>8}")
    totals = [0.0, 0.0, 0.0, 0.0]
    for name, spec in sorted(specs.items()):
        spark.sparkContext.setJobDescription(f"profile: {name}")
        # warm-up exactly like bench.py: one full collect
        spec.fn(spark, SF_DIR).collect()

        t_build = _min_of(args.runs, lambda: spec.fn(spark, SF_DIR))

        def _plan():
            df = spec.fn(spark, SF_DIR)
            df._jdf.queryExecution().executedPlan()

        t_plan = _min_of(args.runs, _plan)

        def _noop():
            spec.fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()

        t_noop = _min_of(args.runs, _noop)

        t_collect = _min_of(args.runs, lambda: spec.fn(spark, SF_DIR).collect())
        spark.sparkContext.setJobDescription(None)

        print(
            f"{name:<34} {t_build:>7.3f} {t_plan:>7.3f} "
            f"{t_noop:>7.3f} {t_collect:>8.3f}"
        )
        for i, v in enumerate((t_build, t_plan, t_noop, t_collect)):
            totals[i] += v
    print(
        f"{'TOTAL':<34} {totals[0]:>7.3f} {totals[1]:>7.3f} "
        f"{totals[2]:>7.3f} {totals[3]:>8.3f}"
    )


if __name__ == "__main__":
    main()
