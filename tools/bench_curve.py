"""Idle-box JIT warm-up curve for ONE bench query: fresh session,
the bench.py calibration probe (min-of-3 at session start), then N
back-to-back timed runs of the query at $SPARK_GRAFT_SF_DIR. Used to
record the ±band PLANS.md reads min-of-3 figures against (r8 verdict
ask #3 protocol; this round: tpch_q8_market_share and
events_asof_last_purchase, the two largest unbanded movers).

    python tools/bench_curve.py <query_name> [n_runs=12]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from wilayah_aceh_etl_spark.plans.registry import all_specs
from wilayah_aceh_etl_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-curve", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_specs()[name]

    def probe() -> None:
        spark.range(100_000_000).selectExpr(
            "sum(id * (id % 7)) AS s"
        ).collect()

    probe()
    cal = float("inf")
    for _ in range(3):
        t0 = time.time()
        probe()
        cal = min(cal, time.time() - t0)

    runs: list[float] = []
    for _ in range(n_runs):
        t0 = time.time()
        spec.fn(spark, sf_dir).collect()
        runs.append(round(time.time() - t0, 3))

    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "calibration_sec": round(cal, 4),
                "runs": runs,
                # bench.py's protocol is one UNTIMED warm-up then
                # min-of-3; run 1 here is that cold run, so the
                # protocol-equivalent figure is min over runs 2-4
                # (self-review r12: min(runs[:3]) was off by one —
                # it included the cold run the protocol discards)
                "min_of_3": min(runs[1:4]) if len(runs) > 1 else runs[0],
                "min_of_3_incl_cold": min(runs[:3]),
                "min_of_all": min(runs),
            }
        )
    )


if __name__ == "__main__":
    main()
