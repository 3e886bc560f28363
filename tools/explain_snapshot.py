"""Dump `.explain("formatted")` of bench-tagged queries to
plans/r12/<query>_<suffix>.txt — the optimization round's
before/after plan evidence (judge-checkable without Spark).

Usage: python tools/explain_snapshot.py <suffix> [--only substr]
                                        [--dir plans/rNN]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wilayah_aceh_etl_spark.plans.registry import all_specs  # noqa: E402
from wilayah_aceh_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("suffix", help="file suffix, e.g. before / after")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--dir",
        default=os.path.join("plans", "r12"),
        help="output dir relative to the repo root (per-round)",
    )
    args = ap.parse_args()
    suffix, only = args.suffix, args.only
    out_dir = os.path.join(REPO, args.dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-snapshot", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    for name, spec in sorted(all_specs().items()):
        if not spec.bench:
            continue
        if only and only not in name:
            continue
        df = spec.fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(path)


if __name__ == "__main__":
    main()
