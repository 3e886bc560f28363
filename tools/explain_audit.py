"""Physical-plan audit over the whole declared-query registry.

For each registered query, compiles the plan at $SPARK_GRAFT_SF_DIR
(no execution beyond AQE's initial stages for .explain) and flags
the anti-patterns that break at 100 TB:

  CARTESIAN   — CartesianProduct anywhere
  NLJ         — BroadcastNestedLoopJoin (non-equi fallback)
  FULL-SCAN   — a parquet scan reading every column of a wide table
                when the query projects fewer (column pruning failed)
  NO-CODEGEN  — zero WholeStageCodegen spans (interpreted plan)

and reports join strategies + pushed filters so regressions are
visible in diffs. Run: python tools/explain_audit.py [--only substr]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wilayah_aceh_etl_spark.plans import registry
from wilayah_aceh_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted_plan(df) -> str:
    # simple mode: shows `*(n)` whole-stage-codegen spans (formatted
    # mode hides them behind AdaptiveSparkPlan pre-execution)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def audit_one(name: str, plan: str) -> tuple[list[str], list[str]]:
    flags, notes = [], []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("NLJ")
    if "*(" not in plan:
        flags.append("NO-CODEGEN")
    joins = sorted(
        set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan))
    )
    if joins:
        notes.append("joins=" + ",".join(joins))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_pushed = sum(1 for p in pushed if p.strip())
    if pushed:
        notes.append(f"scans={len(pushed)} pushed_filter_scans={n_pushed}")
    n_exchange = plan.count("Exchange")
    notes.append(f"exchanges={n_exchange}")
    return flags, notes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--dump", action="store_true", help="print full plans")
    args = ap.parse_args()

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    any_flagged = False
    for name, spec in sorted(specs.items()):
        if args.only and args.only not in name:
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            # AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false)
            # which hides codegen spans until execution; disable it for
            # the static audit (queries re-enable it when they run)
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            plan = formatted_plan(df)
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            any_flagged = True
            continue
        flags, notes = audit_one(name, plan)
        marker = " ".join(flags) if flags else "ok"
        if flags:
            any_flagged = True
        print(f"{marker:12s} {name:42s} {' '.join(notes)}")
        if args.dump:
            print(plan)
    return 1 if any_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
