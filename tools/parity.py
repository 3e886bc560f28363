"""Local replica of the driver's correctness gate.

Runs every registered query's Spark side and DuckDB oracle side over
the same parquet tables, canonicalizes (sort columns by name, sort
rows, stringify at fixed precision), and diffs. Use while iterating
so CORRECTNESS_r{N}.json holds no surprises.

Usage:
    python tools/parity.py [--sf /root/testdata/sf0.01] [--only name_substr]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from wilayah_aceh_etl_spark.plans.registry import all_specs  # noqa: E402
from wilayah_aceh_etl_spark.session import get_spark  # noqa: E402
from wilayah_aceh_etl_spark.sources.tables import STAR_TABLES  # noqa: E402


def _canon_cell(v) -> str:
    import datetime

    import numpy as np

    if v is None:
        return "<NULL>"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # driver-style: stable decimal form (queries pre-round, so
        # this is just formatting, not tolerance)
        return repr(round(f, 9))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _complex_cells(df_pandas) -> list[str]:
    """Columns holding list/dict/ndarray cells. The DRIVER's gate
    sorts rows with pandas sort_values, which raises `unhashable
    type: 'list'` on such columns (observed in CORRECTNESS_r01) —
    so any query emitting one must stringify it at the boundary."""
    import numpy as np

    bad = []
    for c in df_pandas.columns:
        col = df_pandas[c]
        if col.dtype == object and any(
            isinstance(v, (list, tuple, dict, np.ndarray))
            for v in col.head(20)
        ):
            bad.append(c)
    return bad


def _canon(df_pandas) -> list[tuple]:
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--show-diff", type=int, default=5)
    ap.add_argument(
        "--master",
        default="local[8]",
        help="Spark master; run with local[32] too — partial-aggregation "
        "order varies with parallelism, so this shakes out rounding flaps "
        "the default config can't see",
    )
    args = ap.parse_args()

    specs = all_specs()
    if args.only:
        pats = [p for p in args.only.split(",") if p]
        specs = {k: v for k, v in specs.items() if any(p in k for p in pats)}

    spark = get_spark("parity", master=args.master)
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    n_pass = n_fail = n_noracle = 0
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        complex_cols = _complex_cells(sdf)
        if complex_cols:
            print(
                f"FAIL  {name}: list-typed output cols {complex_cols} — "
                "the driver's canonicalizer cannot hash these"
            )
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        s_rows, o_rows = _canon(sdf), _canon(odf)
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        ok = True
        if s_cols != o_cols:
            print(f"FAIL  {name}: columns differ: spark={s_cols} oracle={o_cols}")
            ok = False
        elif len(s_rows) != len(o_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            ok = False
        elif s_rows != o_rows:
            diffs = [
                (a, b) for a, b in zip(s_rows, o_rows) if a != b
            ][: args.show_diff]
            print(f"FAIL  {name}: {sum(1 for a,b in zip(s_rows,o_rows) if a!=b)} differing rows; first: ")
            for a, b in diffs:
                print(f"      spark : {a}\n      oracle: {b}")
            ok = False
        if ok:
            print(f"PASS  {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
