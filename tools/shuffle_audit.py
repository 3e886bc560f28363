"""Measured shuffle audit: run registered queries and report actual
shuffle read/write volume and spill from the Spark status REST API.

`.explain` proves the plan SHAPE (tools/explain_audit.py); this tool
proves the MOVEMENT — how many bytes actually crossed a shuffle
boundary — which is the number that decides whether an operator
survives a 100× scale-up. E.g. the MinHash dedup claim "the shuffle
carries k×32-char signatures per doc, never document bodies" is
checkable here: shuffle write for the signature stage should be a
small multiple of (n_docs × k × 32) bytes regardless of text size.

Usage: python tools/shuffle_audit.py [--only substr] [--sf DIR]
Prints one line per query: input bytes read, shuffle write, shuffle
read, spill, and the shuffle:input ratio (the scale-up red flag when
it exceeds ~1 for a reduce-heavy operator).

Caveat: `inputBytes` comes from Hadoop FileSystem statistics, which
undercount local `file://` vectorized parquet reads — trust the
shuffle/spill columns absolutely, the input column directionally.
Measured reference points at sf0.1/local[32] (2026-08-13):
  join_revenue_by_nation   shuffle write 432 B — AQE demotes every
    join to broadcast at this scale; the only exchange is the 5-row
    final aggregate. The "dims broadcast, facts shuffle on demand"
    posture, observed rather than asserted.
  dedup_minhash_lsh_pairs  shuffle write 65.3 MB, read 94 MB, zero
    spill — dominated by the distinct (doc, shingle) relation and
    the candidate-verify joins; the signature aggregation itself
    contributes ~n_docs×k×32 B (see dedup_minhash_signatures:
    24 KB written for 500 docs at sf0.01-scale input).
  UPDATE (r12 optimization round, 2026-08-18): after the
    array-persisted restructure (operators/dedup.py) the same query
    measures shuffle write 878.7 KB, read 878.7 KB, zero spill —
    the corpus-wide distinct and the min(string) SortAggregate
    shuffles are gone; only the band self-join and candidate-scoped
    verify move, at k×32 B/doc + O(true pairs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wilayah_aceh_etl_spark.plans import registry
from wilayah_aceh_etl_spark.session import get_spark


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def _app_id(spark) -> str:
    return spark.sparkContext.applicationId


def _job_stage_metrics(spark, job_ids: list[int]) -> dict[str, int]:
    stages = {
        s["stageId"]: s
        for s in _rest(spark, f"applications/{_app_id(spark)}/stages")
    }
    seen: set[int] = set()
    tot = {
        "input_bytes": 0,
        "shuffle_write": 0,
        "shuffle_read": 0,
        "spill_bytes": 0,
    }
    for jid in job_ids:
        job = _rest(spark, f"applications/{_app_id(spark)}/jobs/{jid}")
        for sid in job["stageIds"]:
            if sid in seen or sid not in stages:
                continue
            seen.add(sid)
            s = stages[sid]
            tot["input_bytes"] += s.get("inputBytes", 0)
            tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
            tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
            tot["spill_bytes"] += s.get("diskBytesSpilled", 0)
    return tot


def _fmt(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024 or unit == "GB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n}GB"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    specs = registry.all_specs()
    names = [
        n for n in sorted(specs) if args.only is None or args.only in n
    ]
    for name in names:
        tracker = sc.statusTracker()
        before = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobGroup(name, name)
        try:
            specs[name].fn(spark, args.sf).collect()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:45s} ERROR {type(exc).__name__}: {exc}"[:160])
            continue
        finally:
            sc.setJobGroup(None, None)
        after = set(tracker.getJobIdsForGroup(None) or []) | set(
            tracker.getJobIdsForGroup(name) or []
        )
        jobs = sorted(after - before)
        m = _job_stage_metrics(spark, jobs)
        ratio = (
            m["shuffle_write"] / m["input_bytes"] if m["input_bytes"] else 0.0
        )
        print(
            f"{name:45s} input={_fmt(m['input_bytes']):>10s}"
            f" shW={_fmt(m['shuffle_write']):>10s}"
            f" shR={_fmt(m['shuffle_read']):>10s}"
            f" spill={_fmt(m['spill_bytes']):>8s}"
            f" shuffle:input={ratio:5.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
