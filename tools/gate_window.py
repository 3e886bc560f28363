"""Compute the next round's GATE_PRIORITY window mechanically.

Implements the exhaustion policy written in plans/registry.py
(planned in round 9 per the r8 verdict ask #7):

  1. NEVER-VERIFIED FIRST: every oracle-backed registered query with
     no green row in any CORRECTNESS_r0*.json, ordered new-code-first
     (highest registration module round first, then name) — new code
     meets the driver oracle before anything else re-verifies.
  2. RE-VERIFY OLDEST: if fewer than 50 remain, fill the window with
     already-verified names ordered by the round of their LATEST
     green row (r1 vintage first), so long-stable operators regain
     driver visibility and a silent regression cannot hide behind a
     years-old green row.

Usage: python tools/gate_window.py [--size 50] [--apply]
Prints the proposed window as a ready-to-paste Python tuple; --apply
is intentionally NOT implemented — the window is pasted by hand so
the diff is reviewed, per the standing registry discipline.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def verified_rounds() -> dict[str, int]:
    """name -> latest round with a fully-green driver row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                # rows-only sketch rows have hash_match None — a green
                # driver row all the same for their declared contract
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


# New-code-first corrections for queries whose BUILD round differs
# from their registration module (the module-number proxy below).
# Found in the round-10 dry run: similarity_imi_topk was built in
# round 9 but registered in ext_queries.py (module round 0), so the
# proxy sorted it to the alphabetical tail and the 50-slot cut
# dropped it — exactly the ordering surprise the r9 verdict ask #4
# says to fix. Queries registered in core modules from round 10 on
# must add themselves here (or register in the roundN module).
BUILD_ROUND_OVERRIDES: dict[str, int] = {
    "similarity_imi_topk": 9,  # ext_queries.py:3851, built r9 sitting 2
}


def module_round(fn, name: str) -> int:
    """Registration recency proxy: the roundN_queries module number
    (0 for the core modules, unless overridden above), so
    new-code-first ordering is by the module that registered the
    query. `name` is REQUIRED (r10 ADVICE): the optional form let a
    call site silently skip the BUILD_ROUND_OVERRIDES correction —
    the exact ordering surprise the override exists to fix."""
    if name in BUILD_ROUND_OVERRIDES:
        return BUILD_ROUND_OVERRIDES[name]
    mod = getattr(fn, "__module__", "") or ""
    tail = mod.rsplit(".", 1)[-1]
    if tail.startswith("round") and "_" in tail:
        digits = "".join(ch for ch in tail.split("_")[0] if ch.isdigit())
        return int(digits) if digits else 0
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=50)
    ap.add_argument(
        "--assume-window-green",
        action="store_true",
        help="dry-run the NEXT round's window: treat every name in "
        "the registry's current GATE_PRIORITY as driver-green in "
        "round max+1, so the round-after rotation (including the "
        "oldest-first re-verify fill) can be reviewed before the "
        "driver's CORRECTNESS file exists",
    )
    args = ap.parse_args()

    from wilayah_aceh_etl_spark.plans.registry import GATE_PRIORITY, all_specs

    specs = all_specs()
    latest = verified_rounds()
    if args.assume_window_green:
        nxt = max(latest.values(), default=0) + 1
        for n in GATE_PRIORITY:
            latest[n] = max(latest.get(n, 0), nxt)
    oracle_backed = [n for n, s in specs.items() if s.oracle is not None]
    never = [n for n in oracle_backed if n not in latest]
    never.sort(key=lambda n: (-module_round(specs[n].fn, n), n))
    window = never[: args.size]
    filled_from_never = len(window)
    if len(window) < args.size:
        oldest = sorted(
            (n for n in oracle_backed if n in latest),
            key=lambda n: (latest[n], n),
        )
        window += oldest[: args.size - len(window)]

    print(
        f"# {filled_from_never} never-verified + "
        f"{len(window) - filled_from_never} oldest re-verify "
        f"(pool: {len(never)} never-verified remain of "
        f"{len(oracle_backed)} oracle-backed)"
    )
    print("GATE_PRIORITY: tuple[str, ...] = (")
    for n in window:
        suffix = ""
        if n in latest:
            suffix = f"  # re-verify; last green r{latest[n]}"
        print(f'    "{n}",{suffix}')
    print(")")


if __name__ == "__main__":
    main()
