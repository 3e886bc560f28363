"""Embedding-vector column builders — pure Catalyst expressions.

Dot/norm/cosine as sequential left-folds over array<double>; the
fold order matches DuckDB's list_dot_product exactly (verified
bitwise-identical on the test corpus), which is what lets the
similarity queries be hash-checked against a SQL oracle at full
double precision before rounding.

At scale: these are per-row expressions — a brute-force top-k over
N vectors × Q queries is a broadcast of Q against a partitioned scan
of N, no shuffle until the per-query top-k aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unresolved-expression fragment memo (r12 optimization round).
# Building a higher-order-function Column crosses py4j dozens of
# times (lambda registration, nested invocations): one dot() is
# ~20 ms of driver time, and the similarity operators build up to 7
# per query construction — ~0.16 s of every timed bench build.
# A Column over bare field NAMES is a context-free unresolved
# expression: reusing the object across DataFrames/queries is
# ordinary Spark usage (analysis copies and resolves per plan), so
# fragments keyed by (SparkContext identity, builder, names) are
# memoized and handed back verbatim. Entries are identity-checked
# against the ACTIVE context so a restarted JVM never serves a
# fragment bound to a dead gateway.
_FRAG_MEMO: dict[tuple, tuple[object, Column]] = {}


def _frag(kind: str, names: tuple[str, ...], build) -> Column:
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        # Spark Connect (or pre-context call): every lookup would
        # miss and re-store, making the memo pure overhead and
        # re-pinning Columns forever — build without storing
        # (r12 advice)
        return build()
    key = (kind, *names)
    hit = _FRAG_MEMO.get(key)
    if hit is not None and hit[0] is sc:
        return hit[1]
    # rebuilding implies the context changed (or first use): sweep
    # entries bound to DEAD contexts so a driver that cycles
    # sessions never accumulates py4j references to old gateways
    # (r12 review finding)
    for k in [k for k, v in _FRAG_MEMO.items() if v[0] is not sc]:
        del _FRAG_MEMO[k]
    col = build()
    _FRAG_MEMO[key] = (sc, col)
    return col


def as_double(vec: Column | str) -> Column:
    """array<float> → array<double> (promote before arithmetic so
    both engines accumulate in f64). Accepts a column NAME to enable
    fragment memoization (see _FRAG_MEMO)."""
    if isinstance(vec, str):
        return _frag(
            "as_double", (vec,), lambda: as_double(F.col(vec))
        )
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (deterministic order).

    Measured and REJECTED alternative (round 8): UNROLLING the fold
    into a flat `0.0 + a[1]·b[1] + … + a[d]·b[d]` expression chain
    for a plan-time-known dimension `d` produces the bitwise-same
    doubles (identical left-associative IEEE op sequence, including
    the leading 0.0 + that preserves the −0.0 edge) and wins in an
    ISOLATED pair-join aggregate (0.059 → 0.037 s at sf0.1) — but
    threaded through the real operators it LOST ~3× (ivf_topk
    1.10 → 3.86 s, semantic dedup 2.54 → 6.37 s, identical outputs):
    the 64-term tree gets duplicated across window/join/aggregate
    nodes where the single shared lambda did not, and the blown-up
    generated methods fall out of JIT/codegen budgets. The unrolled
    `d`-form parameter was REMOVED in round 9 (r8 advice): it had no
    callers, and `element_at` past the actual array length NULLs the
    whole product silently (or raises under ANSI mode) — re-add it
    only with a dimension-validated call site AND whole-query bench
    evidence.

    String arguments name columns and route through the fragment
    memo (_FRAG_MEMO): same expression, built once per context."""
    if isinstance(a, str) and isinstance(b, str):
        return _frag("dot", (a, b), lambda: dot(F.col(a), F.col(b)))
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return _frag("l2_norm", (a,), lambda: l2_norm(F.col(a)))
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return _frag("cosine", (a, b), lambda: cosine(F.col(a), F.col(b)))
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_lsh_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Random-hyperplane-style LSH reduced to axis-sign bits: bucket
    id = Σ 2^i · [vec[i] > 0]. Deterministic, engine-portable, and a
    real partitioning key for bucketed similarity search (the IVF
    coarse quantizer analog)."""
    out = None
    for i in range(n_bits):
        bit = F.when(F.element_at(vec, i + 1) > 0, F.lit(1)).otherwise(F.lit(0))
        term = bit * (2**i)
        out = term if out is None else out + term
    return out
