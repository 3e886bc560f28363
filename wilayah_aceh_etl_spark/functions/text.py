"""Text-analysis column builders — pure Catalyst expressions.

Everything here returns pyspark Columns composed from built-in
functions (JVM-side, whole-stage-codegen'd): no Python UDFs in any
hot path. Each builder has an exact ANSI-SQL twin used by the DuckDB
oracles (see plans/ext_queries.py), which is what makes the EXT
dedup/text operators hash-checkable across engines.

Tokenization contract: the corpus is single-space separated, so
`split(text, ' ')` is the shared definition on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small English stopword set shared with the SQL oracles.
EN_STOPWORDS = ("the", "a", "of", "and", "is")


def words(text: Column) -> Column:
    """Whitespace tokens (single-space contract)."""
    return F.split(text, " ")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """n-gram word shingles as an array of space-joined strings.

    A string argument names the column and routes through the
    vector-fragment memo (functions/vectors.py::_frag): the two
    nested HOF lambdas cost ~25 ms of py4j round-trips per build.

    transform over an index sequence keeps this fully vectorized;
    at 100 TB this is a per-row expression, no shuffle, no Python.
    """
    if isinstance(text, str):
        from wilayah_aceh_etl_spark.functions.vectors import _frag

        return _frag(
            "word_shingles",
            (text, str(n)),
            lambda: word_shingles(F.col(text), n),
        )
    w = words(text)
    # guard: Spark's sequence(1, 0) counts DOWN, so short docs must
    # short-circuit to an empty array instead
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_component(shingle: Column, seed: int) -> Column:
    """One MinHash hash family member: the lexicographic min (taken
    by the caller's agg) of md5(seed # shingle). Using the md5 hex
    string itself as the hash value keeps the function reproducible
    in any engine with md5 — no engine-specific 64-bit hash."""
    return F.md5(F.concat(F.lit(f"{seed}#"), shingle))


def hex4_to_int(hex4: Column) -> Column:
    """First-4-hex-chars → integer, via digit-position arithmetic
    shared verbatim with the SQL oracle (no engine hex-cast)."""
    digits = "0123456789abcdef"
    out = None
    for pos, weight in ((1, 4096), (2, 256), (3, 16), (4, 1)):
        d = (F.instr(F.lit(digits), F.substring(hex4, pos, 1)) - 1) * weight
        out = d if out is None else out + d
    return out


def token_quality_metrics(text: Column) -> dict[str, Column]:
    """Deterministic quality signals: token counts, distinct ratio,
    mean token length, stopword ratio. All integer-derived → exact
    division, stable across engines."""
    w = words(text)
    n_tokens = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    total_len = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda acc, x: acc + x
    )
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t)))
    return {
        "n_tokens": n_tokens,
        "n_distinct": n_distinct,
        "distinct_ratio": F.round(n_distinct / n_tokens, 4),
        "avg_token_len": F.round(total_len / n_tokens, 4),
        "stopword_ratio": F.round(n_stop / n_tokens, 4),
    }


def doc_fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 of the sorted distinct
    token set — invariant to token order/duplication, the cheap
    exact-dedup key for shuffled/reformatted copies."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(words(text))), " "))
