"""Declared-query registry: the correctness-gate surface.

Every implemented operator from SURVEY.md §2 (plus the EXT
training-data-pipeline operators) registers here as a named query:
a PySpark callable `(spark, sf_dir) -> DataFrame` and, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string over
the same parquet views. The driver (and tools/parity.py locally)
runs both sides at sf0.01 and hash-compares.

Contract reminders (see repo README / driver stub):
  * every computed column aliased IDENTICALLY on both sides;
  * floats rounded to a fixed precision on BOTH sides;
  * DuckDB SUM(int) returns HUGEINT → oracles cast to BIGINT;
  * results given a total order when the query itself sorts.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records weaker rows-only check
    tags: tuple[str, ...] = ()
    description: str = ""
    bench: bool = False  # include in bench.py headline set
    extra: dict = field(default_factory=dict)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    description: str = "",
    bench: bool = False,
):
    """Decorator: register a declared query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tuple(tags),
            description=description or (fn.__doc__ or "").strip().splitlines()[0]
            if (description or fn.__doc__)
            else "",
            bench=bench,
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import wilayah_aceh_etl_spark.plans.analytics  # noqa: F401
    import wilayah_aceh_etl_spark.plans.wilayah_queries  # noqa: F401
    import wilayah_aceh_etl_spark.plans.events_queries  # noqa: F401
    import wilayah_aceh_etl_spark.plans.ext_queries  # noqa: F401
    import wilayah_aceh_etl_spark.plans.tpch_queries  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
