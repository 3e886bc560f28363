from wilayah_aceh_etl_spark.plans.registry import (
    QuerySpec,
    all_specs,
    oracle_sql,
    queries,
    register,
)

__all__ = ["QuerySpec", "all_specs", "oracle_sql", "queries", "register"]
