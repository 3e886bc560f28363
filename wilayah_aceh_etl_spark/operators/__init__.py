from wilayah_aceh_etl_spark.operators import dedup, similarity  # noqa: F401
