from wilayah_aceh_etl_spark.functions import text, vectors  # noqa: F401
