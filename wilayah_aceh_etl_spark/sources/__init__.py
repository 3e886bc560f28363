from wilayah_aceh_etl_spark.sources.tables import STAR_TABLES, load_table, register_views

__all__ = ["STAR_TABLES", "load_table", "register_views"]
