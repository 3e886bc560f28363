"""wilayah_aceh_etl_spark — a PySpark-native analytics engine.

A from-scratch Spark SQL / DataFrame re-expression of the query and
data-processing capabilities of the reference ETL+query service
(nafaarts/wilayah-aceh-etl, surveyed in SURVEY.md), extended with
large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design stance (SURVEY.md §7):
  * declarative DataFrame/SQL plans — let Catalyst/Tungsten optimize;
  * Parquet columnar storage, partitioned by hierarchy level;
  * geometry carried as GeoJSON string columns + a pure-Python
    Arrow-batched pandas-UDF kernel (no native deps available);
  * upsert via the pure-Parquet last-wins window rewrite (no Delta in
    this environment);
  * Python UDFs only where built-ins genuinely cannot express the
    semantics (geometry simplify, multimodal decode stubs).
"""

from wilayah_aceh_etl_spark.session import get_spark, ensure_session_defaults

__all__ = ["get_spark", "ensure_session_defaults"]

__version__ = "0.1.0"
