"""Corpus-level text statistics operators (TF-IDF and friends).

Pure Catalyst compositions — the classic HashingTF/IDF MLlib route
hashes terms into a fixed space (collisions, not oracle-able); this
exact-term formulation is deterministic, hash-checkable against SQL,
and at scale is the same two-aggregation shape (term-frequency
shuffle + document-frequency shuffle, both with map-side partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf) — one shuffle on (doc, term)."""
    from wilayah_aceh_etl_spark.sources.tables import spread

    return (
        spread(df.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF:
    tf · (ln((N+1)/(df+1)) + 1)  — the sklearn-style smooth idf.

    Plan: tf aggregation, df aggregation (both partial/map-side
    combining), broadcast of the scalar N, equi-join tf⋈df on term,
    ranking window per doc. The df table is |vocabulary| rows — at
    100 TB vocabulary ≪ corpus, so the term join broadcasts or
    shuffles cheaply; nothing touches raw text twice."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    tf = term_frequencies(df, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = df.count()  # scalar, computed once on the driver
    idf = F.log((F.lit(n_docs) + 1) / (F.col("df") + 1)) + 1
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        tf.join(dfreq, "term")
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", F.col("rk").cast("int").alias("rk"), "term", "tfidf")
    )
