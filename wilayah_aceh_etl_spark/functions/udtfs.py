"""Python UDTFs (Spark 4 user-defined table functions).

The reference's set-returning functions (init_db.sql's
get_wilayah_by_level / search_wilayah — SURVEY §2.8) map to
DataFrame-returning Python functions in this engine; this module adds
the OTHER UDTF surface Spark 4 offers: true lateral table functions
usable from SQL (`SELECT ... FROM t, LATERAL fn(...)`). Each row of
input can yield any number of output rows, with the UDTF executing in
the Python worker per partition.

Kept deliberately thin: expression-based operators (see
plans/ext_queries.text_chunk_sliding) beat UDTFs whenever Catalyst
can express the logic — a UDTF is a black box to the optimizer (no
pushdown through it, no codegen inside it). The chunker here is the
UDTF twin of the expression form and is oracle-checked against the
SAME DuckDB SQL, certifying the two surfaces agree.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_W = 32  # tokens per chunk (mirror of ext_queries contract)
CHUNK_S = 24  # stride


@udtf(returnType="chunk_idx: bigint, chunk_text: string, n_chunk_tokens: bigint")
class ChunkTextUDTF:
    """Sliding-window token chunker: one input document row yields
    ceil(n/stride) overlapping chunks (trailing chunk may be short).
    Same output contract as the expression-based text_chunk_sliding."""

    def eval(self, text: str):
        if text is None:
            return
        toks = text.split(" ")
        for k, p in enumerate(range(0, len(toks), CHUNK_S)):
            chunk = toks[p : p + CHUNK_W]
            yield k, " ".join(chunk), len(chunk)


def register_udtfs(spark) -> None:
    """Idempotent SQL-name registration."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)


from wilayah_aceh_etl_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)  # UDTF class must not need repo on worker path
