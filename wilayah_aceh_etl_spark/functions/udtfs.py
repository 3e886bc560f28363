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
    spark.udtf.register("event_runs", EventRunsUDTF)


from wilayah_aceh_etl_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)  # UDTF class must not need repo on worker path


@udtf(
    returnType=(
        "user_id: bigint, event_type: string, run_len: bigint, "
        "start_event_id: bigint, end_event_id: bigint"
    )
)
class EventRunsUDTF:
    """Polymorphic table-argument UDTF (Spark 4): consumes
    TABLE(events) PARTITION BY user_id ORDER BY ts, event_id and
    emits each maximal run of consecutive identical event_type —
    the gaps-and-islands kernel as a streaming per-group pass.
    Spark instantiates one UDTF per partition key and feeds rows in
    the declared order, so state is one (type, len, start, end)
    tuple; terminate() flushes the final run."""

    def __init__(self):
        self._user = None
        self._type = None
        self._len = 0
        self._start = None
        self._end = None

    def eval(self, row):
        if row["event_type"] != self._type:
            if self._type is not None:
                yield self._user, self._type, self._len, self._start, self._end
            self._type = row["event_type"]
            self._len = 0
            self._start = row["event_id"]
        self._user = row["user_id"]
        self._len += 1
        self._end = row["event_id"]

    def terminate(self):
        if self._type is not None:
            yield self._user, self._type, self._len, self._start, self._end
