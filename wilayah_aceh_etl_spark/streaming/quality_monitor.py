"""Streaming corpus-quality monitor — the continuously-running form
of the Gopher quality-rule battery.

Production shape: documents arrive as micro-batches; each batch's
per-rule pass counts land as one summary row in a partitioned
monitor table, which a dashboard (or an admission controller) reads
as cumulative pass-rate curves. This is the observability half of a
training-corpus ingest loop: the admission sink decides per-doc,
the monitor tracks whether the INCOMING DISTRIBUTION is drifting
(a collapsing stopword rate or exploding repetition rate is how
crawler rot and spam floods show up first).

REPLAY IDEMPOTENCY (foreachBatch is at-least-once): the monitor
table is laid out as `<table>/batch=<id>/` partitions written with
mode=overwrite, so a replayed batch overwrites its own summary row
instead of double-counting. Batch summaries are pure functions of
the batch's rows — no cross-batch state is read inside the stream,
which is what makes the monitor trivially correct under replay;
cumulative curves are derived at READ time with a window over
batch ids.

Scale: the per-batch reduce is one map-side-combinable aggregation
to a single row (plus the (doc, word) combine for the repetition
rule); the monitor table grows one row per micro-batch regardless
of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.operators.text_analysis import gopher_rule_flags

def batch_quality_summary(batch_df: DataFrame) -> DataFrame:
    """One summary row of Gopher-rule pass counts for a micro-batch
    (shared rule definitions: operators/text_analysis.py::
    gopher_rule_flags, so streaming and batch verdicts are
    definitionally identical — text_gopher_quality_rules IS this
    function over the static corpus). Every count coalesces to 0 so
    an EMPTY micro-batch (routine under a processing-time trigger
    with no new data) writes a well-typed all-zero row, never
    NULLs."""
    flags = gopher_rule_flags(batch_df)

    def cnt(col):
        return F.coalesce(F.sum(col), F.lit(0)).cast("long")

    return flags.agg(
        F.count("*").cast("long").alias("n_docs"),
        cnt("r_wc").alias("pass_word_count"),
        cnt("r_mwl").alias("pass_mean_word_len"),
        cnt("r_alpha").alias("pass_alpha_ratio"),
        cnt("r_stop").alias("pass_stopwords"),
        cnt("r_rep").alias("pass_repetition"),
        cnt(
            F.when(
                F.col("r_wc")
                + F.col("r_mwl")
                + F.col("r_alpha")
                + F.col("r_stop")
                + F.col("r_rep")
                == 5,
                1,
            ).otherwise(0)
        ).alias("pass_all"),
    )


def quality_monitor_stream(
    stream: DataFrame, monitor_table: str, checkpoint: str
):
    """writeStream builder: per micro-batch, write the batch's
    quality summary row to `<monitor_table>/batch=<id>/` with
    overwrite (replay-idempotent). Returns the unstarted writeStream
    (caller picks trigger/awaits)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_quality_summary(batch_df).write.mode("overwrite").parquet(
            f"{monitor_table}/batch={batch_id}"
        )

    return stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
