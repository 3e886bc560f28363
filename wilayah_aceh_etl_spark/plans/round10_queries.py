"""Round-10 query family: curation families composed END TO END.

The r9 verdict's stretch direction — compose, don't build new
machinery. The first member joins the two big round-9 families:
TracIn self-influence (gradient-based attribution) audits the
SemDeDup keep-set (semantic dedup), answering the curation question
the two families individually cannot: does semantic dedup
preferentially discard LOW-influence (redundant) examples, or is it
throwing away high-influence training signal?

Everything here reuses existing machinery: the memoized lr=2.0
trajectory (operators/ml_train.py::logreg_fit_trajectory_cached),
the SemDeDup operator (operators/similarity.py::semantic_dedup), and
the established oracle CTE generators (_emb_train_sql,
_ivf_km_step_sql with the r10 table-name parameters). Zero new
numeric code paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.operators import similarity as S
from wilayah_aceh_etl_spark.plans.registry import register
from wilayah_aceh_etl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Influence × dedup audit: TracIn self-influence vs the SemDeDup
# keep-set, as a 2×2 contingency (high/low influence × keep/drop).
# ---------------------------------------------------------------------------


def _influence_dedup_oracle() -> str:
    """Composes the TracIn oracle's trajectory + margins CTEs with
    the SemDeDup oracle's Lloyd-training + keep-sweep CTEs in ONE
    WITH clause. The training side owns the bare v/u names
    (_emb_train_sql); the k-means side runs k-prefixed via
    _ivf_km_step_sql(v="kv", u="ku", pfx="k") over adapter CTEs that
    re-expose the SAME embedding lists under the semantic oracle's
    column names — both sides read one logical corpus, exactly like
    the Spark plan."""
    from wilayah_aceh_etl_spark.plans.ext_queries import (
        _COS,
        _ivf_km_step_sql,
    )
    from wilayah_aceh_etl_spark.plans.round9_queries import (
        _TD_LR,
        _TD_MARGINS_SQL,
        _emb_train_sql,
    )

    def e_t(m: str) -> str:
        return f"(0.5 + {m} / (2.0 * (1.0 + abs({m}))) - y)"

    terms = " + ".join(
        f"{_TD_LR} * ({e_t(f'm{t}')} * {e_t(f'm{t}')}) * xx"
        for t in (1, 2, 3)
    )
    pe_with_xx = _TD_MARGINS_SQL.replace(
        "SELECT v.vec_id, v.y,",
        "SELECT v.vec_id, v.y, list_dot_product(v.x, v.x) AS xx,",
    )
    return (
        "WITH "
        + _emb_train_sql("", "TRUE")
        + ","
        + pe_with_xx
        + f""",
infl AS (
  SELECT vec_id,
         CAST(ROUND(({terms}) * 16777216) AS BIGINT) AS infl_q
  FROM pe
),
kv AS (SELECT vec_id, x AS e FROM v),
ku AS (SELECT vec_id, val, pos FROM u),
kc1 AS (SELECT vec_id AS cid, e AS ce FROM kv WHERE vec_id < 16),
"""
        + ",".join(
            _ivf_km_step_sql(i, v="kv", u="ku", pfx="k") for i in (1, 2)
        )
        + """,
kassigned AS (
  SELECT vec_id, e, cid, ROUND(cs, 6) AS cent_cos FROM (
    SELECT v.vec_id, v.e, c.cid, """
        + _COS.format(a="v.e", b="c.ce")
        + """ AS cs,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY """
        + _COS.format(a="v.e", b="c.ce")
        + """ DESC, c.cid
           ) AS rn
    FROM kv v, kc3 c
  ) WHERE rn = 1
),
kranked AS (
  SELECT vec_id, e, cid, cent_cos,
         ROW_NUMBER() OVER (
           PARTITION BY cid ORDER BY cent_cos, vec_id
         ) AS rk
  FROM kassigned
),
kremoved AS (
  SELECT DISTINCT a.vec_id
  FROM kranked a JOIN kranked b ON a.cid = b.cid AND a.rk > b.rk
  WHERE ROUND("""
        + _COS.format(a="a.e", b="b.e")
        + """, 6) >= 0.35
),
keepset AS (
  SELECT r.vec_id,
         CAST(CASE WHEN rm.vec_id IS NULL THEN 1 ELSE 0 END
              AS INTEGER) AS keep
  FROM kranked r LEFT JOIN kremoved rm ON r.vec_id = rm.vec_id
),
j AS (
  SELECT i.vec_id, i.infl_q, k.keep
  FROM infl i JOIN keepset k USING (vec_id)
),
tot AS (
  SELECT CAST(SUM(infl_q) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM j
),
flagged AS (
  SELECT vec_id, infl_q, keep,
         CASE WHEN infl_q > (SELECT s // n FROM tot)
              THEN 1 ELSE 0 END AS high_influence
  FROM j
),
cells AS (
  SELECT high_influence, keep,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(infl_q) AS BIGINT) AS sum_infl_q
  FROM flagged GROUP BY high_influence, keep
),
cls AS (
  SELECT high_influence, CAST(SUM(n_docs) AS BIGINT) AS cn
  FROM cells GROUP BY high_influence
)
SELECT CAST(c.high_influence AS INTEGER) AS high_influence,
       c.keep, c.n_docs, c.sum_infl_q,
       ROUND(CAST(c.n_docs AS DOUBLE) / cls.cn, 6) AS class_share
FROM cells c JOIN cls USING (high_influence)
ORDER BY high_influence, keep
"""
    )


@register(
    "data_curation_influence_dedup_audit",
    oracle=_influence_dedup_oracle(),
    tags=("ext", "ml", "curation", "attribution", "dedup", "semdedup"),
    description="TracIn self-influence × SemDeDup keep-set 2×2 "
    "contingency: does semantic dedup drop low-influence rows?",
)
def data_curation_influence_dedup_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Influence-aware dedup audit — the round-9 curation families
    composed end to end (the r9 verdict's stretch ask): TracIn
    self-influence (Pruthi et al. 2020, from the SAME memoized
    lr=2.0 trajectory the cartography family trains) scores every
    embedding, SemDeDup (Abbas et al. 2023, the SAME semantic_dedup
    operator dedup_semantic_clusters registers) issues keep/drop
    verdicts, and the audit reports the 2×2 contingency of
    (high/low self-influence × keep/drop) with each influence
    class's keep-share. A healthy dedup drops redundant (low-
    influence) mass: high-influence keep-share should dominate —
    exactly the diagnostic influence-based curation papers (e.g.
    TracIn §5, SemDeDup §4 "semantic diversity") run before trusting
    a dedup policy on training data.

    Determinism: influence is the TracIn query's quantized BIGINT
    (Σ_t η·e_t²·‖x‖² · 2²⁴, rational sigmoid, zero transcendental
    risk); the high/low split compares each infl_q against the
    FLOOR-mean ⌊Σ/n⌋ — integer division in both engines (Spark `div`
    == DuckDB `//` on non-negative BIGINTs; infl_q ≥ 0 since every
    term is η·e²·‖x‖²), ties going low; the keep verdict is
    semantic_dedup's, whose Spark/SQL bit-identity
    dedup_semantic_clusters already pins. Output: ≤4 rows of exact
    integers plus one single-division share per row.

    Scale shape: one corpus scan against 3 literal checkpoint
    weight vectors (influence), the SemDeDup equi-join pipeline
    (never all-pairs), one vec_id equi-join between the two N-row
    relations, a 1-row floor-mean broadcast, and a 4-row aggregate —
    nothing new crosses the wire at 100 TB that the two parent
    queries don't already move. Both trainings ride their per-corpus
    memos (trajectory + quantizer), so in a gate window with the
    parent queries this audit pays only the join and aggregates."""
    from wilayah_aceh_etl_spark.functions.vectors import as_double, dot
    from wilayah_aceh_etl_spark.operators.ml_train import (
        logreg_fit_trajectory_cached,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    labeled = emb.select(
        "vec_id",
        "embedding",
        F.when(F.col("label") < 5, 1).otherwise(0).alias("y"),
    )
    traj = logreg_fit_trajectory_cached(
        labeled, cache_key=sf_dir, n_iter=3, lr=2.0
    )
    v = labeled.select(
        "vec_id", as_double(F.col("embedding")).alias("x"), "y"
    )
    xx = dot(F.col("x"), F.col("x"))
    terms = []
    for w, b in traj:
        warr = F.array(*[F.lit(float(x)) for x in w])
        m = dot(F.col("x"), warr) + F.lit(float(b))
        e = (
            F.lit(0.5)
            + m / (F.lit(2.0) * (F.lit(1.0) + F.abs(m)))
            - F.col("y")
        )
        terms.append(F.lit(2.0) * (e * e) * xx)
    self_infl = (terms[0] + terms[1]) + terms[2]
    infl = v.select(
        "vec_id",
        F.round(self_infl * 16777216).cast("long").alias("infl_q"),
    )

    keepset = S.semantic_dedup(
        emb, threshold=0.35, n_centroids=16, n_iter=2, cache_key=sf_dir
    ).select("vec_id", "keep")

    j = infl.join(keepset, "vec_id")
    tot = j.agg(
        F.sum("infl_q").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    flagged = j.crossJoin(F.broadcast(tot)).select(
        "infl_q",
        "keep",
        F.when(
            F.col("infl_q") > F.expr("s div n"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("high_influence"),
    )
    cells = flagged.groupBy("high_influence", "keep").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("infl_q").cast("long").alias("sum_infl_q"),
    )
    cls = cells.groupBy("high_influence").agg(
        F.sum("n_docs").cast("long").alias("cn")
    )
    return (
        cells.join(F.broadcast(cls), "high_influence")
        .select(
            F.col("high_influence").cast("int").alias("high_influence"),
            "keep",
            "n_docs",
            "sum_infl_q",
            F.round(
                F.col("n_docs").cast("double") / F.col("cn"), 6
            ).alias("class_share"),
        )
        .orderBy("high_influence", "keep")
    )


# ---------------------------------------------------------------------------
# Streaming IMI admission — the inverted multi-index cell-pair
# assignment as the admission probe in the dedup_admission frame.
# ---------------------------------------------------------------------------


def _imi_admission_oracle(n_batches: int = 4, threshold: str = "0.35") -> str:
    """Unrolls the sequential micro-batch admission in SQL on top of
    the shared IMI index prelude (ext_queries._IMI_INDEX_PRELUDE —
    both half-space trainings + the (vec_id, e, ca, cb) lists):
    batch k's vectors are compared cell-locally against the
    ADMITTED-so-far relation adm{k-1}, and admitted rows accrete
    into adm{k}. Batch 0 faces an empty index, so its verdicts are
    literal zeros — the same semantics the streaming frame produces
    when the admitted table does not exist yet."""
    from wilayah_aceh_etl_spark.plans.ext_queries import (
        _COS,
        _IMI_INDEX_PRELUDE,
    )

    cos = _COS.format(a="b.e", b="s.e")
    parts = [
        f"""
bat0 AS (SELECT vec_id, e, ca, cb FROM lists WHERE vec_id % {n_batches} = 0),
vd0 AS (
  SELECT vec_id, ca, cb,
         CAST(0 AS BIGINT) AS n_cell_candidates,
         CAST(0 AS BIGINT) AS n_near_dups
  FROM bat0
),
adm0 AS (SELECT vec_id, e, ca, cb FROM bat0)"""
    ]
    for k in range(1, n_batches):
        parts.append(
            f"""
bat{k} AS (SELECT vec_id, e, ca, cb FROM lists WHERE vec_id % {n_batches} = {k}),
vd{k} AS (
  SELECT b.vec_id, b.ca, b.cb,
         CAST(COUNT(s.vec_id) AS BIGINT) AS n_cell_candidates,
         CAST(COALESCE(SUM(CASE WHEN ROUND({cos}, 6) >= {threshold}
                            THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_near_dups
  FROM bat{k} b LEFT JOIN adm{k - 1} s ON b.ca = s.ca AND b.cb = s.cb
  GROUP BY b.vec_id, b.ca, b.cb
),
adm{k} AS (
  SELECT * FROM adm{k - 1}
  UNION ALL
  SELECT b.vec_id, b.e, b.ca, b.cb
  FROM bat{k} b JOIN vd{k} v ON b.vec_id = v.vec_id
  WHERE v.n_near_dups = 0
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM vd{k}" for k in range(n_batches)
    )
    return (
        _IMI_INDEX_PRELUDE
        + ","
        + ",".join(parts)
        + f"""
SELECT vec_id,
       CAST(vec_id % {n_batches} AS INTEGER) AS batch,
       CAST(ca AS BIGINT) AS ca,
       CAST(cb AS BIGINT) AS cb,
       n_cell_candidates, n_near_dups,
       CAST(CASE WHEN n_near_dups = 0 THEN 1 ELSE 0 END AS INTEGER)
         AS admit
FROM ({union})
ORDER BY vec_id
"""
    )


@register(
    "streaming_imi_admission",
    oracle=_imi_admission_oracle(),
    tags=(
        "streaming",
        "ext",
        "dedup",
        "semantic",
        "ann",
        "multi-index",
        "foreachBatch",
    ),
    description="streaming semantic admission over the inverted "
    "multi-index: cell-local near-dup probe per micro-batch",
)
def streaming_imi_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted multi-index run as a CONTINUOUS admission gate
    (the r9 verdict's second stretch ask): the two half-space
    quantizers are trained once batch-side (imi_train_halves — the
    index artifact, like the served classifier's weights), then
    embeddings arrive as four mtime-ordered micro-batches and each
    vector is admitted iff no already-admitted vector in its
    (ca, cb) cell is within 0.35 cosine
    (streaming/imi_admission.py — the dedup_admission
    replay-idempotent frame: batch-partitioned overwrite sinks,
    existing side excludes the current batch, verdicts sealed
    before the admitted table changes). The oracle re-derives BOTH
    Lloyd trainings, every cell assignment, and the full sequential
    4-batch admission unrolled in SQL, so the hash pins training,
    assignment, micro-batch routing, AND the order-dependent
    admission verdicts at once.

    Scale shape: per batch one broadcast of C₁+C₂ centroid rows,
    two map-side argmax aggregates, and a cell-pair EQUI-join
    against the standing index (at 100 TB the admitted table is
    partitioned by (ca, cb) — the probe reads 1/(C₁·C₂) of it);
    never all-pairs, no cross-batch driver state."""
    import os
    import shutil

    from wilayah_aceh_etl_spark.plans.round9_queries import (
        _await_stream_or_raise,
    )
    from wilayah_aceh_etl_spark.scratch import scratch_dir
    from wilayah_aceh_etl_spark.streaming.imi_admission import (
        imi_admission_stream,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cent_a, cent_b = S.imi_train_halves(emb, c_half=4, n_iter=2)
    # materialize the index artifact ONCE (C₁+C₂ = 8 rows) and serve
    # it as literal relations — the trained-quantizer analog of the
    # classifier filter's literal weights; without this every
    # micro-batch would lazily re-run both Lloyd trainings. Python
    # floats round-trip IEEE doubles exactly, so assignments are
    # bit-identical to the lazy form.
    cent_a, cent_b = (
        spark.createDataFrame(
            [(int(r["cid"]), list(r["cvec"])) for r in c.collect()],
            "cid long, cvec array<double>",
        )
        for c in (cent_a, cent_b)
    )

    base = scratch_dir("imiadm_src")
    for k in range(4):
        tmp = base + f"_stage{k}"
        emb.filter(F.col("vec_id") % 4 == k).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(base, f"batch{k}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        t = 1_600_000_000 + k * 1000
        os.utime(dst, (t, t))

    admitted = scratch_dir("imiadm_tbl", create=False)
    verdicts = scratch_dir("imiadm_vd", create=False)
    ckpt = scratch_dir("imiadm_ck", create=False)
    src = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    sq = imi_admission_stream(
        src, cent_a, cent_b, admitted, verdicts, ckpt, threshold=0.35
    ).trigger(availableNow=True).start()
    _await_stream_or_raise(sq, 600)
    return (
        spark.read.option("basePath", verdicts)
        .parquet(verdicts)
        .select(
            "vec_id",
            F.col("batch").cast("int").alias("batch"),
            "ca",
            "cb",
            "n_cell_candidates",
            "n_near_dups",
            "admit",
        )
        .orderBy("vec_id")
    )
