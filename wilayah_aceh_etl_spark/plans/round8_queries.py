"""Round-8 query family (build round 6): the post-training /
evaluation side of the LLM data pipeline — tokenizer APPLY (the
read side of BPE training), unbiased pass@k, GRPO group-relative
advantages, and inter-annotator agreement. Every query carries a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.plans.registry import register
from wilayah_aceh_etl_spark.plans.round7_queries import (
    _bpe_learn_merges,
    _bpe_step_sql,
)
from wilayah_aceh_etl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Tokenizer APPLY: train merges on the whole corpus, tokenize docs
# ---------------------------------------------------------------------------

_BPE_APPLY_ORACLE = (
    """
WITH vocab AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
  GROUP BY w
),
w0 AS (
  SELECT w, freq, array_to_string(string_split(w, ''), '|') AS s FROM vocab
),
"""
    + ",".join(_bpe_step_sql(i) for i in (1, 2, 3))
    + """,
dwf AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents WHERE doc_id < 200
  ) WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
),
toks AS MATERIALIZED (
  SELECT w,
         len(string_split(
           replace(replace(replace(
             array_to_string(string_split(w, ''), '|'),
             (SELECT a || '|' || b FROM best1), (SELECT a || b FROM best1)),
             (SELECT a || '|' || b FROM best2), (SELECT a || b FROM best2)),
             (SELECT a || '|' || b FROM best3), (SELECT a || b FROM best3)),
           '|')) AS n_tok
  FROM (SELECT DISTINCT w FROM dwf)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(t.n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(length(d.w)) AS BIGINT) AS n_chars
FROM dwf d JOIN toks t USING (w)
GROUP BY doc_id
ORDER BY doc_id
"""
)


@register(
    "tokenizer_bpe_apply_counts",
    oracle=_BPE_APPLY_ORACLE,
    tags=("ext", "text", "bpe", "tokenizer", "apply"),
    description="apply 3 trained BPE merges; per-doc word/token/char counts",
)
def tokenizer_bpe_apply_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The READ side of BPE: train 3 merges on the full corpus
    (round7's _bpe_learn_merges — the same loop text_bpe_train_merges
    hash-pins), then TOKENIZE documents with the learned merge table
    and report per-doc token economics. The oracle re-derives
    training AND application, so a hash match pins the whole
    train→apply contract.

    Scale shape: merges are O(n_iter) driver state; tokenization runs
    on the DISTINCT word set (vocabulary-sized, not corpus-sized) and
    is broadcast-joined back to word occurrences — the standard way a
    tokenizer maps a petabyte corpus without re-tokenizing repeated
    words. Application is a literal left-to-right replace per merge,
    in training order — exactly greedy BPE (see
    text_bpe_train_merges for why replace == the classic merge)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_learn_merges(docs, n_iter=3)
    words = (
        docs.filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
        )
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
    )
    tok = F.regexp_replace(F.col("w"), "(?<=.)(?=.)", "|")
    for _, a, b, _, _ in merges:
        tok = F.replace(tok, F.lit(a + "|" + b), F.lit(a + b))
    vocab_tok = (
        words.select("w")
        .distinct()
        .select("w", F.size(F.split(tok, "\\|")).alias("n_tok"))
    )
    return (
        words.join(F.broadcast(vocab_tok), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# pass@k: the unbiased estimator over per-problem sample outcomes
# ---------------------------------------------------------------------------


@register(
    "model_eval_pass_at_k",
    oracle="""
WITH prob AS (
  SELECT c_custkey AS problem_id,
         10 + c_custkey % 11 AS n,
         (c_custkey * 7) % (10 + c_custkey % 11 + 1) AS c
  FROM customer WHERE c_custkey < 200
),
f AS (  -- exact factorials 0..20 (n <= 20 here); 0! has no joined
        -- terms, so PRODUCT sees only the NULL left-join row
  SELECT i, CAST(COALESCE(PRODUCT(j), 1) AS BIGINT) AS fact
  FROM UNNEST(range(21)) AS t(i)
       LEFT JOIN UNNEST(range(1, 21)) AS s(j) ON j <= i
  GROUP BY i
),
est AS (
  SELECT problem_id, n, c,
         CASE WHEN n - c < k THEN CAST(0 AS BIGINT)
              ELSE (SELECT fact FROM f WHERE i = n - c)
                   / ((SELECT fact FROM f WHERE i = k)
                      * (SELECT fact FROM f WHERE i = n - c - k)) END AS num,
         (SELECT fact FROM f WHERE i = n)
           / ((SELECT fact FROM f WHERE i = k)
              * (SELECT fact FROM f WHERE i = n - k)) AS den,
         k
  FROM prob, UNNEST([1, 5, 10]) AS kk(k)
)
SELECT problem_id,
       CAST(n AS INTEGER) AS n_samples,
       CAST(c AS INTEGER) AS n_correct,
       CAST(k AS INTEGER) AS k,
       ROUND(1.0 - CAST(num AS DOUBLE) / den, 6) AS pass_at_k
FROM est
ORDER BY problem_id, k
""",
    tags=("ext", "ml", "eval", "pass-at-k"),
    description="unbiased pass@k estimator (exact integer binomials)",
)
def model_eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard unbiased pass@k estimator for sampled code/answer
    evaluation: pass@k = 1 − C(n−c, k)/C(n, k) per problem, with n
    samples and c correct. Both sides compute the binomials as EXACT
    integer factorial ratios (n ≤ 20 keeps them far inside BIGINT),
    so the only float is the final division — bit-identical across
    engines. Synthetic (n, c) derive deterministically from customer
    keys. Scale: one row per (problem, k); the factorial lookup is a
    21-row broadcast."""
    fact = {0: 1}
    for i in range(1, 21):
        fact[i] = fact[i - 1] * i
    fact_df = F.broadcast(
        spark.createDataFrame(
            [(i, v) for i, v in fact.items()], "i int, fact long"
        )
    )
    prob = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 200)
        .select(
            F.col("c_custkey").alias("problem_id"),
            (10 + F.col("c_custkey") % 11).cast("int").alias("n"),
            ((F.col("c_custkey") * 7) % (10 + F.col("c_custkey") % 11 + 1))
            .cast("int")
            .alias("c"),
        )
    )
    ks = spark.createDataFrame([(1,), (5,), (10,)], "k int")
    est = prob.crossJoin(F.broadcast(ks))
    for col, idx in (("f_nc", F.col("n") - F.col("c")),
                     ("f_k", F.col("k")),
                     ("f_nck", F.col("n") - F.col("c") - F.col("k")),
                     ("f_n", F.col("n")),
                     ("f_nk", F.col("n") - F.col("k"))):
        est = est.join(
            fact_df.select(
                F.col("i").alias(f"_{col}_i"), F.col("fact").alias(col)
            ),
            idx == F.col(f"_{col}_i"),
            "left",
        ).drop(f"_{col}_i")
    num = F.when(
        F.col("n") - F.col("c") < F.col("k"), F.lit(0).cast("long")
    ).otherwise(
        (F.col("f_nc") / (F.col("f_k") * F.col("f_nck"))).cast("long")
    )
    den = (F.col("f_n") / (F.col("f_k") * F.col("f_nk"))).cast("long")
    return (
        est.select(
            "problem_id",
            F.col("n").alias("n_samples"),
            F.col("c").alias("n_correct"),
            "k",
            F.round(
                F.lit(1.0) - num.cast("double") / den.cast("double"), 6
            ).alias("pass_at_k"),
        )
        .orderBy("problem_id", "k")
    )


# ---------------------------------------------------------------------------
# GRPO: group-relative advantages from exact integer moments
# ---------------------------------------------------------------------------


@register(
    "ml_grpo_group_advantages",
    oracle="""
WITH r AS (
  SELECT user_id % 50 AS group_id, event_id,
         CAST(ROUND(value * 1000) AS BIGINT) AS reward_milli
  FROM events WHERE user_id < 30
),
g AS (
  SELECT group_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(reward_milli) AS BIGINT) AS s1,
         CAST(SUM(reward_milli * reward_milli) AS BIGINT) AS s2
  FROM r GROUP BY group_id
)
SELECT r.group_id, r.event_id, r.reward_milli,
       ROUND(CASE WHEN g.n * g.s2 = g.s1 * g.s1 THEN 0.0
                  ELSE (g.n * r.reward_milli - g.s1)
                       / sqrt(CAST(g.n * g.s2 - g.s1 * g.s1 AS DOUBLE)
                              * g.n) END, 6) AS advantage
FROM r JOIN g USING (group_id)
ORDER BY group_id, event_id
""",
    tags=("ext", "ml", "rl", "grpo"),
    description="GRPO group-relative advantages ((r-mean)/std per group)",
)
def ml_grpo_group_advantages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRPO-style reward normalization (the group-relative policy
    optimization baseline: per prompt-group, advantage =
    (r − mean)/std, zero for degenerate constant-reward groups).
    Determinism device: rewards quantize to integer millis, so the
    group moments (n, Σr, Σr²) are EXACT integers and the advantage
    is one float expression both engines evaluate identically —
    advantage = (n·r − Σr)/√((n·Σr² − (Σr)²)·n), algebraically
    (r − μ)/σ_pop without ever forming a float intermediate.
    Scale: one shuffle to the group aggregate, broadcast back —
    identical to the trainer's reward-normalization stage."""
    r = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .select(
            (F.col("user_id") % 50).alias("group_id"),
            "event_id",
            F.round(F.col("value") * 1000)
            .cast("long")
            .alias("reward_milli"),
        )
    )
    g = r.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("reward_milli").cast("long").alias("s1"),
        F.sum(F.col("reward_milli") * F.col("reward_milli"))
        .cast("long")
        .alias("s2"),
    )
    adv = F.when(
        F.col("n") * F.col("s2") == F.col("s1") * F.col("s1"), F.lit(0.0)
    ).otherwise(
        (F.col("n") * F.col("reward_milli") - F.col("s1"))
        / F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            * F.col("n")
        )
    )
    return (
        r.join(F.broadcast(g), "group_id")
        .select(
            "group_id",
            "event_id",
            "reward_milli",
            F.round(adv, 6).alias("advantage"),
        )
        .orderBy("group_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Inter-annotator agreement: Cohen's kappa from exact counts
# ---------------------------------------------------------------------------


@register(
    "labels_cohens_kappa",
    oracle="""
WITH lab AS (
  SELECT o_orderkey AS item_id,
         o_orderkey % 3 AS r1,
         (o_orderkey % 3 + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
           % 3 AS r2
  FROM orders WHERE o_orderkey < 2000
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT) AS agree
  FROM lab
),
pe AS (
  SELECT CAST(SUM(c1 * c2) AS BIGINT) AS cross_sum
  FROM (
    SELECT k,
           CAST(SUM(CASE WHEN r1 = k THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN r2 = k THEN 1 ELSE 0 END) AS BIGINT) AS c2
    FROM lab, UNNEST(range(3)) AS t(k)
    GROUP BY k
  )
)
SELECT m.n AS n_items,
       ROUND(CAST(m.agree AS DOUBLE) / m.n, 6) AS p_observed,
       ROUND(CAST(pe.cross_sum AS DOUBLE) / (m.n * m.n), 6) AS p_expected,
       ROUND((CAST(m.agree AS DOUBLE) * m.n - pe.cross_sum)
             / (CAST(m.n AS DOUBLE) * m.n - pe.cross_sum), 6) AS kappa
FROM m, pe
""",
    tags=("ext", "labels", "agreement", "quality"),
    description="Cohen's kappa between two deterministic annotators",
)
def labels_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement for label-quality audits: Cohen's
    κ = (p_o − p_e)/(1 − p_e) between two raters over 3 classes.
    All inputs to the float expressions are exact integer counts
    (agreements, per-class marginals), and κ is computed as the
    single ratio (agree·n − Σc1·c2)/(n² − Σc1·c2) so both engines
    evaluate the same two-operand division. One aggregation over the
    labels, one over the 3-class marginals — no per-item state."""
    lab = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            (F.col("o_orderkey") % 3).alias("r1"),
            (
                (
                    F.col("o_orderkey") % 3
                    + F.when(F.col("o_orderkey") % 7 == 0, 1).otherwise(0)
                )
                % 3
            ).alias("r2"),
        )
    )
    m = lab.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("r1") == F.col("r2"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    marg = (
        lab.crossJoin(
            F.broadcast(spark.createDataFrame([(0,), (1,), (2,)], "k int"))
        )
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("r1") == F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("r2") == F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        )
        .agg(F.sum(F.col("c1") * F.col("c2")).cast("long").alias("cross_sum"))
    )
    return m.crossJoin(F.broadcast(marg)).select(
        F.col("n").alias("n_items"),
        F.round(F.col("agree").cast("double") / F.col("n"), 6).alias(
            "p_observed"
        ),
        F.round(
            F.col("cross_sum").cast("double") / (F.col("n") * F.col("n")), 6
        ).alias("p_expected"),
        F.round(
            (F.col("agree").cast("double") * F.col("n") - F.col("cross_sum"))
            / (
                F.col("n").cast("double") * F.col("n")
                - F.col("cross_sum")
            ),
            6,
        ).alias("kappa"),
    )
