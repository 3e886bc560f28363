"""Distributed model training primitives (data-parallel full-batch
gradient descent) with cross-engine bit-determinism.

The training shape is the canonical one for a Spark cluster: weights
live on the driver (d+1 doubles), each iteration broadcasts them
into a map-side expression, the gradient is a partial-combining
aggregate keyed by feature position (≤ d+1 groups ever shuffled),
and the driver applies the update. The corpus never moves; per
iteration it is scanned once — exactly MLlib's treeAggregate loop,
expressed in DataFrame algebra.

Determinism devices (shared with the k-means trainer,
operators/similarity.py::kmeans_centroids):

  * per-row gradient contributions are quantized to integers of
    ROUND(g·2²⁴) and summed EXACTLY, so the reduce is
    order-independent and both engines (Spark, DuckDB oracle) get
    the identical update — float summation order can never flap the
    hash;
  * the squashing function is the RATIONAL sigmoid
    σ̂(m) = 0.5 + m / (2·(1+|m|)) instead of 1/(1+e^-m): pure IEEE
    arithmetic, so Spark (Java Math) and the oracle (libm) cannot
    diverge by an ulp the way exp() can. Same sign, same 0.5
    midpoint, same monotonicity — for a production model swap the
    one expression back to exp and drop the oracle to rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.functions.vectors import as_double, dot

Q = 16777216  # 2^24 — the repo-wide quantization for exact reduces


def _margin(w: list[float], b: float):
    """m = w·x + b as a Spark column over `x` (array<double>) —
    sequential-fold dot, bitwise equal to DuckDB list_dot_product."""
    warr = F.array(*[F.lit(float(v)) for v in w])
    return dot(F.col("x"), warr) + F.lit(float(b))


def logreg_train_quantized(
    df: DataFrame,
    n_iter: int = 3,
    lr: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "y",
) -> DataFrame:
    """Full-batch gradient descent for binary logistic regression
    (rational sigmoid), starting from w = 0, b = 0. Returns one row
    per iteration: (iter, n_correct with the post-update weights,
    b_q = ROUND(b·2²⁴), w_checksum = Σ_j ROUND(w_j·2²⁴)) — every
    output an exact integer, so the whole training trajectory is
    hash-pinned against the SQL oracle.

    err_i = σ̂(w·x_i + b) − y_i;  ∂/∂w_j = Σ_i err_i·x_ij / N.
    The per-iteration driver traffic is d+1 quantized sums (a
    collect of ≤ 65 rows here) — metadata-scale, like Delta stats
    or the k-means centroid table."""
    v = df.select(
        F.col(id_col).alias("vec_id"),
        as_double(F.col(vec_col)).alias("x"),
        F.col(label_col).cast("int").alias("y"),
    ).persist()
    try:
        n = v.count()
        d = int(v.select(F.size("x")).first()[0])
        u = v.select(
            "vec_id", "y", F.posexplode("x").alias("pos0", "val")
        ).select("vec_id", "y", (F.col("pos0") + 1).alias("pos"), "val")

        w = [0.0] * d
        b = 0.0
        out_rows = []
        for it in range(1, n_iter + 1):
            m = _margin(w, b)
            sig = F.lit(0.5) + m / (F.lit(2.0) * (F.lit(1.0) + F.abs(m)))
            err_by_id = v.select(
                "vec_id", (sig - F.col("y")).alias("e")
            )
            gw = (
                u.join(err_by_id, "vec_id")
                .groupBy("pos")
                .agg(
                    F.sum(
                        F.round(F.col("e") * F.col("val") * Q).cast("long")
                    ).alias("s")
                )
                .collect()
            )
            gb = err_by_id.agg(
                F.sum(F.round(F.col("e") * Q).cast("long")).alias("s")
            ).first()["s"]
            sums = {r["pos"]: r["s"] for r in gw}
            # identical op order to the oracle: (s/Q)/n, then w - lr*g
            w = [
                w[j] - lr * (float(sums.get(j + 1, 0)) / Q / n)
                for j in range(d)
            ]
            b = b - lr * (float(gb) / Q / n)

            # post-update metrics, computed ENGINE-side so rounding
            # follows SQL semantics on both sides
            m2 = _margin(w, b)
            correct = F.when(
                (m2 > 0) == (F.col("y") == 1), 1
            ).otherwise(0)
            n_correct = v.agg(
                F.sum(correct).cast("long").alias("c")
            ).first()["c"]
            chk = (
                v.sparkSession.range(1)
                .select(
                    sum(
                        [F.round(F.lit(float(wj)) * Q).cast("long") for wj in w],
                        start=F.lit(0).cast("long"),
                    ).alias("w_checksum"),
                    F.round(F.lit(float(b)) * Q).cast("long").alias("b_q"),
                )
                .first()
            )
            out_rows.append(
                (it, int(n_correct), int(chk["b_q"]), int(chk["w_checksum"]))
            )
        return v.sparkSession.createDataFrame(
            out_rows,
            "iter int, n_correct bigint, b_q bigint, w_checksum bigint",
        )
    finally:
        v.unpersist()
