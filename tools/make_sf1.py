"""Synthesize a deterministic local sf1 dataset (10× sf0.1) for the
one-decade-higher scaling validation (r6 verdict ask #3).

Method: union sf0.1 with 9 KEY-SHIFTED copies — no randomness, no new
fixtures. Every key domain is shifted by copy_index × 1e9 so
referential integrity holds copy-locally (orders.o_custkey points at
the same copy's customers, lineitem at the same copy's
orders/parts/suppliers), exactly how a 10× TPC-H load grows. The
fixed dims (region, nation) keep their real-world cardinality —
at any SF TPC-H has 25 nations — so nationkey references stay valid
uncopied.

Two content perturbations keep data STATISTICS scale-honest instead
of creating a 10-fold-duplicate artifact:

  * documents.text — every 3rd word of copy k>0 is tagged with an
    all-letter copy marker (words stay ^[a-z]+$-alphabetic so
    quality-rule selectivity is preserved), so shingles of width ≥3
    differ across copies and the
    corpus near-duplicate RATE stays that of sf0.1 (10 verbatim
    copies would give every doc 9 exact dups and inflate the LSH
    candidate count ~45×, a data artifact that would masquerade as
    super-linear MinHash scaling). Within-copy dup structure is
    untouched: the same positions are tagged in every doc.
  * embeddings.embedding — copy k>0 gets a tiny deterministic
    per-coordinate offset (±0.03 grid keyed on vec_id, position and
    copy), so vectors are near but not bit-equal and ANN top-k does
    not degenerate into cosine-1.0 tie-breaking.

Usage: python tools/make_sf1.py [out_dir]   (default /root/repo/_sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000_000
N_COPIES = 10

# key columns shifted per copy (referential integrity is copy-local)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]


def _copy(df: DataFrame, table: str, k: int) -> DataFrame:
    out = df
    for col in SHIFT[table]:
        out = out.withColumn(col, F.col(col) + F.lit(k * OFF))
    if k and table == "documents":
        words = F.split(F.col("text"), " ")
        # all-LETTER tag: a digit suffix would fail the ^[a-z]+$
        # alphabetic test for ~1/3 of words in 90% of the corpus and
        # skew quality-rule selectivity at sf1 — the letter tag
        # perturbs shingles identically while keeping words alphabetic
        tag = "x" + chr(ord("a") + k)
        tagged = F.transform(
            words,
            lambda w, i: F.when(
                i % 3 == k % 3, F.concat(w, F.lit(tag))
            ).otherwise(w),
        )
        out = out.withColumn("text", F.array_join(tagged, " "))
        out = out.withColumn("n_chars", F.length("text"))
    if k and table == "embeddings":
        out = out.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda v, i: (
                    v
                    + (
                        (F.col("vec_id") % OFF) * 31 + i * 5 + k * 11
                    ).cast("int")
                    % 7
                    * F.lit(0.01)
                    - F.lit(0.03)
                ).cast("float"),
            ),
        )
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_sf1"
    spark = get_spark("make_sf1", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for table in FIXED_DIMS:
        spark.read.parquet(f"{SRC}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{table}.parquet")
        print(f"{table}: copied (fixed dim)")
    for table in sorted(SHIFT):
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = [_copy(src, table, k) for k in range(N_COPIES)]
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        full.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        n = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
        print(f"{table}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
