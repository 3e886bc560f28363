"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious:

  exact        — hash-groupBy on md5(text): one shuffle on a short key.
  fingerprint  — md5 of sorted distinct tokens: catches reordered copies.
  minhash+LSH  — shingle → k-minhash → banded buckets → candidate
                 pairs → exact-Jaccard verify. The only all-pairs-free
                 near-dup path that scales: the self-join is on band
                 hashes (tiny buckets), never on documents.
  simhash      — 16-bit majority fingerprint; hamming-≤r pairs.
  ngram-jaccard— exact Jaccard via shingle equi-join (ground truth /
                 verifier for the approximate paths).

Every step is built-in Catalyst expressions (no UDFs); the hash
family is md5-based so the DuckDB oracles compute the identical
signatures (plans/ext_queries.py).

At 100 TB: explode(shingles) is the big intermediate — it pipelines
into the partial min-aggregation map-side, so the shuffle carries
only (doc, k signatures). Band self-join keys are md5 strings with
near-uniform distribution — no skew salting needed; AQE handles
stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.functions.text import (
    doc_fingerprint,
    hex4_to_int,
    minhash_component,
    word_shingles,
)

DEFAULT_K = 8  # minhash signature length
DEFAULT_BANDS = 4  # LSH bands (rows per band = K / BANDS)


def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level exact-duplication profile in one pass."""
    h = F.md5(F.col(text_col))
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(h).alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(h)).alias("n_exact_dups"),
    )


def keep_first_exact(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup keeping the lowest id per text hash (one shuffle
    on the 32-char hash, not the document body)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def distinct_shingles(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc, shingle) pairs, distinct — the base relation for both
    minhash and exact-Jaccard. `spread` keeps the explode parallel
    even when the input scan is a single small file."""
    from wilayah_aceh_etl_spark.sources.tables import spread

    return (
        spread(df.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select(F.col("doc_id"), word_shingles(text_col, n).alias("sh"))
        .select("doc_id", F.explode("sh").alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, k: int = DEFAULT_K
) -> DataFrame:
    """k lexicographic-min md5 signatures per doc from the exploded
    (doc, shingle) relation. Partial aggregation makes this one
    shuffle carrying k×32 chars per doc."""
    aggs = [
        F.min(minhash_component(F.col("shingle"), s)).alias(f"mh{s}")
        for s in range(k)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def _mh_comp(seed: int) -> "Column":
    """array_min(transform(_sh, md5(seed#·))) — ONE memoized fragment
    per seed (functions/vectors.py::_frag): the HOF lambda costs
    ~15 ms of py4j per build and every signature build needs k=8."""
    from wilayah_aceh_etl_spark.functions.vectors import _frag

    return _frag(
        "mh_comp",
        (str(seed),),
        lambda: F.array_min(
            F.transform(F.col("_sh"), lambda s: minhash_component(s, seed))
        ).alias(f"mh{seed}"),
    )


def minhash_signatures_from_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Same signatures with ZERO shuffles: the shingle set stays an
    array column and each component is array_min(transform(...)) —
    a per-row expression, so signature computation is map-side only
    and parallelizes with input splits. Identical output to
    minhash_signatures∘distinct_shingles (docs with no shingles are
    dropped there by the explode, hence the size filter here)."""
    from wilayah_aceh_etl_spark.sources.tables import spread

    sh_arr = F.array_distinct(word_shingles(text_col, n))
    comps = [_mh_comp(seed) for seed in range(k)]
    return (
        spread(df.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select("doc_id", sh_arr.alias("_sh"))
        .filter(F.size("_sh") > 0)
        .select("doc_id", *comps)
    )


def lsh_band_hashes(
    sigs: DataFrame, k: int = DEFAULT_K, bands: int = DEFAULT_BANDS
) -> DataFrame:
    """Fold each band's rows into one hash → (doc_id, band_id,
    band_hash) long-form, the join key for candidate generation."""
    from wilayah_aceh_etl_spark.functions.vectors import _frag

    rows_per_band = k // bands

    def _band_col(b: int) -> "Column":
        parts = [
            F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        return F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat(*parts)).alias("band_hash"),
        )

    band_cols = [
        _frag("lsh_band", (str(k), str(bands), str(b)), lambda b=b: _band_col(b))
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Docs sharing any band bucket. Self-join on (band_id, hash):
    bucket sizes are tiny for non-duplicates, so the join output is
    ~O(duplicate pairs), not O(n²)."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame, min_shared: int = 1
) -> DataFrame:
    """Exact Jaccard for every doc pair sharing ≥min_shared shingles.
    The equi-join on shingle keeps this far below all-pairs; used
    directly as ground-truth dedup and as the verifier after LSH."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .filter(F.col("n_inter") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
    )


def jaccard_for_pairs(
    pairs: DataFrame, shingles: DataFrame, sizes: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard computed ONLY for the given (doc_a, doc_b) pairs.

    This is the verify step after candidate generation: the pair set
    is tiny (≈ O(true duplicates)), so Catalyst broadcasts it into
    the shingle scan and the intersection count touches only shingles
    of candidate docs — never the all-co-shingle-pairs blowup that
    `jaccard_pairs` materializes (1.1M pairs vs 640 candidates at
    sf0.1).

    When `sizes` is None (the standalone form), the denominator
    sizes are candidates-only: the shingle relation is semi-joined
    to the pair docs (broadcast — the pair set is tiny by
    construction) before the count aggregation, so no corpus-wide
    aggregation survives in the verify stage.

    `sizes` (optional): a precomputed (doc_id, n_sh) relation. When
    the caller already holds the per-doc shingle arrays (the r12
    array-persisted pipeline), `size(_sh)` IS the distinct-shingle
    count — passing it skips the scoped explode + count aggregation
    (one Exchange + two HashAggregates) entirely. Note the passed
    relation MAY be corpus-wide (one short row per doc off the
    already-persisted arrays — a projection, not an aggregation);
    the inner joins on doc_a/doc_b restrict it to candidates, and
    at scale the tiny `inter` side broadcasts into it."""
    if sizes is None:
        cand_ids = (
            pairs.select(F.col("doc_a").alias("doc_id"))
            .union(pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        scoped = shingles.join(F.broadcast(cand_ids), "doc_id", "left_semi")
        sizes = scoped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
    )


def verified_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: candidates from banded
    minhash, verified with exact Jaccard ≥ threshold — the Jaccard is
    computed only for candidate pairs (a pair with zero shared
    shingles can never reach a positive threshold, so restricting to
    LSH candidates loses nothing).

    The persisted relation is the per-doc DISTINCT SHINGLE ARRAY
    (r12 optimization round): `array_distinct` replaces the exploded
    relation's corpus-wide `.distinct()` (one Exchange + two
    HashAggregates — dedup within a doc never needed a shuffle), the
    signatures become map-side `array_min(transform(...))` per-row
    expressions instead of a `min(string)×k` aggregation — which
    Spark can only run as Sort+SortAggregate, a var-length buffer
    cannot use HashAggregate — and the verify-side sizes are
    `size(_sh)` instead of a count aggregation. Plan diff at sf0.1:
    the cached-relation build drops from
    Exchange+HashAgg×2+Generate+Exchange to Generate-free
    scan+project (zero shuffles), and the signature path loses
    Sort+Exchange+SortAggregate×2. Whole-query A/B at sf0.1 /
    local[32], min-of-3 after warmup, fresh session each, identical
    256-pair output: 2.07–2.21 s → 1.48–1.60 s (−28%). The array
    relation feeds all six consuming subtrees (signatures; both
    explode sides of the verify; sizes ×2) — at 100 TB still ONE
    corpus pass, and the cache holds one array row per doc instead
    of ~|shingles| exploded rows.

    (The round-11 A/B that measured the map-side-signature pipeline
    at 5.78 s vs 1.81 s persisted conflated the signature form with
    dropping the cache: recomputing the text scan + shingling twice
    dominated. With the array CACHED, map-side signatures win —
    the md5 count is identical, the sort/shuffle is gone. The
    uncached single-corpus-wide-shuffle shape remains available as
    verified_near_dup_pairs_mapside for the memory-starved regime.)"""
    from pyspark import StorageLevel

    from wilayah_aceh_etl_spark.functions.text import word_shingles
    from wilayah_aceh_etl_spark.sources.tables import spread

    sh_arr = (
        spread(df.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select(
            "doc_id",
            F.array_distinct(word_shingles(text_col, n)).alias("_sh"),
        )
        .filter(F.size("_sh") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # _mh_comp: one memoized fragment per seed; its lambda takes
    # exactly ONE parameter — PySpark binds a second (even defaulted)
    # parameter to the ELEMENT INDEX column, silently replacing the
    # seed (F.transform invokes the Python fn eagerly at build time,
    # so the plain closure over the loop variable is correct).
    sigs = sh_arr.select("doc_id", *[_mh_comp(seed) for seed in range(k)])
    # candidate pairs are tiny (≈ O(true duplicates)) and feed three
    # verify subtrees (broadcast size scope + the inter join) —
    # persist so the band self-join runs once
    cands = lsh_candidate_pairs(lsh_band_hashes(sigs, k, bands)).persist()
    sh = sh_arr.select("doc_id", F.explode("_sh").alias("shingle"))
    sizes = sh_arr.select(
        "doc_id", F.size("_sh").cast("long").alias("n_sh")
    )
    out = (
        jaccard_for_pairs(cands, sh, sizes=sizes)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    # Cache-lifetime contract (r12 verdict ask #5, mirroring
    # semantic_dedup._ranked_cache): the persisted shingle-array
    # relation is CORPUS-SIZED and Spark's CacheManager never evicts
    # entries, so a long-lived driver deduping many distinct corpora
    # would pin one MEMORY_AND_DISK relation per corpus forever. The
    # caller owns release — materialize the result, then
    # `out._shingle_cache.unpersist()` (and `_cands_cache`, tiny).
    # Short-lived gate/bench processes may skip it; the memory-starved
    # at-scale form is verified_near_dup_pairs_mapside (no corpus
    # cache at all).
    out._shingle_cache = sh_arr
    out._cands_cache = cands
    return out


def verified_near_dup_pairs_mapside(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Same output as verified_near_dup_pairs, different shuffle
    budget — the shape that wins when the corpus dwarfs executor
    memory (the 100 TB case):

      1. signatures map-side (array_min over the per-row shingle
         array; ZERO shuffles, nothing cached),
      2. band self-join over the tiny (doc, band, hash) relation —
         the only corpus-wide shuffle carries k×32 chars per doc,
         never the exploded shingles,
      3. exact-Jaccard verify on a shingle relation SEMI-JOINED to
         candidate doc ids first, so the explode+distinct shuffle
         covers only candidate docs (≈ O(true duplicates)), not the
         corpus.

    The candidate pair set is persisted (tiny: it feeds the semi-join
    and the verify join). Versus the persisted-relation form: no
    corpus-sized cache, one corpus-wide shuffle instead of two —
    the trade is recomputing the text scan twice (signatures +
    scoped verify), which at scale is cheaper than caching the
    ~10× larger exploded shingle relation."""
    docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    sigs = minhash_signatures_from_docs(df, id_col, text_col, n, k)
    cands = lsh_candidate_pairs(
        lsh_band_hashes(sigs, k, bands)
    ).persist()
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = distinct_shingles(
        docs.join(cand_docs, "doc_id", "left_semi"), "doc_id", text_col, n
    )
    return (
        jaccard_for_pairs(cands, sh_cand)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Cluster the near-dup pair graph: every doc gets
    cluster_id = min(doc_id reachable from it). This is the step that
    turns pairwise similarity into actual corpus dedup (keep one
    canonical doc per cluster).

    Min-label propagation: each round every node takes the min of its
    own and its neighbors' labels — one shuffle per round, converges
    in O(graph diameter) rounds (near-dup clusters are shallow; 25
    covers any realistic chain). localCheckpoint truncates lineage so
    round N's plan doesn't replay rounds 1..N-1 — the standard Spark
    iterative-algorithm pattern. The driver-side loop only checks a
    scalar convergence count; all data movement is distributed."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .union(
            pairs.select(F.col(a_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .union(
            pairs.select(F.col(b_col).alias("src"), F.col(b_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.groupBy("src").agg(F.min("src").alias("label"))
    for _ in range(max_iterations):
        e = edges.alias("e")
        lbl = labels.alias("lbl")
        propagated = (
            e.join(lbl, F.col("e.dst") == F.col("lbl.src"))
            .groupBy(F.col("e.src").alias("src"))
            .agg(F.min("lbl.label").alias("new_label"))
        )
        joined = labels.join(propagated, "src").localCheckpoint(eager=True)
        n_changed = joined.filter(
            F.col("new_label") != F.col("label")
        ).count()
        labels = joined.select("src", F.col("new_label").alias("label"))
        if n_changed == 0:
            break
    return labels.select(
        F.col("src").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def fingerprint_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Canonical-token-set fingerprint per doc."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        doc_fingerprint(F.col(text_col)).alias("fingerprint"),
    )


def _simhash_bits(n_bits: int) -> list[int]:
    return list(range(n_bits))


def simhash16(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """16-bit SimHash over distinct tokens: per bit, majority vote of
    (±1) contributions derived from each token's md5-prefix integer.
    Pure expressions: explode → conditional sums → bit pack; one
    shuffle on doc_id."""
    from wilayah_aceh_etl_spark.sources.tables import spread

    toks = spread(df.select(F.col(id_col).alias("doc_id"), F.col(text_col))).select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).withColumn("h4", hex4_to_int(F.md5(F.col("tok"))))

    bit_aggs = [
        F.sum(
            F.when((F.floor(F.col("h4") / (2**j)) % 2) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in _simhash_bits(16)
    ]
    votes = toks.groupBy("doc_id").agg(*bit_aggs)
    fp = None
    for j in _simhash_bits(16):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return votes.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_near_pairs(
    fps: DataFrame, max_hamming: int = 3, n_bits: int = 16
) -> DataFrame:
    """Pairs within hamming radius, WITHOUT the all-pairs join.

    Pigeonhole banding: split the fingerprint into max_hamming+1
    equal-ish chunks — a pair with ≤max_hamming differing bits must
    agree EXACTLY on at least one chunk. Equi-join on (chunk_idx,
    chunk_value), dedup candidates, then the exact hamming filter.
    Identical output to the naive O(n²) comparison, but the join is
    hash-partitioned on chunk values — the same candidates-only
    shape as MinHash LSH, and the plan has no nested-loop join."""
    n_chunks = max_hamming + 1
    width = -(-n_bits // n_chunks)  # ceil
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_idx"),
                (F.floor(F.col("simhash") / (2 ** (i * width))).cast("long")
                 % (2**width)).alias("chunk_val"),
            )
            for i in range(n_chunks)
        ]
    )
    banded = fps.select(
        "doc_id", "simhash", F.explode(chunks).alias("c")
    ).select("doc_id", "simhash", "c.chunk_idx", "c.chunk_val")
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def incremental_near_dup_filter(
    existing: DataFrame,
    incoming: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Incremental corpus growth: admit each incoming document only if
    it is neither an exact copy nor a near-dup (Jaccard ≥ threshold)
    of the EXISTING corpus. The production shape — a corpus is built
    batch by batch, and each batch dedups against what is already
    admitted, not against itself.

    Returns (doc_id, is_exact_dup, near_dup_of, kept): near_dup_of is
    the smallest existing doc id whose verified Jaccard clears the
    threshold (null when none), kept = not exact and no near-dup.

    Scale shape: the existing side's signatures/bands are a stored
    index in production — here both sides derive them the same way.
    Candidates come from an incoming⋈existing band-bucket equi-join
    (never incoming×existing); exact Jaccard runs only on candidates.
    Exact-dup probing joins on md5(text), a 32-char key, so document
    bodies never shuffle."""
    inc_sh = distinct_shingles(incoming, id_col, text_col, n)
    ex_sh = distinct_shingles(existing, id_col, text_col, n)

    inc_bands = lsh_band_hashes(minhash_signatures(inc_sh, k), k, bands)
    ex_bands = lsh_band_hashes(minhash_signatures(ex_sh, k), k, bands)
    cands = (
        inc_bands.alias("i")
        .join(
            ex_bands.alias("e"),
            (F.col("i.band_id") == F.col("e.band_id"))
            & (F.col("i.band_hash") == F.col("e.band_hash")),
        )
        .select(
            F.col("i.doc_id").alias("doc_a"), F.col("e.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with exact Jaccard over the union shingle set
    # (jaccard_for_pairs is side-agnostic: doc_a = incoming, doc_b = existing)
    verified = (
        jaccard_for_pairs(cands, inc_sh.unionByName(ex_sh))
        .filter(F.col("jaccard") >= threshold)
        .groupBy("doc_a")
        .agg(F.min("doc_b").alias("near_dup_of"))
    )

    ex_hashes = existing.select(
        F.md5(F.col(text_col)).alias("_h")
    ).distinct()
    inc = incoming.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("_h")
    )
    exact = (
        inc.join(ex_hashes.withColumn("_dup", F.lit(True)), "_h", "left")
        .select("doc_id", F.coalesce("_dup", F.lit(False)).alias("is_exact_dup"))
    )
    return (
        exact.join(verified, exact.doc_id == verified.doc_a, "left")
        .select(
            "doc_id",
            "is_exact_dup",
            "near_dup_of",
            (
                (~F.col("is_exact_dup")) & F.col("near_dup_of").isNull()
            ).alias("kept"),
        )
    )


def segment_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 10,
) -> DataFrame:
    """Line/paragraph-level exact dedup across the corpus — the
    CCNet/RefinedWeb shape: hash each segment, keep only the FIRST
    corpus-wide occurrence (order = (doc_id, seg_idx)), report the
    per-document retained fraction. The corpus here carries no
    newlines, so 'lines' are fixed windows of `seg_tokens` whitespace
    tokens — the segmentation function is the pluggable part, the
    dedup topology is the point.

    Scale: segments shuffle as (md5, doc_id, seg_idx) triples — the
    segment TEXT never leaves the map side. One shuffle, partitioned
    by segment hash (md5-uniform, no skew); the keep-first rule is a
    row_number window on that same partitioning, so no second
    exchange; the per-doc rollup shuffles one row per document.
    Cleaned-text reconstruction (not emitted here) joins the kept
    (doc_id, seg_idx) set back to a fresh map-side segmentation —
    bodies still never shuffle."""
    from pyspark.sql.window import Window

    segs = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.expr(
                "transform("
                f"  sequence(0, CAST((size(split({text_col}, ' ')) - 1) "
                f"                   / {seg_tokens} AS INT)),"
                f"  i -> array_join(slice(split({text_col}, ' '),"
                f"                        i * {seg_tokens} + 1, {seg_tokens}),"
                "                   ' '))"
            )
        ).alias("seg_idx", "seg"),
    ).select("doc_id", "seg_idx", F.md5(F.col("seg")).alias("h"))
    w = Window.partitionBy("h").orderBy("doc_id", "seg_idx")
    kept = segs.select(
        "doc_id",
        (F.row_number().over(w) == 1).cast("int").alias("is_first"),
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum("is_first").cast("long").alias("n_kept"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_kept",
            F.round(
                1.0 - F.col("n_kept") / F.col("n_segments"), 4
            ).alias("dup_ratio"),
        )
    )
