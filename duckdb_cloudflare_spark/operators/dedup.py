"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the part that matters at 100 TB):

- Exact dedup is a hash-aggregate on a fingerprint — one shuffle on a
  high-cardinality key (no skew by construction: md5 output).
- Near-dup families NEVER do all-pairs: candidate generation is LSH banding
  (shingle → minhash → band → bucket-join), so the only shuffle is on band
  hashes and the quadratic blow-up is confined to within-bucket candidate
  sets. Verification (exact Jaccard / Hamming / cosine) runs only on
  candidates.
- All hashing uses JVM-side xxhash64/md5 with per-permutation seeds — no
  Python UDFs in the hot path, everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_cloudflare_spark.operators.text_analysis import normalize_text, tokens


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the input is under-parallelized
    (fewer partitions than cores — e.g. one small parquet file). At scale the
    scan already yields hundreds of partitions and this is a no-op, so the
    extra shuffle is paid exactly when it is cheapest and never when the
    input is large. The expensive hashing/signature maps below are
    higher-order-function expressions (interpreted, not codegen) — leaving
    them on a single partition serializes the whole operator."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per distinct (normalized) text.

    One shuffle on md5(text) — uniform key distribution, no skew. Returns the
    surviving ids + the duplicate-group size.
    """
    fp = F.md5(normalize_text(F.col(text_col))).alias("fp")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("group_size"))
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash + LSH banding
# ---------------------------------------------------------------------------


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as strings (space-joined), distinct. Empty text → [].

    Built from k array slices folded with zip_with (O(k) array passes per
    doc) rather than transform-over-positions with a slice per position
    (O(n·k) interpreted ops) — measured ~1.7× faster; higher-order
    functions run interpreted, so pass count is what matters."""
    toks = tokens(text)
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))  # number of shingles
    sh = F.slice(toks, 1, m)
    for offset in range(2, k + 1):
        nxt = F.slice(toks, offset, m)
        sh = F.zip_with(sh, nxt, lambda acc, w: F.concat_ws(" ", acc, w))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array().cast("array<string>")
        )
    )


def minhash_signature(shingle_col: Column, num_perm: int = 64) -> Column:
    """MinHash signature: per permutation i, min over shingles of
    xxhash64(shingle, seed=i). Empty shingle set → nulls (never matches).

    (Measured alternatives that did NOT pay off at this shingle length:
    hashing each shingle once then re-hashing the long per permutation —
    within noise of direct string hashing, because interpreted
    higher-order-function evaluation dominates, not hashing; explode +
    64-column codegen hash-aggregate — ~2× slower end-to-end. Multiply-add
    universal hashing is blocked by ANSI-mode overflow, Spark 4 default.)"""
    sig = F.array(
        *[
            F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_perm)
        ]
    )
    return F.when(F.size(shingle_col) > 0, sig)


def _bands(sig: Column, num_bands: int, rows_per_band: int) -> Column:
    """array of (band_idx, band_hash) structs from a minhash signature."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            sig[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(num_bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (assumed distinct elements)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_perm: int = 64,
    num_bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash LSH, verified with exact
    Jaccard over the shingle sets.

    Returns (id_a, id_b, jaccard_sim) with id_a < id_b, jaccard_sim >= threshold.

    Plan shape: map (shingle+sign) → explode bands → shuffle on (band, hash)
    → within-bucket self-join → distinct pairs → verify. The band-bucket join
    is the only quadratic step and operates on tiny groups; a global
    ``spark.sql.shuffle.partitions`` worth of parallelism carries it.
    """
    # Cheap emptiness filter HERE so it pushes down to the scan; a filter on
    # the signature/shingle expression would be pushed below the repartition
    # by Catalyst and re-evaluate the whole shingling single-threaded on the
    # scan partitions.
    nonempty = df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    base = ensure_parallelism(nonempty).select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k_shingle).alias("sh"),
    )
    return _lsh_verified_pairs(base, num_perm, num_bands, threshold)


def _lsh_verified_pairs(
    base: DataFrame,
    num_perm: int,
    num_bands: int,
    threshold: float,
    max_bucket: int = 200,
) -> DataFrame:
    """Shared LSH core over ``base(id, sh)``: sign → band → bucket-join on
    bare (id, band_key) pairs → distinct → re-attach shingle sets → exact
    Jaccard verify.

    The band join deliberately carries ONLY 16 bytes per row (id +
    band_key): shipping the shingle arrays through the explode would
    multiply shuffle volume by num_bands×, and carrying them through the
    pair-dedup shuffle would double it again. Re-attaching `sh` afterwards
    costs two joins over the (small) candidate set — the 100 TB-friendly
    trade.

    ``max_bucket`` drops band buckets with more than that many members
    before the self-join. An over-full bucket is by construction
    non-discriminative (its hash carries almost no similarity signal —
    e.g. a band whose minhashes collapsed on boilerplate), and one hot
    bucket of size B costs B² candidate rows: the cap turns the worst case
    from quadratic-in-skew into linear, which is what lets the same plan
    run at 100 TB. Documented recall impact: only pairs whose EVERY shared
    band is over-full are lost."""
    rows_per_band = num_perm // num_bands
    base = base.withColumn("sig", minhash_signature(F.col("sh"), num_perm))
    # Single 64-bit key per (band, hash): collisions across bands are
    # astronomically unlikely and harmless (they only add candidates).
    # No isNotNull filter on sig: callers pre-filter empty text (the only
    # null-sig case), and a filter on sig would be pushed below the
    # repartition and re-evaluate the shingle expression on the raw scan.
    banded = base.select(
        "id",
        F.explode(_bands(F.col("sig"), num_bands, rows_per_band)).alias("bb"),
    ).select("id", F.xxhash64(F.col("bb.band"), F.col("bb.band_hash")).alias("bk"))
    if max_bucket is not None:
        from pyspark.sql.window import Window

        bucket_n = F.count(F.lit(1)).over(Window.partitionBy("bk"))
        banded = banded.withColumn("_n", bucket_n).filter(F.col("_n") <= max_bucket).drop("_n")
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(right, (F.col("l.bk") == F.col("r.bk")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_map = base.select("id", "sh")
    return (
        cand.join(sh_map.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh_map.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim"))
    )


def connected_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Transitive closure of a pair list → (id, component) with component =
    min id of the connected component.

    Iterative min-label propagation: each round every node takes the min of
    its own label and its neighbors' labels (one join + one aggregate per
    round); converges in O(graph diameter) rounds — dedup graphs are
    near-cliques with tiny diameters, so 2-4 rounds in practice. (For
    adversarially long chains, the large-star/small-star variant of Kiveris
    et al., SoCC'14, gets O(log²) rounds — same DataFrame skeleton, swap
    the propagation rule.) Iterating DataFrames keeps everything in
    Catalyst — no driver-side union-find, so it scales to billions of
    edges. Each round is localCheckpoint()-ed to cut the exponentially
    growing lineage, and the `changed` probe uses limit(1) so convergence
    detection doesn't rescan the full label set.

    Input: columns ``id_a``, ``id_b``. Output: ``id``, ``component``.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    # labels: every node starts labeled with the min of itself and its
    # direct neighborhood
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .select(
            F.col("src").alias("id"), F.least(F.col("src"), F.col("m")).alias("component")
        )
    )
    for _ in range(max_iterations):
        # propagate: node takes min(own label, labels of neighbors)
        neigh = (
            edges.join(labels.withColumnRenamed("id", "dst2"), edges.dst == F.col("dst2"))
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh, labels.id == neigh.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    transitive: bool = False,
    **kwargs,
) -> DataFrame:
    """Rows surviving near-dedup.

    Default (single-pass): drop the larger id of every near-dup pair — the
    standard one-shuffle approximation (a row is dropped if it is the
    larger side of ANY pair; chains keep only their overall smallest member
    when all chain edges were found).

    ``transitive=True``: full connected-component clustering first, then
    keep the min-id member of every component — exact transitive semantics
    even when the pair list only has chain edges (A~B, B~C but not A~C).
    """
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    if transitive:
        comp = connected_components(pairs)
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
    else:
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash over whitespace tokens: per-token xxhash64, bitwise vote,
    packed into a BIGINT (low ``bits`` bits). JVM-side expression tree —
    no Python. 32 bits keeps the expression compact; Hamming distance on
    32-bit fingerprints is plenty for near-dup grouping."""
    hashes = F.transform(tokens(text), lambda t: F.xxhash64(t))
    votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        for b in range(bits)
    ]
    out = F.lit(0).cast("bigint")
    for b, v in enumerate(votes):
        out = out + F.when(v > 0, F.lit(2**b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    num_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash with block-permutation candidate generation:
    split the fingerprint into ``num_blocks`` blocks; by pigeonhole, any pair
    within Hamming distance < num_blocks shares at least one exact block →
    join on (block_idx, block_value), verify true Hamming distance."""
    block_bits = bits // num_blocks
    mask = (1 << block_bits) - 1
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), simhash(F.col(text_col), bits).alias("sh")
    )
    blocks = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("sh"), i * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("blk_val"),
                    )
                    for i in range(num_blocks)
                ]
            )
        ).alias("b"),
    ).select("id", "sh", F.col("b.blk").alias("blk"), F.col("b.blk_val").alias("blk_val"))
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.blk_val") == F.col("r.blk_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            hamming64(F.col("l.sh"), F.col("r.sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (character n-grams), LSH-bucketed
# ---------------------------------------------------------------------------


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams of normalized text."""
    norm = normalize_text(text)
    ln = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(0)))
    grams = F.transform(idx, lambda i: F.substring(norm, F.lit(0) + i, n))
    return F.when(ln >= n, F.array_distinct(grams)).otherwise(
        F.when(ln > 0, F.array(norm)).otherwise(F.array().cast("array<string>"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.7,
    num_perm: int = 32,
    num_bands: int = 4,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs; candidates from MinHash-LSH
    over the n-gram sets (same banding machinery as minhash_lsh_pairs).

    Defaults use 8 rows per band (32/4): character n-grams of
    same-language text share a substantial background vocabulary (measured
    ~0.17 mean / 0.26 p99 Jaccard on the synthetic corpus), so 2-row bands
    collide on ~s²·bands ≈ 0.4 of ALL pairs and even 4-row bands emit ~4%
    of all pairs as candidates — a quadratic explosion either way. At 8
    rows the background rate is s⁸·bands ≈ 10⁻⁶ while true near-dups
    (s ≥ 0.85, the planted regime) still collide with ≥ 80% probability;
    pairs near the 0.7 threshold trade some recall for the ability to run
    the same plan at 100 TB."""
    nonempty = df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    base = ensure_parallelism(nonempty).select(
        F.col(id_col).alias("id"), char_ngrams(F.col(text_col), n).alias("sh")
    )
    return _lsh_verified_pairs(base, num_perm, num_bands, threshold)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — JVM-side
    zip_with/aggregate, no UDF."""
    # Cast each element to double BEFORE multiplying: float32 products differ
    # from float64 products, and the DuckDB oracle computes in doubles.
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_a = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    norm_b = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return F.when((norm_a > 0) & (norm_b > 0), dot / (norm_a * norm_b)).otherwise(F.lit(0.0))


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold.

    Candidates come from random-hyperplane LSH (sign-bit sketch, joined on the
    full sketch — high-cosine pairs collide with high probability), then exact
    cosine verification. At 100 TB the sketch join is the only shuffle; the
    planes are a tiny deterministic broadcast literal.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = first["d"] if first else 0
    planes = rng.standard_normal((num_planes, dim))
    sketch = _hyperplane_sketch(F.col(vec_col), planes)
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sketch.alias("sk")
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, (F.col("l.sk") == F.col("r.sk")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine_similarity(F.col("l.v"), F.col("r.v")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _hyperplane_sketch(vec: Column, planes) -> Column:
    """Sign-bit sketch of a vector against fixed hyperplanes → BIGINT."""
    bits = []
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(w)) for w in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(2**i).cast("bigint")).otherwise(F.lit(0).cast("bigint")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
