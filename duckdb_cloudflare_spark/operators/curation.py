"""The end-to-end curation pass as a reusable operator.

``curate`` chains the anchored stages — Gopher-style quality gate → exact
dedup (first-id-wins on md5(text)) → exact-Jaccard near-dup connected
components keeping the longest member per cluster → temperature-based
stratum rebalancing → deterministic epoch shuffle — over ANY document
DataFrame. The p54 registry query binds it to the testdata corpus and
hash-verifies the whole composition against a single recursive-CTE DuckDB
program at sf0.01 and sf0.1; ``Engine.curate`` exposes it to users.

Every stage's scale notes live with its own operator (``dedup.py``); this
module only sequences them. Deterministic end to end: the output is
reproducible from the seeds alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from duckdb_cloudflare_spark.operators import dedup as D

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_metrics(text_col: str = "text"):
    """The Gopher rule inputs (Rae et al. 2021's repetition-free subset) as
    columns: ``(n_words, mean_word_len, stop_hits)``. THE single source of
    these expressions — ``quality_gate`` (the filter), p53 (the diagnostic
    report), and the p54 capstone all build on it, so a threshold or
    stopword tweak cannot desynchronize them."""
    ts = D.lowered_tokens(text_col)
    n_words = F.size(ts).cast("bigint")
    total_len = F.aggregate(
        F.transform(ts, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    ).cast("bigint")
    mean_len = total_len.cast("double") / n_words
    stop_hits = F.size(F.filter(ts, lambda x: x.isin(*GOPHER_STOPWORDS))).cast(
        "bigint"
    )
    return n_words, mean_len, stop_hits


def quality_gate(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 16,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style filter (Rae et al. 2021's repetition-free subset): word
    count window, mean-word-length window, minimum stopword hits. Map-only."""
    n_words, mean_len, stop_hits = gopher_metrics(text_col)
    return df.filter(
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
        & (stop_hits >= min_stopword_hits)
    )


def temperature_resample(
    df: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "resample:",
) -> DataFrame:
    """tau = 0.5 stratum flattening: keep iff seeded_uniform(id) <
    sqrt(min_n / n_stratum) — the smallest stratum keeps everything, the
    rest are down-sampled toward it. Per-stratum counts broadcast back;
    the corpus is map-only filtered, never shuffled."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_s"))
    mn = counts.agg(F.min("n_s").alias("min_n"))
    # Null-safe join (ADVICE r5): groupBy keeps NULL as its own stratum, but
    # a plain equi-join would silently DROP every NULL-stratum row. <=> makes
    # NULL a first-class stratum, resampled like any other.
    counts_r = counts.withColumnRenamed(stratum_col, "__stratum_r")
    return (
        df.withColumn("__u", D.seeded_uniform(seed, F.col(id_col)))
        .join(
            broadcast(counts_r),
            F.col(stratum_col).eqNullSafe(F.col("__stratum_r")),
        )
        .crossJoin(broadcast(mn))
        .filter(F.col("__u") < F.sqrt(F.col("min_n").cast("double") / F.col("n_s")))
        .select(*df.columns)
    )


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    score_col: str = "n_chars",
    jaccard_threshold: float = 0.5,
    shingle_k: int = 3,
    resample_seed: str = "resample:",
    epoch_seed: str = "epoch-7:",
    n_shards: int = 8,
) -> DataFrame:
    """Full deterministic curation pass over ``docs`` (needs ``id_col``,
    ``text_col``, ``stratum_col``, ``score_col`` columns). Returns
    ``(id_col, stratum_col, shard, pos_in_shard)`` — the training-ready
    corpus assignment, reproducible from the seeds alone. Feed the result
    to ``sources.write.write_epoch_shards`` to materialize training order.
    """
    gated = quality_gate(docs, text_col).select(
        id_col, stratum_col, score_col, text_col
    )

    w_exact = Window.partitionBy(F.md5(text_col)).orderBy(id_col)
    exact = (
        gated.withColumn("__rn", F.row_number().over(w_exact))
        .filter(F.col("__rn") == 1)
        .select(id_col, stratum_col, score_col)
    )

    # Near-dup components over the exact survivors only — semi join BEFORE
    # shingling, so the corpus that didn't survive never pays the explode.
    survivors_text = docs.join(exact.select(id_col), id_col, "left_semi")
    pairs = D.exact_jaccard_pairs(
        survivors_text, k=shingle_k, threshold=jaccard_threshold,
        text_col=text_col, id_col=id_col,
    ).select("id_a", "id_b")
    comp = D.connected_components(pairs)
    w_canon = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    canon = (
        exact.join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("component", F.coalesce("component", id_col))
        .withColumn("__rn", F.row_number().over(w_canon))
        .filter(F.col("__rn") == 1)
        .select(id_col, stratum_col)
    )

    sampled = temperature_resample(
        canon, stratum_col=stratum_col, id_col=id_col, seed=resample_seed
    )
    return D.epoch_shard_assign(
        sampled, seed=epoch_seed, n_shards=n_shards, id_col=id_col
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-version diff — the incremental-pipeline primitive between two
    corpus snapshots (yesterday's crawl vs today's): per document id, one of
    ``added`` / ``removed`` / ``changed`` / ``unchanged``, decided by an
    md5 content fingerprint.

    Scale shape: each side reduces to (id, 16-byte fingerprint) BEFORE the
    full outer join, so document text never shuffles — the join moves two
    narrow columns per side no matter how wide the corpus rows are. One
    shuffle per side on the id; at 100 TB pre-bucket both snapshots by id
    (operators/scale.py) and the join is zero-exchange."""
    o = old.select(
        F.col(id_col).alias("__id"), F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__old_fp")
    )
    n = new.select(
        F.col(id_col).alias("__id"), F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__new_fp")
    )
    return (
        o.join(n, "__id", "full")
        .select(
            F.col("__id").alias(id_col),
            F.when(F.col("__old_fp").isNull(), F.lit("added"))
            .when(F.col("__new_fp").isNull(), F.lit("removed"))
            .when(F.col("__old_fp") != F.col("__new_fp"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def source_mix_entropy(df: DataFrame, group_col: str = "source") -> DataFrame:
    """Corpus-composition diversity report — the single-row mixture audit a
    data-mixing run publishes (Xie et al. DoReMi / the Pile's composition
    tables): Shannon entropy of the source-share distribution (nats), the
    "effective source count" exp(H) (how many EQUALLY-sized sources this
    mix is worth), and the heaviest source's share. A corpus 95% dominated
    by one crawl has effective_sources ≈ 1 no matter how many names appear.

    Determinism: shares p_i = cnt_i / total are single exact-integer
    divisions (bit-identical); each p·ln p term is canonicalized as an
    exact nano-unit bigint (1e9 — terms are ≤ 1/e so nano keeps 9
    significant digits; the p79/p83 integer-exact-fold convention), so the
    entropy sum is order-free and H itself is ONE unrounded division.
    exp(H) is rounded 6 dp (transcendental endpoint). Scale shape: one
    partial-agg shuffle (source) to a source-cardinality table, then a
    1-row fold — the 100 TB group-count shape, no joins."""
    cnts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = cnts.agg(F.sum("cnt").alias("total"))
    p = F.col("cnt").cast("double") / F.col("total").cast("double")
    term_nano = F.round(p * F.log(p) * 1e9, 0).cast("long")
    per = cnts.crossJoin(broadcast(tot)).select(
        "cnt", F.col("total"), term_nano.alias("t_nano"), p.alias("share")
    )
    h = (-F.sum("t_nano")).cast("double") / F.lit(1e9)
    return per.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.first("total").alias("n_docs"),
        h.alias("entropy"),
        F.round(F.exp(h), 6).alias("effective_sources"),
        F.max("share").alias("max_share"),
    )


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str | None = "n_chars",
    num_shards: int = 64,
) -> DataFrame:
    """Reproducible training-shard assignment + per-shard manifest — the
    bookkeeping a 100 TB export publishes next to its shards so any
    consumer (or a re-run months later) can verify it received exactly
    the intended bytes. Documents are assigned by a deterministic
    md5-derived hash of their id (``shard = md5_60('shard:'||id) %
    num_shards``), NOT by partition index or arrival order, so the
    assignment is stable under repartitioning, retries, and engine
    changes. Each shard row carries:

    - ``n_docs``, ``n_chars`` (sum of ``size_col``; 0 if None),
    - ``min_id`` / ``max_id`` (the id range sanity check),
    - ``fingerprint``: an ORDER-INDEPENDENT content checksum — the sum of
      per-document md5 hashes of ``id:text`` reduced mod 1e9+7. Sums
      commute, so the fingerprint is identical however the shard's rows
      were partitioned or ordered — the property a distributed writer
      needs (a concatenation-order checksum would be non-deterministic
      under parallel writes). Mod keeps the running sum inside int64 for
      any realistic shard (9.2e18 / 1e9 ≈ 9e9 docs per shard).

    Scale shape: map-side hash derivation + ONE partial aggregation to
    ``num_shards`` rows. No joins, no windows, no skew (md5 is uniform).
    """
    from duckdb_cloudflare_spark.operators.sketches import _md5_int60

    idc = F.col(id_col)
    doc_fp = _md5_int60(
        F.concat(idc.cast("string"), F.lit(":"), F.coalesce(F.col(text_col), F.lit(""))),
        "fp:",
    ) % F.lit(1000000007)
    size = (
        F.coalesce(F.col(size_col), F.lit(0)).cast("bigint")
        if size_col
        else F.lit(0).cast("bigint")
    )
    return (
        df.select(
            (_md5_int60(idc, "shard:") % F.lit(num_shards)).alias("shard_id"),
            idc.alias("_id"),
            size.alias("_sz"),
            doc_fp.alias("_fp"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_sz").cast("bigint").alias("n_chars"),
            F.min("_id").alias("min_id"),
            F.max("_id").alias("max_id"),
            F.sum("_fp").cast("bigint").alias("fingerprint"),
        )
    )
