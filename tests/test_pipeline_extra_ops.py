"""Semantic pins for the r4-continuation pipeline operators (p44–p49):
planted-case behavior and invariants the sf0.01 oracle hash check can't
express on its own (it proves engine parity, not that the semantics are the
ones a curation pipeline wants)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from duckdb_cloudflare_spark.operators import dedup as D
from duckdb_cloudflare_spark.queries import load
from duckdb_cloudflare_spark.queries.pipeline_extra import (
    p45_kmeans_update,
    p46_doc_novelty,
    p47_length_histogram,
    p49_temperature_resample,
)

SF_DIR = "/root/testdata/sf0.001"
OFFSET = 1_000_000


@pytest.fixture(scope="module")
def docs_with_copies(spark):
    """First 40 real docs + exact copies of the first 10 under new ids."""
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").limit(40)
    rows = docs.collect()
    copies = [(r["doc_id"] + OFFSET, r["text"]) for r in rows[:10]]
    extra = spark.createDataFrame(copies, "doc_id long, text string")
    return docs.unionByName(extra), rows


def test_chunk_dedup_planted_exact_copy_fully_duplicated(docs_with_copies):
    df, rows = docs_with_copies
    stats = {r["doc_id"]: r for r in D.chunk_dedup_stats(df).collect()}
    for r in rows[:10]:
        copy = stats[r["doc_id"] + OFFSET]
        # The copy's id sorts after the original, so EVERY one of its chunks
        # is a later occurrence — the whole copy is removable.
        assert copy["dup_chunks"] == copy["n_chunks"] > 0
        # Chunk count = ceil(n_tokens / 20) for both original and copy.
        n_tok = len(r["text"].split())
        assert copy["n_chunks"] == math.ceil(n_tok / 20)
        assert stats[r["doc_id"]]["n_chunks"] == copy["n_chunks"]


def test_chunk_dedup_bounds_and_determinism(spark):
    docs = load(spark, SF_DIR, "documents")
    a = sorted(tuple(r) for r in D.chunk_dedup_stats(docs).collect())
    b = sorted(tuple(r) for r in D.chunk_dedup_stats(docs).collect())
    assert a == b
    assert all(0 <= dup <= n for _, n, dup in a)
    # Global conservation: total chunks - total dups = distinct chunk hashes.
    total = sum(n for _, n, _ in a)
    dups = sum(d for _, _, d in a)
    assert total - dups > 0


def test_md5_minhash_identical_docs_agree_everywhere(docs_with_copies):
    df, rows = docs_with_copies
    sigs = {r["doc_id"]: tuple(r)[1:] for r in D.md5_minhash_sigs(df, k=12).collect()}
    for r in rows[:10]:
        # An exact copy has the identical shingle set → identical signature
        # → estimated Jaccard exactly 1.0.
        assert sigs[r["doc_id"]] == sigs[r["doc_id"] + OFFSET]
    # And two DIFFERENT real docs should not collide on every seed.
    ids = [r["doc_id"] for r in rows[:10]]
    assert sigs[ids[0]] != sigs[ids[1]]


def test_md5_minhash_estimate_tracks_exact_jaccard(spark):
    """Corpus-level sanity: on the sf0.001 near-dup pairs (exact J >= 0.5),
    the 12-seed estimate must land in a binomially-plausible band around the
    true Jaccard (per-pair s.d. ~ 0.14; allow 4 sigma)."""
    from duckdb_cloudflare_spark.queries.pipeline import p34_exact_jaccard_pairs

    pairs = p34_exact_jaccard_pairs(spark, SF_DIR)
    sigs = D.md5_minhash_sigs(load(spark, SF_DIR, "documents"), k=12)
    a = sigs.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"s{j}").alias(f"a{j}") for j in range(12)]
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"s{j}").alias(f"b{j}") for j in range(12)]
    )
    agree = sum((F.col(f"a{j}") == F.col(f"b{j}")).cast("int") for j in range(12))
    est = (
        pairs.join(a, "id_a").join(b, "id_b")
        .select("jaccard", (agree / F.lit(12.0)).alias("est"))
        .collect()
    )
    assert est, "sf0.001 corpus should contain at least one exact near-dup pair"
    for r in est:
        assert abs(r["est"] - r["jaccard"]) <= 4 * 0.145, (r["jaccard"], r["est"])


def test_kmeans_update_does_not_increase_sse(spark):
    """For a FIXED assignment, re-averaging is the SSE-minimizing centroid
    choice (the contraction property that makes Lloyd's converge): total
    within-cluster SSE under the updated centroids must be <= SSE under the
    centroids that produced the assignment."""
    import numpy as np

    emb = load(spark, SF_DIR, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}

    from duckdb_cloudflare_spark.queries.pipeline_extra import p42_centroid_assign

    assign = {
        r["vec_id"]: r["assigned_label"]
        for r in p42_centroid_assign(spark, SF_DIR).collect()
    }
    old_sse = sum(
        r["sq_dist"] for r in p42_centroid_assign(spark, SF_DIR).collect()
    )
    new_cent: dict[int, np.ndarray] = {}
    upd = p45_kmeans_update(spark, SF_DIR).collect()
    dims = max(r["dim"] for r in upd) + 1
    for r in upd:
        new_cent.setdefault(r["assigned_label"], np.zeros(dims))[r["dim"]] = r["new_c"]
    new_sse = sum(
        float(((v - new_cent[assign[vid]]) ** 2).sum()) for vid, v in vecs.items()
    )
    # Both sides carry round-to-6 noise (sq_dist and new_c are rounded for
    # oracle parity): allow that accumulated wobble, not a real increase.
    assert new_sse <= old_sse + 1e-3 * max(1.0, old_sse)


def test_doc_novelty_first_doc_is_fully_novel_and_counts_conserve(spark):
    rows = p46_doc_novelty(spark, SF_DIR).collect()
    by_id = {r["doc_id"]: r for r in rows}
    first = by_id[min(by_id)]
    assert first["novel"] == first["n_shingles"]
    assert first["novel_frac"] == 1.0
    # Every distinct shingle is novel in exactly one doc (its first): the
    # novel totals must equal the corpus-wide distinct shingle count.
    docs = load(spark, SF_DIR, "documents")
    ts = F.transform(F.split(F.trim(F.col("text")), r"\s+"), lambda x: F.lower(x))
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("ts") - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("ts"), i + 1),
                F.element_at(F.col("ts"), i + 2),
                F.element_at(F.col("ts"), i + 3),
            ),
        )
    )
    n_distinct = (
        docs.select(ts.alias("ts"))
        .filter(F.size("ts") >= 3)
        .select(F.explode(sh).alias("s"))
        .distinct()
        .count()
    )
    assert sum(r["novel"] for r in rows) == n_distinct


def test_length_histogram_conserves_docs_and_tokens(spark):
    rows = p47_length_histogram(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents")
    n_docs = docs.count()
    n_tokens = docs.select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_tokens"] for r in rows) == n_tokens
    assert all(r["bucket"] >= 0 for r in rows)


def test_temperature_resample_flattens_toward_smallest_lang(spark):
    docs = load(spark, SF_DIR, "documents")
    orig = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r["lang"]: r["n"]
        for r in p49_temperature_resample(spark, SF_DIR)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    min_n = min(orig.values())
    min_langs = [lang for lang, n in orig.items() if n == min_n]
    # The smallest stratum keeps everything (keep-prob exactly 1).
    for lang in min_langs:
        assert kept[lang] == orig[lang]
    for lang, n in orig.items():
        expect = n * math.sqrt(min_n / n)
        # Binomial 4-sigma band around the expected kept count.
        sd = math.sqrt(max(expect * (1 - math.sqrt(min_n / n)), 1.0))
        assert abs(kept.get(lang, 0) - expect) <= 4 * sd + 2, (lang, n, kept.get(lang))
    # Determinism: same seed, same selection.
    again = {
        r["lang"]: r["n"]
        for r in p49_temperature_resample(spark, SF_DIR)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert again == kept


def test_temperature_resample_null_stratum_is_a_stratum(spark):
    """NULL strata must be resampled like any other, not silently dropped
    by the counts join (ADVICE r5: plain equi-join vs <=>)."""
    from duckdb_cloudflare_spark.operators.curation import temperature_resample

    rows = [(f"d{i}", "en") for i in range(40)] + [
        (f"n{i}", None) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    kept = temperature_resample(df, stratum_col="lang", id_col="doc_id")
    by = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # NULL is the smallest stratum → keep-prob 1: all 10 survive.
    assert by.get(None) == 10
    # en down-samples toward it (sqrt(10/40)=0.5 → ~20, generous band).
    assert 8 <= by.get("en", 0) <= 32


def test_curate_operator_parameterized_stratum(spark):
    """The extracted curation operator must work over arbitrary columns:
    stratify by source instead of lang, different seeds/shard count."""
    from duckdb_cloudflare_spark.operators.curation import curate

    docs = load(spark, SF_DIR, "documents")
    out = curate(
        docs, stratum_col="source", n_shards=4, epoch_seed="epoch-9:",
        resample_seed="rs2:",
    )
    rows = out.collect()
    assert rows and set(out.columns) == {"doc_id", "source", "shard", "pos_in_shard"}
    assert {r["shard"] for r in rows} <= {0, 1, 2, 3}
    # positions are 1..n contiguous per shard (a permutation, not a sample)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s
    # determinism
    again = curate(
        docs, stratum_col="source", n_shards=4, epoch_seed="epoch-9:",
        resample_seed="rs2:",
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
