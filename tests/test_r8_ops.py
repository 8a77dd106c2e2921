"""Unit pins for the r8 operators (p71–p76): registrable-domain extraction,
unicode cleanup, exact-oracle MinHash signatures, key-skew profiling,
centroid cosine, Zipf fit. Cross-engine value parity is covered by the
driver-replica gate (test_oracle_parity.py); these pin the operator-level
semantics and edge cases directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# registrable_domain (p71)
# ---------------------------------------------------------------------------


def test_registrable_domain_cases(spark):
    from duckdb_cloudflare_spark.operators.web import registrable_domain

    cases = [
        ("www.example.com", "example.com"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("CDN.Example.AC.JP", "example.ac.jp"),
        ("example.io", "example.io"),
        ("deep.a.b.c.example.org", "example.org"),
        # bare multi-part suffix is NOT extended past the host's labels
        ("co.uk", "co.uk"),
        ("localhost", "localhost"),
        (None, None),
        ("", None),
        ("  ", None),
        # FQDN trailing-dot spellings collapse to the dotless key
        # (ADVICE r8: 'example.com.' used to keep the empty label and
        # mis-match MULTI_PART_SLDS on 'com')
        ("example.com.", "example.com"),
        ("www.example.co.uk.", "example.co.uk"),
        ("example.org..", "example.org"),
        (".", None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["h"])
    got = {
        r["h"]: r["d"]
        for r in df.select("h", registrable_domain(F.col("h")).alias("d")).collect()
    }
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


# ---------------------------------------------------------------------------
# clean_unicode (p72)
# ---------------------------------------------------------------------------


def test_clean_unicode_rules(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import clean_unicode

    dirty = "\t“Quoted” — é x\x07y​z  end "
    df = spark.createDataFrame([(dirty,), (None,)], ["t"])
    rows = df.select(clean_unicode(F.col("t")).alias("c")).collect()
    # NFC composed the accent; quotes/dash ASCII-fied; NBSP → space;
    # BEL stripped; ZWSP deleted; whitespace collapsed + trimmed
    assert rows[0]["c"] == '"Quoted" - é xyz end'
    assert rows[1]["c"] is None


def test_clean_unicode_strips_vt_ff_before_collapse(spark):
    # \x0b/\x0c are in Java's \s but not RE2's — CONTROL_CLASS must remove
    # them BEFORE the \s+ collapse so both engines converge (module note).
    from duckdb_cloudflare_spark.operators.text_analysis import clean_unicode

    df = spark.createDataFrame([("a\x0bb\x0cc",)], ["t"])
    assert df.select(clean_unicode(F.col("t")).alias("c")).first()["c"] == "abc"


# ---------------------------------------------------------------------------
# minhash_signatures_exact (p73)
# ---------------------------------------------------------------------------


def test_minhash_identical_docs_share_all_bands(spark):
    from duckdb_cloudflare_spark.operators.dedup import minhash_signatures_exact

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "entirely different words everywhere here")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in minhash_signatures_exact(df).collect()}
    for j in range(4):
        assert rows[1][f"b{j}"] == rows[2][f"b{j}"]
    assert any(rows[1][f"b{j}"] != rows[3][f"b{j}"] for j in range(4))
    # signatures are 60-bit non-negative ints
    for i in range(8):
        assert 0 <= rows[1][f"s{i}"] < 1 << 60


def test_minhash_short_docs_excluded_and_bad_bands_raise(spark):
    from duckdb_cloudflare_spark.operators.dedup import minhash_signatures_exact

    df = spark.createDataFrame(
        [(1, "only two"), (2, None), (3, "three tokens here")], ["doc_id", "text"]
    )
    got = [r["doc_id"] for r in minhash_signatures_exact(df).collect()]
    assert got == [3]
    with pytest.raises(ValueError, match="must divide"):
        minhash_signatures_exact(df, bands=3)


# ---------------------------------------------------------------------------
# key_skew_profile (p74)
# ---------------------------------------------------------------------------


def test_key_skew_profile_values(spark):
    from duckdb_cloudflare_spark.operators.scale import key_skew_profile

    # key 'hot' 6 rows, 'b' 2, 'a' 2 → total 10, n_keys 3, avg 10/3
    data = [("hot",)] * 6 + [("b",)] * 2 + [("a",)] * 2
    df = spark.createDataFrame(data, ["k"])
    rows = key_skew_profile(df, "k", top_n=2).collect()
    assert [(r["rnk"], r["key"], r["cnt"]) for r in rows] == [
        (1, "hot", 6),
        (2, "a", 2),  # tie with 'b' broken by key ASC
    ]
    assert rows[0]["share"] == pytest.approx(0.6)
    assert rows[0]["ratio_to_avg"] == pytest.approx(1.8)  # 6 / (10/3)


# ---------------------------------------------------------------------------
# centroid_cosine (p75)
# ---------------------------------------------------------------------------


def test_centroid_cosine_known_geometry(spark):
    from duckdb_cloudflare_spark.operators.similarity import centroid_cosine

    # mean of (2,0) and (0,2) is (1,1); both score cos 45° ≈ 0.707107;
    # an anti-correlated vector scores -0.707107; a zero vector → NULL
    df = spark.createDataFrame(
        [
            (1, [2.0, 0.0]),
            (2, [0.0, 2.0]),
            (3, [-1.0, -1.0]),
            (4, [0.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: r["cos_centroid"] for r in centroid_cosine(df).collect()}
    # mean components: avg over 4 vecs = (0.25, 0.25)
    assert got[1] == pytest.approx(0.707107, abs=1e-6)
    assert got[2] == pytest.approx(0.707107, abs=1e-6)
    assert got[3] == pytest.approx(-1.0, abs=1e-6)
    assert got[4] is None


# ---------------------------------------------------------------------------
# Zipf fit (p76)
# ---------------------------------------------------------------------------


def test_zipf_fit_exact_power_law(spark, registry_mod):
    # frequencies f(r) = C * r^-1 → slope of ln f on ln r is exactly -1
    words = []
    for rank, tok in enumerate(["aa", "bb", "cc", "dd"], start=1):
        words += [tok] * (24 // rank)  # 24, 12, 8, 6
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    import duckdb_cloudflare_spark.queries.pipeline_extra as PX

    # drive the same shape the query uses, on a local frame
    from duckdb_cloudflare_spark.operators import dedup as D
    from pyspark.sql import Window

    c = (
        df.select(F.explode(D.lowered_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    w = Window.orderBy(F.col("f").desc(), F.col("tok"))
    r = c.select("f", F.row_number().over(w).alias("rnk"))
    slope = r.agg(F.regr_slope(F.log("f"), F.log("rnk"))).first()[0]
    assert slope == pytest.approx(-1.0, abs=1e-9)


@pytest.fixture
def registry_mod():
    from duckdb_cloudflare_spark import queries as Q

    return Q


# ---------------------------------------------------------------------------
# semdedup_stats (p82)
# ---------------------------------------------------------------------------


def test_semdedup_known_geometry(spark):
    from duckdb_cloudflare_spark.operators.similarity import semdedup_stats

    # cluster 0: v1 == v2 (cos 1), v3 orthogonal -> one dup pair, one pruned
    # cluster 1: both orthogonal -> nothing pruned
    rows = [
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [1.0, 0.0, 0.0]),
        (3, 0, [0.0, 1.0, 0.0]),
        (4, 1, [0.0, 0.0, 1.0]),
        (5, 1, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    got = {
        r["cluster"]: r
        for r in semdedup_stats(df, threshold=0.9).collect()
    }
    assert got[0]["n_vectors"] == 3
    assert got[0]["n_dup_pairs"] == 1
    assert got[0]["n_pruned"] == 1  # vec 2 (higher id of the identical pair)
    assert abs(got[0]["prune_rate"] - 1 / 3) < 1e-6
    assert got[1]["n_dup_pairs"] == 0 and got[1]["n_pruned"] == 0
    assert got[1]["prune_rate"] == 0.0


def test_semdedup_pairs_stay_within_cluster(spark):
    from duckdb_cloudflare_spark.operators.similarity import semdedup_stats

    # identical vectors but DIFFERENT clusters: never compared
    rows = [(1, 0, [1.0, 0.0]), (2, 1, [1.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    for r in semdedup_stats(df, threshold=0.5).collect():
        assert r["n_dup_pairs"] == 0 and r["n_pruned"] == 0


# ---------------------------------------------------------------------------
# dsir_weights (p83)
# ---------------------------------------------------------------------------


def test_dsir_target_lookalike_scores_higher(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import dsir_weights

    # target slice speaks "alpha beta"; raw background speaks "gamma delta".
    # A held-out doc written in target language must outscore one written
    # in background language.
    rows = (
        [(i, "alpha beta alpha beta", 1) for i in range(10)]
        + [(100 + i, "gamma delta gamma delta", 0) for i in range(10)]
        + [(900, "alpha beta", 0), (901, "gamma delta", 0)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(df, target=F.col("is_t") == 1).collect()
    }
    assert got[900] > got[901]
    # target-language docs outscore background docs (absolute sign is a
    # smoothing artifact at toy counts: add-one over 1024 buckets flattens
    # the smaller target total more than the raw total)
    assert got[0] > got[100]


def test_dsir_weight_is_mean_of_bucket_logratios(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import dsir_weights

    # single doc, single token, empty target slice: every bucket count is
    # raw_n=1/tgt_n=0, so weight = ln((0+1)/(0+1024) / ((1+1)/(1+1024)))
    import math

    df = spark.createDataFrame([(1, "tok", 0)], ["doc_id", "text", "is_t"])
    [r] = dsir_weights(df, target=F.col("is_t") == 1).collect()
    want = round(math.log((1 / 1024) / (2 / 1025)), 6)
    assert r["n_tokens"] == 1
    assert abs(r["dsir_weight"] - want) < 1e-6


# ---------------------------------------------------------------------------
# calibration_bins (p84)
# ---------------------------------------------------------------------------


def test_calibration_bins_partition_and_rates(spark):
    from duckdb_cloudflare_spark.operators.quality_model import calibration_bins

    # y perfectly separable on x1 -> high-margin bins must show
    # observed_rate 1.0, low-margin bins 0.0, and bin counts sum to n
    rows = [(float(i % 2), 1.0, float(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, ["y", "x0", "x1"])
    out = calibration_bins(df, ["x0", "x1"], "y", steps=2).collect()
    assert sum(r["n_docs"] for r in out) == 40
    for r in out:
        assert 0.0 <= r["mean_pred"] <= 1.0
        assert r["observed_rate"] in (0.0, 1.0)  # separable by construction
    # the positive class lands in strictly higher bins than the negative
    pos_bins = {r["bin"] for r in out if r["observed_rate"] == 1.0}
    neg_bins = {r["bin"] for r in out if r["observed_rate"] == 0.0}
    assert min(pos_bins) > max(neg_bins)
