"""Semantic pins for the r9 operators (p85–p90) on planted data — the
oracle gate proves cross-engine agreement; these prove the operators
compute the RIGHT thing (entropy extremes, resample bias, containment
asymmetry, histogram arithmetic, outlier flags)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# source_mix_entropy (p85)
# ---------------------------------------------------------------------------


def test_source_mix_entropy_uniform_and_degenerate(spark):
    from duckdb_cloudflare_spark.operators.curation import source_mix_entropy

    # 4 equal sources: H = ln 4, effective = 4
    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(400)], "doc_id long, source string"
    )
    row = source_mix_entropy(df, "source").first()
    assert row["n_sources"] == 4 and row["n_docs"] == 400
    assert row["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert row["effective_sources"] == pytest.approx(4.0, abs=1e-5)
    assert row["max_share"] == 0.25

    # single source: H = 0, effective = 1
    one = spark.createDataFrame(
        [(i, "only") for i in range(10)], "doc_id long, source string"
    )
    row = source_mix_entropy(one, "source").first()
    assert row["entropy"] == 0.0 and row["effective_sources"] == 1.0

    # 95/5 skew: effective far below the 2 names present
    skew = spark.createDataFrame(
        [(i, "big" if i < 95 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    row = source_mix_entropy(skew, "source").first()
    assert row["n_sources"] == 2
    assert row["effective_sources"] < 1.3
    assert row["max_share"] == 0.95


# ---------------------------------------------------------------------------
# dsir_resample (p86)
# ---------------------------------------------------------------------------


def test_dsir_resample_prefers_target_lookalikes(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import dsir_resample

    # 40 docs in the target dialect, 40 in another; resampling k=20 with
    # weights from the target slice must over-select target lookalikes
    rows = []
    for i in range(40):
        rows.append((i, 1, "alpha beta gamma delta " * 5))
        rows.append((100 + i, 0, "zig zag zip zap " * 5))
    df = spark.createDataFrame(rows, "doc_id long, is_t int, text string")
    picked = dsir_resample(df, target=F.col("is_t") == 1, k=20).collect()
    assert len(picked) == 20
    n_target_like = sum(1 for r in picked if r["doc_id"] < 100)
    assert n_target_like >= 15, n_target_like
    # deterministic: a second run picks the identical set in the same order
    again = dsir_resample(df, target=F.col("is_t") == 1, k=20).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in picked]


def test_dsir_resample_k_and_temperature(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import dsir_resample

    rows = [(i, i % 2, f"w{i % 7} common text here") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, is_t int, text string")
    assert dsir_resample(df, F.col("is_t") == 1, k=7).count() == 7
    # very high temperature flattens weights -> still k rows, valid schema
    flat = dsir_resample(df, F.col("is_t") == 1, k=7, temperature=1e6)
    assert flat.count() == 7
    assert set(flat.columns) == {"doc_id", "dsir_weight", "priority"}


# ---------------------------------------------------------------------------
# containment_pairs (p87)
# ---------------------------------------------------------------------------


def test_containment_catches_subset_jaccard_misses(spark):
    from duckdb_cloudflare_spark.operators.dedup import (
        containment_pairs,
        exact_jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta"  # 4 3-shingles
    host = quote + " " + " ".join(f"filler{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, quote), (2, host), (3, "totally different words entirely here")],
        "doc_id long, text string",
    )
    pairs = containment_pairs(df, k=3, threshold=0.8).collect()
    assert len(pairs) == 1
    [p] = pairs
    assert (p["id_a"], p["id_b"]) == (1, 2)
    assert p["containment_a"] == 1.0  # every quote shingle is in the host
    assert p["containment_b"] < 0.2
    # ...while Jaccard at the same bar sees nothing (the structural gap)
    assert exact_jaccard_pairs(df, k=3, threshold=0.8).count() == 0


def test_containment_empty_and_short_docs(spark):
    from duckdb_cloudflare_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None)], "doc_id long, text string"
    )
    assert containment_pairs(df, k=3, threshold=0.5).count() == 0


# ---------------------------------------------------------------------------
# dup_cluster_histogram (p88)
# ---------------------------------------------------------------------------


def test_dup_cluster_histogram_arithmetic(spark):
    from duckdb_cloudflare_spark.operators.dedup import dup_cluster_histogram

    # 3 singletons, 2 pairs, 1 triple — whitespace/case variants collapse
    rows = (
        [(i, f"unique text {i}") for i in range(3)]
        + [(10, "dup pair one"), (11, "DUP  pair   ONE")]
        + [(12, "dup pair two"), (13, "dup pair two")]
        + [(20, "triple text"), (21, "Triple  Text"), (22, " triple text ")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hist = {r["cluster_size"]: r for r in dup_cluster_histogram(df).collect()}
    assert set(hist) == {1, 2, 3}
    assert hist[1]["n_clusters"] == 3 and hist[1]["excess_docs"] == 0
    assert hist[2]["n_clusters"] == 2 and hist[2]["n_docs"] == 4
    assert hist[2]["excess_docs"] == 2
    assert hist[3]["n_clusters"] == 1 and hist[3]["excess_docs"] == 2
    # totals reconcile with the corpus
    assert sum(r["n_docs"] for r in hist.values()) == 10


# ---------------------------------------------------------------------------
# char_entropy (p89)
# ---------------------------------------------------------------------------


def test_char_entropy_extremes(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaaaaaaaa"),            # one symbol: H = 0
            (2, "abcdefghij"),            # 10 uniform symbols: H = ln 10
            (3, "aabb"),                  # 2 uniform: H = ln 2
            (4, None),                    # null text: dropped
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["char_entropy"] == 0.0
    assert got[2]["char_entropy"] == pytest.approx(math.log(10), abs=1e-5)
    assert got[3]["char_entropy"] == pytest.approx(math.log(2), abs=1e-5)
    assert got[1]["n_chars_counted"] == 10
    # gibberish detector direction: repeated filler scores far below prose
    assert got[1]["char_entropy"] < got[3]["char_entropy"] < got[2]["char_entropy"]


def test_char_entropy_counts_codepoints_not_code_units(spark):
    """ADVICE r9: a non-BMP char (surrogate pair in UTF-16) must count as
    ONE character, matching DuckDB's codepoint split — F.split(text, "")
    would count it as two."""
    from duckdb_cloudflare_spark.operators.text_analysis import char_entropy

    df = spark.createDataFrame(
        [
            (1, "\U0001F600\U0001F600\U0001F600\U0001F600"),  # 4× one emoji
            (2, "\U0001F600a\U0001F601b"),                    # 4 distinct cps
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert got[1]["n_chars_counted"] == 4
    assert got[1]["char_entropy"] == 0.0  # one symbol repeated
    assert got[2]["n_chars_counted"] == 4
    assert got[2]["char_entropy"] == pytest.approx(math.log(4), abs=1e-5)


def test_char_entropy_non_bmp_matches_duckdb(spark):
    """Cross-engine pin for the codepoint contract: same counts/entropy
    as the p89 oracle's string_split(text, '') on emoji-bearing text."""
    import duckdb

    from duckdb_cloudflare_spark.operators.text_analysis import char_entropy

    rows = [(1, "hello \U0001F600 world \U0001F600"), (2, "abc\U00010348de")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    con = duckdb.connect()
    for doc_id, text in rows:
        n, h = con.execute(
            """
            WITH c AS (
                SELECT ch, count(*) AS c FROM (
                    SELECT unnest(string_split(?, '')) AS ch
                ) GROUP BY ch
            )
            SELECT CAST(sum(c) AS BIGINT),
                   round(ln(sum(c)) - sum(CAST(round(c*ln(c)*1e6) AS BIGINT))
                         / (CAST(sum(c) AS DOUBLE) * 1e6), 6)
            FROM c
            """,
            [text],
        ).fetchone()
        assert got[doc_id]["n_chars_counted"] == n
        assert got[doc_id]["char_entropy"] == pytest.approx(h, abs=1e-6)


# ---------------------------------------------------------------------------
# embedding_norm_qa (p90)
# ---------------------------------------------------------------------------


def test_embedding_norm_qa_flags_planted_outliers(spark):
    from duckdb_cloudflare_spark.operators.similarity import embedding_norm_qa

    rows = []
    for i in range(50):
        rows.append((i, "a", [1.0, 0.0, 0.0]))  # norm2 = 1
    rows.append((100, "a", [10.0, 0.0, 0.0]))   # exploding norm: norm2 = 100
    rows.append((101, "a", [0.0, 0.0, 0.0]))    # zero vector: norm2 = 0
    for i in range(20):
        rows.append((200 + i, "b", [0.0, 2.0, 0.0]))  # uniform cluster b
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    got = {r["cluster"]: r for r in embedding_norm_qa(df, cluster_col="label").collect()}
    a = got["a"]
    assert a["n_vectors"] == 52
    assert a["min_norm2"] == 0.0 and a["max_norm2"] == 100.0
    # the exploding vector sits way past mean + 2*std; the zero vector is
    # within 2 std of the outlier-inflated mean — exactly 1 flag
    assert a["n_outliers"] == 1
    b = got["b"]
    assert b["n_outliers"] == 0 and b["std_norm2"] == 0.0
    assert b["mean_norm2"] == pytest.approx(4.0, abs=1e-6)


def test_embedding_norm_qa_large_norms_no_overflow(spark):
    """ADVICE r9: Σnm² must not wrap int64. norm²=3600 → nm=3.6e9 →
    nm²=1.296e19 > LONG_MAX already at ONE row; the decimal path keeps
    the sums exact (mirroring the oracle's HUGEINT promotion)."""
    from duckdb_cloudflare_spark.operators.similarity import embedding_norm_qa

    rows = [(i, "g", [60.0, 0.0, 0.0]) for i in range(5)]
    rows += [(10 + i, "g", [80.0, 0.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )
    got = embedding_norm_qa(df, cluster_col="label").collect()[0]
    # exact closed form: nm ∈ {3.6e9, 6.4e9} 5 each → mean 5e9, var 1.96e18
    assert got["mean_norm2"] == pytest.approx(5000.0, rel=1e-9)
    assert got["std_norm2"] == pytest.approx(1400.0, rel=1e-9)
    assert got["min_norm2"] == pytest.approx(3600.0, rel=1e-9)
    assert got["max_norm2"] == pytest.approx(6400.0, rel=1e-9)
    assert got["n_outliers"] == 0


def test_embedding_norm_qa_exploding_norm_at_decimal18_boundary(spark):
    """r10 review find: nm >= 1e18 (norm² >= 1e12 — the exploding-norm
    row this QA gate exists to catch) fits a long but NOT decimal(18,0);
    the cast must be decimal(20,0) or the gate crashes under ANSI on the
    very input it audits."""
    from duckdb_cloudflare_spark.operators.similarity import embedding_norm_qa

    big = 1414213.56  # norm² ≈ 2e12 → nm ≈ 2e18
    rows = [(1, "g", [big, 0.0]), (2, "g", [1.0, 0.0]), (3, "g", [1.0, 0.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    got = embedding_norm_qa(df, cluster_col="label").collect()[0]
    assert got["n_vectors"] == 3
    assert got["max_norm2"] == pytest.approx(big * big, rel=1e-6)
    assert got["min_norm2"] == 1.0
