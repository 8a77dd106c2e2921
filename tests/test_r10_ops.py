"""Hand-computed unit tests for the r10 operators (p91/p92/q56) — the
oracle-parity gate covers engine agreement; these pin the SEMANTICS on
planted fixtures where the right answer is known by construction."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# minhash_est_jaccard_pairs (p91)
# ---------------------------------------------------------------------------


def test_minhash_est_jaccard_identical_docs_agree_fully(spark):
    from duckdb_cloudflare_spark.operators.dedup import minhash_est_jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different content about spark engines here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in minhash_est_jaccard_pairs(df).collect()
    }
    # identical shingle sets → identical signatures → all bands collide,
    # all 8 slots agree, estimate exactly 1.0
    assert (1, 2) in got
    assert got[(1, 2)]["n_agree"] == 8
    assert got[(1, 2)]["est_jaccard"] == 1.0
    # doc 3 shares no shingles: its signature can only collide with 1/2 by
    # md5 accident (none on this fixture)
    assert all(a != 3 and b != 3 for a, b in got)


def test_minhash_est_jaccard_pairs_deduped_across_bands(spark):
    from duckdb_cloudflare_spark.operators.dedup import minhash_est_jaccard_pairs

    # identical docs collide in ALL 4 bands — the pair must appear ONCE
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g")],
        "doc_id long, text string",
    )
    rows = minhash_est_jaccard_pairs(df).collect()
    assert len(rows) == 1
    assert rows[0]["id_a"] == 1 and rows[0]["id_b"] == 2


def test_minhash_est_jaccard_estimate_tracks_true_jaccard(spark):
    from duckdb_cloudflare_spark.operators.dedup import minhash_est_jaccard_pairs

    # two docs sharing most (but not all) shingles: estimate must land
    # strictly between 0 and 1 whenever the pair surfaces, and equal
    # n_agree/8 exactly
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra trailing words here")],
        "doc_id long, text string",
    )
    rows = minhash_est_jaccard_pairs(df).collect()
    if rows:  # banding may or may not propose the pair — if it does:
        (r,) = rows
        assert r["est_jaccard"] == r["n_agree"] / 8.0
        assert 0.0 < r["est_jaccard"] <= 1.0


# ---------------------------------------------------------------------------
# length_report (p92)
# ---------------------------------------------------------------------------


def test_length_report_hand_computed(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import length_report

    # group "a": lengths 10..100 step 10 (n=10) →
    #   p50 rank = (10*50+99)//100 = 5 → 50
    #   p90 rank = (10*90+99)//100 = 9 → 90
    #   p99 rank = (10*99+99)//100 = 10 → 100
    rows = [(i, "a", (i + 1) * 10) for i in range(10)]
    rows += [(100, "b", 7)]  # singleton group: every quantile = 7
    rows += [(101, None, 5), (102, "c", None)]  # dropped
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r["source"]: r for r in length_report(df).collect()}
    a = got["a"]
    assert a["n_docs"] == 10
    assert (a["min_chars"], a["p50_chars"], a["p90_chars"], a["p99_chars"], a["max_chars"]) == (
        10, 50, 90, 100, 100
    )
    assert a["mean_chars"] == pytest.approx(55.0)
    b = got["b"]
    assert (b["p50_chars"], b["p90_chars"], b["p99_chars"]) == (7, 7, 7)
    assert set(got) == {"a", "b"}


def test_length_report_integer_rank_at_the_decimal_trap(spark):
    """n=500, q=0.9: decimal-exact ceil(450) = 450 while double 0.9*500 =
    450.0000000000001 would ceil to 451 — the integer-rank formula must
    give rank 450 (value 450 on a 1..500 ladder)."""
    from duckdb_cloudflare_spark.operators.text_analysis import length_report

    df = spark.createDataFrame(
        [(i, "g", i) for i in range(1, 501)], "doc_id long, source string, n_chars long"
    )
    (r,) = length_report(df).collect()
    assert r["p90_chars"] == 450
    assert r["p50_chars"] == 250
    assert r["p99_chars"] == 495


# ---------------------------------------------------------------------------
# q56 sliding distinct users
# ---------------------------------------------------------------------------


def test_sliding_distinct_users_hand_computed(spark):
    from duckdb_cloudflare_spark.queries import all_queries
    import os
    import tempfile

    # 3 observed days spanning a week boundary: day1 {u1,u2}, day5 {u2,u3},
    # day9 {u4}. Trailing-7d: day1 → {u1,u2}=2; day5 → day1..5 {u1,u2,u3}=3;
    # day9 → day3..9 {u2,u3,u4}=3.
    d = tempfile.mkdtemp()
    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 1, "c", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 6), 2, "c", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 5, 5), 2, "c", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 5, 9), 3, "c", 0.0, "{}"),
        (5, dt.datetime(2024, 1, 9, 1), 4, "c", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        str(r["day"]): r
        for r in all_queries()["q56_sliding_distinct_users"](spark, d).collect()
    }
    assert set(got) == {"2024-01-01", "2024-01-05", "2024-01-09"}
    assert got["2024-01-01"]["users_7d"] == 2 and got["2024-01-01"]["users_1d"] == 2
    assert got["2024-01-05"]["users_7d"] == 3 and got["2024-01-05"]["users_1d"] == 2
    assert got["2024-01-09"]["users_7d"] == 3 and got["2024-01-09"]["users_1d"] == 1


# ---------------------------------------------------------------------------
# shingle_df_histogram (p93)
# ---------------------------------------------------------------------------


def test_shingle_df_histogram_hand_computed(spark):
    from duckdb_cloudflare_spark.operators.dedup import shingle_df_histogram

    # 4 docs: "a b c" (1 shingle "a b c") shared by docs 1-3; doc 4 has
    # "x y z" (df=1) and shares nothing. df profile: {"a b c": 3,
    # "x y z": 1} → bucket log2(3)=1: 1 shingle, 3 instances, 3 pairs;
    # bucket log2(1)=0: 1 shingle, 1 instance, 0 pairs.
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b c"), (4, "x y z")],
        "doc_id long, text string",
    )
    got = {r["log2_df"]: r for r in shingle_df_histogram(df).collect()}
    assert set(got) == {0, 1}
    assert got[1]["n_shingles"] == 1
    assert got[1]["n_instances"] == 3
    assert got[1]["pair_pressure"] == 3  # 3*2/2
    assert got[0]["n_shingles"] == 1
    assert got[0]["n_instances"] == 1
    assert got[0]["pair_pressure"] == 0


def test_shingle_df_histogram_power_of_two_bucket_edges(spark):
    """df=2 must land in bucket 1 and df=4 in bucket 2 — the exact
    powers of two where floating floor(log2) implementations drift."""
    from duckdb_cloudflare_spark.operators.dedup import shingle_df_histogram

    rows = [(i, "p q r") for i in range(4)]           # df=4 shingle
    rows += [(10 + i, "s t u") for i in range(2)]     # df=2 shingle
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["log2_df"]: r for r in shingle_df_histogram(df).collect()}
    assert got[2]["n_instances"] == 4 and got[2]["pair_pressure"] == 6
    assert got[1]["n_instances"] == 2 and got[1]["pair_pressure"] == 1


# ---------------------------------------------------------------------------
# q57 retention cohorts
# ---------------------------------------------------------------------------


def test_retention_cohorts_hand_computed(spark):
    from duckdb_cloudflare_spark.queries import all_queries
    import os
    import tempfile

    # u1 first seen day1, active day1+day3 → cohort day1: offsets {0, 2}.
    # u2 first seen day1, active day1 only → strengthens offset 0.
    # u3 first seen day3, active day3 + day20 (offset 17 > 13 → dropped).
    d = tempfile.mkdtemp()
    rows = [
        (1, dt.datetime(2024, 2, 1, 4), 1, "c", 0.0, "{}"),
        (2, dt.datetime(2024, 2, 3, 4), 1, "c", 0.0, "{}"),
        (3, dt.datetime(2024, 2, 1, 5), 2, "c", 0.0, "{}"),
        (4, dt.datetime(2024, 2, 3, 6), 3, "c", 0.0, "{}"),
        (5, dt.datetime(2024, 2, 20, 6), 3, "c", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        (str(r["cohort_day"]), r["offset_days"]): r["n_users"]
        for r in all_queries()["q57_retention_cohorts"](spark, d).collect()
    }
    assert got == {
        ("2024-02-01", 0): 2,  # u1, u2
        ("2024-02-01", 2): 1,  # u1 returns on day3
        ("2024-02-03", 0): 1,  # u3's own cohort
    }


def test_minhash_est_jaccard_max_bucket_drops_mass_dup_cluster(spark):
    """p06's hot-bucket rule on the p91 engine: 30 identical docs share
    every band → 435 pairs uncapped; max_bucket=10 drops those buckets
    entirely while an unrelated small near-dup pair is untouched."""
    from duckdb_cloudflare_spark.operators.dedup import minhash_est_jaccard_pairs

    rows = [(i, "mass duplicated boilerplate page body here") for i in range(30)]
    rows += [(100, "rare one two three four five"), (101, "rare one two three four five")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_est_jaccard_pairs(df).collect()
    capped = minhash_est_jaccard_pairs(df, max_bucket=10).collect()
    assert len(uncapped) == 30 * 29 // 2 + 1
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert got == {(100, 101)}


def test_minhash_est_jaccard_honors_custom_id_col(spark):
    """r10 review: id_col must select the input column, not just rename
    the output — a (page_id, text) frame has no doc_id at all."""
    from duckdb_cloudflare_spark.operators.dedup import minhash_est_jaccard_pairs

    df = spark.createDataFrame(
        [(7, "same words in both docs here"), (9, "same words in both docs here")],
        "page_id long, text string",
    )
    rows = minhash_est_jaccard_pairs(df, id_col="page_id").collect()
    assert len(rows) == 1
    assert (rows[0]["id_a"], rows[0]["id_b"]) == (7, 9)
    assert rows[0]["est_jaccard"] == 1.0
