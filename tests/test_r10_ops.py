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


# ---------------------------------------------------------------------------
# pii_scan (p94)
# ---------------------------------------------------------------------------


def test_pii_scan_hand_computed(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import pii_scan

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@sub.example.co.uk or 10.0.0.1 now"),
            (2, "call 555-123-4567 and ssn 987-65-4320 thanks"),
            (3, "totally clean text with no identifiers at all"),
            (4, "two mails a@b.io c@d.org one ip 192.168.1.200"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"]) == (1, 1)
    assert got[1]["n_pii"] == 2
    assert "<EMAIL>" in got[1]["redacted"] and "<IPV4>" in got[1]["redacted"]
    assert "bob.smith" not in got[1]["redacted"]
    assert (got[2]["n_phone"], got[2]["n_ssn"]) == (1, 1)
    assert "<PHONE>" in got[2]["redacted"] and "<SSN>" in got[2]["redacted"]
    assert got[3]["n_pii"] == 0
    assert got[3]["redacted"] == "totally clean text with no identifiers at all"
    assert (got[4]["n_email"], got[4]["n_ipv4"]) == (2, 1)


def test_pii_scan_rules_do_not_double_count(spark):
    """An SSN-shaped group inside an already-redacted phone must not
    re-count; an email's numeric host must not count as an IPv4."""
    from duckdb_cloudflare_spark.operators.text_analysis import pii_scan

    df = spark.createDataFrame(
        [(1, "root@10.2.3.4 makes one email zero ips")],
        "doc_id long, text string",
    )
    (r,) = pii_scan(df).collect()
    # email pattern needs an alphabetic TLD, so root@10.2.3.4 is NOT an
    # email — but the bare 10.2.3.4 IS an ipv4 hit after the email pass
    assert r["n_email"] == 0 and r["n_ipv4"] == 1


# ---------------------------------------------------------------------------
# decontamination_stats (p95)
# ---------------------------------------------------------------------------


def test_decontamination_hand_computed(spark):
    from duckdb_cloudflare_spark.operators.dedup import decontamination_stats

    # k=3; eval doc: "a b c d" → grams {"a b c", "b c d"}.
    # train 1: "a b c x" → {"a b c", "b c x"} → 1/2 contaminated.
    # train 2: "p q r s" → {"p q r", "q r s"} → 0/2.
    # train 3: "a b c d e" → {"a b c","b c d","c d e"} → 2/3.
    ev = spark.createDataFrame([(100, "a b c d")], "doc_id long, text string")
    tr = spark.createDataFrame(
        [(1, "a b c x"), (2, "p q r s"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontamination_stats(tr, ev, k=3).collect()}
    assert (got[1]["n_ngrams"], got[1]["n_contaminated"]) == (2, 1)
    assert got[1]["contamination"] == 0.5
    assert (got[2]["n_ngrams"], got[2]["n_contaminated"]) == (2, 0)
    assert (got[3]["n_ngrams"], got[3]["n_contaminated"]) == (3, 2)


def test_decontamination_short_docs_dropped_and_dup_grams_counted_once(spark):
    from duckdb_cloudflare_spark.operators.dedup import decontamination_stats

    ev = spark.createDataFrame([(9, "x y z")], "doc_id long, text string")
    tr = spark.createDataFrame(
        [(1, "too short"), (2, "x y z x y z")],  # doc 2 repeats the gram
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontamination_stats(tr, ev, k=3).collect()}
    assert 1 not in got  # < k tokens → no n-grams → dropped
    # distinct grams of doc2: {"x y z", "y z x", "z x y"} — "x y z" once
    assert got[2]["n_ngrams"] == 3 and got[2]["n_contaminated"] == 1


# ---------------------------------------------------------------------------
# apply_domain_blocklist (p97)
# ---------------------------------------------------------------------------


def test_domain_blocklist_collapses_subdomains_and_normalizes(spark):
    from duckdb_cloudflare_spark.operators.web import apply_domain_blocklist

    df = spark.createDataFrame(
        [
            (1, "https://cdn.a.bad.com/x"),        # subdomain of blocked
            (2, "http://bad.com/"),                 # apex blocked
            (3, "https://good.com/bad.com"),        # path mention ≠ domain
            (4, "https://bad.co.uk/x"),             # multi-part SLD entry
            (5, "https://notbad.com/x"),            # suffix-similar, kept
        ],
        "doc_id long, url string",
    )
    # blocklist spellings deliberately dirty: case + trailing dot + a
    # HOSTNAME entry (r10 review: real lists spell subdomains; the entry
    # must collapse to the same eTLD+1 key the probe side derives)
    got = {
        r["doc_id"]: r
        for r in apply_domain_blocklist(
            df, ["login.Bad.COM.", "www.bad.co.uk"]
        ).collect()
    }
    assert [got[i]["blocked"] for i in (1, 2, 3, 4, 5)] == [
        True, True, False, True, False
    ]
    assert got[1]["domain"] == "bad.com"
    assert got[4]["domain"] == "bad.co.uk"


# ---------------------------------------------------------------------------
# cross_source_leakage (p98)
# ---------------------------------------------------------------------------


def test_cross_source_leakage_exact_key_planted_dups(spark):
    from duckdb_cloudflare_spark.operators.dedup import cross_source_leakage

    df = spark.createDataFrame(
        [
            (1, "A", "shared doc body"),
            (2, "B", "shared  DOC body "),  # same after normalization
            (3, "B", "only in b"),
            (4, "C", "shared doc body"),
            (5, "A", "another shared"),
            (6, "C", "another shared"),
            (7, "A", "shared doc body"),  # in-source dup: still ONE fp
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in cross_source_leakage(df).collect()
    }
    assert got == {("A", "B"): 1, ("A", "C"): 2, ("B", "C"): 1}


def test_cross_source_leakage_token_set_key_and_max_cluster(spark):
    from duckdb_cloudflare_spark.operators.dedup import cross_source_leakage

    df = spark.createDataFrame(
        [
            (1, "A", "w1 w2 w2 w3"),
            (2, "B", "w3 w2 w1"),      # same token SET, different text
            (3, "C", "boiler plate"),
            (4, "D", "plate boiler"),
            (5, "E", "boiler plate"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in cross_source_leakage(df, key="token_set").collect()
    }
    assert got[("A", "B")] == 1
    # boiler/plate set shared by C, D, E → all 3 pairs
    assert got[("C", "D")] == got[("C", "E")] == got[("D", "E")] == 1
    # cap at 2 sources: the 3-source cluster drops, the pair stays
    capped = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in cross_source_leakage(df, key="token_set", max_cluster=2).collect()
    }
    assert capped == {("A", "B"): 1}


# ---------------------------------------------------------------------------
# token_fertility_report (p96)
# ---------------------------------------------------------------------------


def test_token_fertility_hand_computed(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import (
        token_fertility_report,
    )

    # "hello world42" → ws tokens 2; bpe: hello|world|42 → 3; chars 13.
    # "a-b c" → ws 2; bpe: a|-|b|c → 4; chars 5.
    df = spark.createDataFrame(
        [(1, "en", "hello world42"), (2, "en", "a-b c"), (3, "zh", "的是了")],
        "doc_id long, lang string, text string",
    )
    got = {r["lang"]: r for r in token_fertility_report(df).collect()}
    en = got["en"]
    assert (en["n_docs"], en["n_chars"], en["n_ws_tokens"], en["n_bpe_tokens"]) == (
        2, 18, 4, 7
    )
    assert en["chars_per_bpe_token"] == 18 / 7
    assert en["bpe_per_ws_token"] == 7 / 4
    zh = got["zh"]
    # every CJK char is a single-char bpe token; one ws token
    assert (zh["n_chars"], zh["n_ws_tokens"], zh["n_bpe_tokens"]) == (3, 1, 3)


# ---------------------------------------------------------------------------
# vocab_growth_curve (p99)
# ---------------------------------------------------------------------------


def test_vocab_growth_hand_computed(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import vocab_growth_curve

    # 4 docs, 2 buckets (ids 0,1 → bucket 0; ids 2,3 → bucket 1).
    # bucket 0 tokens {a, b, c}; bucket 1 adds {d} (c repeats — not new).
    df = spark.createDataFrame(
        [(0, "a b"), (1, "b c"), (2, "c d"), (3, "A")],  # "A" lowers to a
        "doc_id long, text string",
    )
    got = {r["decile"]: r for r in vocab_growth_curve(df, n_buckets=2).collect()}
    assert got[0]["n_new_tokens"] == 3 and got[0]["vocab_size"] == 3
    assert got[1]["n_new_tokens"] == 1 and got[1]["vocab_size"] == 4


def test_vocab_growth_cumulative_monotone_on_corpus(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import vocab_growth_curve

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(
        vocab_growth_curve(df).collect(), key=lambda r: r["decile"]
    )
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)
    assert sizes[-1] == sum(r["n_new_tokens"] for r in rows)


# ---------------------------------------------------------------------------
# pmi_collocations (p100)
# ---------------------------------------------------------------------------


def test_pmi_collocations_hand_computed(spark):
    import math

    from duckdb_cloudflare_spark.operators.text_analysis import pmi_collocations

    # Corpus of one doc: "x y x y x y z" → bigrams: (x,y)*3, (y,x)*2, (y,z)*1
    # N=6. With min_count=2: (x,y): c_a(w1=x)=3, c_b(w2=y)=3 →
    # pmi = ln(3*6/(3*3)) = ln(2); (y,x): c_a(y)=3, c_b(x)=2 →
    # ln(2*6/(3*2)) = ln(2).
    df = spark.createDataFrame([(1, "x y x y x y z")], "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, top_k=10, min_count=2).collect()
    }
    assert set(got) == {("x", "y"), ("y", "x")}
    assert got[("x", "y")]["n_ab"] == 3
    assert got[("x", "y")]["pmi"] == round(math.log(2.0), 6)
    assert got[("y", "x")]["pmi"] == round(math.log(2.0), 6)


def test_pmi_collocations_min_count_and_topk_tiebreak(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import pmi_collocations

    # all bigrams unique (count 1) → min_count=2 filters everything
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    assert pmi_collocations(df, top_k=5, min_count=2).count() == 0
    # with min_count=1 the k boundary is tie-broken by (w1, w2): the 4
    # bigrams all have pmi ln(4/1)=... identical marginals? not quite —
    # just assert the limit is exact and deterministic across two runs
    a = [tuple(r) for r in pmi_collocations(df, top_k=3, min_count=1).collect()]
    b = [tuple(r) for r in pmi_collocations(df, top_k=3, min_count=1).collect()]
    assert len(a) == 3 and a == b


def test_pmi_single_token_docs_survive_pushdown(spark):
    """The p34 hazard class: 1-token docs must not fault the bigram
    transform under ANSI even if a derived predicate is pushed below the
    size filter."""
    from duckdb_cloudflare_spark.operators.text_analysis import pmi_collocations

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "pair of tokens pair of")],
        "doc_id long, text string",
    )
    rows = pmi_collocations(df, top_k=10, min_count=1).collect()
    assert all(r["w1"] is not None for r in rows)


def test_vocab_growth_bigram_mode(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import vocab_growth_curve

    # 2 buckets over ids 0..3: bucket = id*2 div 4 → ids {0,1} bucket 0,
    # ids {2,3} bucket 1. Bucket 0: "a b c" → {a b, b c} (+"x": no bigram);
    # bucket 1: "b c d" → only "c d" is new. Single-token and empty docs
    # must not fault the guarded transform.
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "x"), (2, "b c d"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["decile"]: r for r in vocab_growth_curve(df, n_buckets=2, ngram=2).collect()
    }
    assert got[0]["n_new_tokens"] == 2 and got[0]["vocab_size"] == 2
    assert got[1]["n_new_tokens"] == 1 and got[1]["vocab_size"] == 3


# ---------------------------------------------------------------------------
# q58 event transitions
# ---------------------------------------------------------------------------


def test_event_transitions_hand_computed(spark):
    from duckdb_cloudflare_spark.queries import all_queries
    import os
    import tempfile

    # u1: a(t1) -> b(t2) -> a(t3); u2: a(t1) -> c(t2). Transitions:
    # a->b 1, b->a 1, a->c 1. From 'a': 2 total -> p=0.5 each.
    d = tempfile.mkdtemp()
    rows = [
        (1, dt.datetime(2024, 3, 1, 1), 1, "a", 0.0, "{}"),
        (2, dt.datetime(2024, 3, 1, 2), 1, "b", 0.0, "{}"),
        (3, dt.datetime(2024, 3, 1, 3), 1, "a", 0.0, "{}"),
        (4, dt.datetime(2024, 3, 1, 1), 2, "a", 0.0, "{}"),
        (5, dt.datetime(2024, 3, 1, 2), 2, "c", 0.0, "{}"),
        (6, dt.datetime(2024, 3, 1, 9), None, "zz", 0.0, "{}"),  # dropped
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        (r["from_type"], r["to_type"]): r
        for r in all_queries()["q58_event_transitions"](spark, d).collect()
    }
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "c")}
    assert got[("a", "b")]["n"] == 1 and got[("a", "b")]["p_transition"] == 0.5
    assert got[("a", "c")]["p_transition"] == 0.5
    assert got[("b", "a")]["p_transition"] == 1.0


def test_event_transitions_tie_break_is_event_id(spark):
    from duckdb_cloudflare_spark.queries import all_queries
    import os
    import tempfile

    # same ts: order must follow event_id (1:x then 2:y), so x->y not y->x
    d = tempfile.mkdtemp()
    ts0 = dt.datetime(2024, 3, 2, 5)
    rows = [
        (1, ts0, 7, "x", 0.0, "{}"),
        (2, ts0, 7, "y", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    rows = all_queries()["q58_event_transitions"](spark, d).collect()
    assert len(rows) == 1
    assert (rows[0]["from_type"], rows[0]["to_type"]) == ("x", "y")


def test_event_transitions_null_ts_sorts_last_like_duckdb(spark):
    """r10 code-review pin: a null-ts event must order AFTER every
    timestamped event (NULLS LAST — DuckDB's window default; Spark's
    default is nulls FIRST, so the query states it explicitly)."""
    from duckdb_cloudflare_spark.queries import all_queries
    import os
    import tempfile

    d = tempfile.mkdtemp()
    rows = [
        (1, dt.datetime(2024, 4, 1, 1), 5, "a", 0.0, "{}"),
        (2, dt.datetime(2024, 4, 1, 2), 5, "b", 0.0, "{}"),
        (3, None, 5, "z", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = sorted(
        (r["from_type"], r["to_type"])
        for r in all_queries()["q58_event_transitions"](spark, d).collect()
    )
    # NULLS LAST: a -> b -> z, never z -> a
    assert got == [("a", "b"), ("b", "z")]


# ---------------------------------------------------------------------------
# source_char_similarity (p101)
# ---------------------------------------------------------------------------


def test_source_char_similarity_hand_computed(spark):
    import math

    from duckdb_cloudflare_spark.operators.text_analysis import (
        source_char_similarity,
    )

    # A: "aab" → {a:2, b:1}; B: "ab" → {a:1, b:1}; C: "cc" → {c:2}.
    # cos(A,B) = (2·1 + 1·1) / (√5·√2) = 3/√10; cos with C = 0 → the
    # (A,C)/(B,C) pairs share no chars and must NOT appear (inner join).
    df = spark.createDataFrame(
        [(1, "A", "aab"), (2, "B", "ab"), (3, "C", "cc"), (4, None, "x"), (5, "A", None)],
        "doc_id long, source string, text string",
    )
    got = {
        (r["src_a"], r["src_b"]): r for r in source_char_similarity(df).collect()
    }
    assert set(got) == {("A", "B")}
    assert got[("A", "B")]["dot"] == 3
    assert got[("A", "B")]["cosine"] == round(3 / math.sqrt(10), 6)


def test_source_char_similarity_identical_sources_cosine_one(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import (
        source_char_similarity,
    )

    df = spark.createDataFrame(
        [(1, "A", "same text here"), (2, "B", "same text here")],
        "doc_id long, source string, text string",
    )
    (r,) = source_char_similarity(df).collect()
    assert r["cosine"] == 1.0


def test_domain_blocklist_ip_literals_key_whole(spark):
    """An IPv4-literal blocklist entry must match exactly that address —
    never collapse to its last two octets and over-block (review find)."""
    from duckdb_cloudflare_spark.operators.web import apply_domain_blocklist

    df = spark.createDataFrame(
        [
            (1, "http://1.2.3.4/x"),      # listed IP
            (2, "http://9.9.3.4/x"),      # different IP, same last octets
            (3, "https://sub.ipish.net/"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r
        for r in apply_domain_blocklist(df, ["1.2.3.4", "ipish.net"]).collect()
    }
    assert got[1]["blocked"] is True and got[1]["domain"] == "1.2.3.4"
    assert got[2]["blocked"] is False and got[2]["domain"] == "9.9.3.4"
    assert got[3]["blocked"] is True
