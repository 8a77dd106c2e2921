"""Behavioral pins for the r12 operators (p102 line dedup, p103 shard
manifest) — cross-engine value parity is covered by the driver-replica
gate (test_oracle_parity) and the gated sf0.1/dirty sweeps; these pin the
operator CONTRACTS on data built to exercise them."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_removes_later_duplicates_across_and_within_docs(spark):
    from duckdb_cloudflare_spark.operators.dedup import line_dedup

    boiler = "accept our cookie banner please"
    df = _docs(
        spark,
        [
            (1, f"{boiler}\nfirst doc unique content line\n{boiler}"),
            (2, f"{boiler}\nsecond doc unique content line"),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # doc 1: first occurrence (pos 0) kept, within-doc repeat (pos 2) removed
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[1]["clean_text"] == f"{boiler}\nfirst doc unique content line"
    # doc 2: cross-doc duplicate removed, unique line survives
    assert out[2]["n_lines"] == 2 and out[2]["n_removed"] == 1
    assert out[2]["clean_text"] == "second doc unique content line"


def test_line_dedup_keeps_short_lines_and_null_text(spark):
    from duckdb_cloudflare_spark.operators.dedup import line_dedup

    # blank + short structural lines repeat everywhere but are never
    # dedup candidates (min_len guard); NULL text folds to one empty line
    df = _docs(
        spark,
        [
            (1, "Home\n\nHome\n\nsubstantial enough to dedup"),
            (2, "Home\n\nsubstantial enough to dedup"),
            (3, None),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == "Home\n\nHome\n\nsubstantial enough to dedup"
    assert out[2]["n_removed"] == 1 and out[2]["clean_text"] == "Home\n"
    assert out[3]["n_lines"] == 1 and out[3]["clean_text"] == ""


def test_line_dedup_survivor_rule_is_deterministic_id_pos_order(spark):
    from duckdb_cloudflare_spark.operators.dedup import line_dedup

    dup = "this exact line appears in both documents"
    df = _docs(spark, [(7, dup), (3, dup)])
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # the LOWER doc_id wins regardless of registration/partition order
    assert out[3]["n_removed"] == 0 and out[3]["clean_text"] == dup
    assert out[7]["n_removed"] == 1 and out[7]["clean_text"] == ""


def test_shard_manifest_is_partition_order_independent(spark):
    from duckdb_cloudflare_spark.operators.curation import shard_manifest

    df = spark.createDataFrame(
        [(i, f"text body {i}", 10 + i) for i in range(500)],
        "doc_id long, text string, n_chars long",
    )
    a = {r["shard_id"]: r for r in shard_manifest(df).collect()}
    b = {
        r["shard_id"]: r
        for r in shard_manifest(
            df.repartition(17, "text").sortWithinPartitions(F.desc("doc_id"))
        ).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k]["fingerprint"] == b[k]["fingerprint"]
        assert a[k]["n_docs"] == b[k]["n_docs"]
    # every document lands in exactly one shard
    assert sum(r["n_docs"] for r in a.values()) == 500
    assert all(0 <= k < 64 for k in a)


def test_shard_manifest_fingerprint_sees_content_changes(spark):
    from duckdb_cloudflare_spark.operators.curation import shard_manifest

    base = spark.createDataFrame(
        [(i, f"text {i}", 5) for i in range(100)],
        "doc_id long, text string, n_chars long",
    )
    tweaked = base.withColumn(
        "text", F.when(F.col("doc_id") == 42, "tampered").otherwise(F.col("text"))
    )
    fa = {r["shard_id"]: r["fingerprint"] for r in shard_manifest(base).collect()}
    fb = {r["shard_id"]: r["fingerprint"] for r in shard_manifest(tweaked).collect()}
    changed = [k for k in fa if fa[k] != fb[k]]
    assert len(changed) == 1  # exactly doc 42's shard moved


def test_line_dedup_null_id_ties_match_duckdb_rank_semantics(spark):
    """Two NULL-id docs emitting the identical (pos, line): Spark marks
    keepers by struct-min EQUALITY (both keep), the oracle by rank()=1
    with the NULL id collapsed to LONG_MIN — pinned cross-engine here
    because the generic sweeps only null whole columns."""
    import duckdb

    from duckdb_cloudflare_spark.operators.dedup import line_dedup

    rows = [
        (None, "identical long boilerplate line"),
        (None, "identical long boilerplate line"),
        (9, "identical long boilerplate line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = line_dedup(df).collect()
    by_id = {r["doc_id"]: r for r in got}
    # the two NULL-id docs fold into ONE group row (GROUP BY NULL), both
    # occurrences kept (ties); doc 9's copy is a later duplicate
    assert by_id[None]["n_lines"] == 2 and by_id[None]["n_removed"] == 0
    assert by_id[9]["n_removed"] == 1 and by_id[9]["clean_text"] == ""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(NULL, 'identical long boilerplate line'),"
        "(NULL, 'identical long boilerplate line'),"
        "(9, 'identical long boilerplate line')) t(doc_id, text)"
    )
    from duckdb_cloudflare_spark import queries as Q

    oracle = Q.all_oracles()["p102_line_dedup"]
    want = {
        r[0]: (r[1], r[2], r[3]) for r in con.execute(oracle).fetchall()
    }
    for r in got:
        assert want[r["doc_id"]] == (
            r["n_lines"], r["n_removed"], r["clean_text"]
        )


# --- r12 batch 2: p104 html extract, p105 bpe pairs, p106 confusion,
#     q61 anomaly, q62 conversion lag ---


def test_html_extract_adversarial(spark):
    from duckdb_cloudflare_spark.operators.web import html_extract

    html = (
        "<HTML><head><TITLE id=x>My &amp; Title</TITLE>"
        "<script>var x = '<p>not text</p>';</script>"
        "<style>p { color: red }</style>"
        "<!-- <a href='#'>commented-out link</a> -->"
        "</head><body>"
        "<p>Hello&nbsp;&lt;world&gt;</p>"
        '<a href="/one">one</a> <a href="/two">two</a>'
        "</body></HTML>"
    )
    df = spark.createDataFrame([(1, html), (2, None)], "doc_id long, html string")
    out = {r["doc_id"]: r for r in html_extract(df).collect()}
    r = out[1]
    # (?i) title match despite attribute + case; entities decoded
    assert r["title"] == "My &amp; Title"  # title group is raw (no decode pass)
    # script/style/comment contents must NOT leak into text — including
    # the <a> hidden inside the comment (not counted as a link either...
    # n_links counts raw '<a ' occurrences, comment included: 3)
    assert "not text" not in r["clean_text"]
    assert "color" not in r["clean_text"]
    # flat extraction keeps inner text of non-script elements — the title
    # text is body text too (matches what trafilatura-style flat modes do)
    assert r["clean_text"] == "My & Title Hello <world> one two"
    assert r["n_links"] == 3
    assert r["clean_len"] == len(r["clean_text"])
    # NULL html propagates (fetch-error contract), not ''
    assert out[2]["title"] == "" or out[2]["title"] is None
    assert out[2]["clean_text"] is None and out[2]["clean_len"] is None


def test_html_to_text_unclosed_script_and_plain_text(spark):
    from duckdb_cloudflare_spark.operators.web import html_to_text

    df = spark.createDataFrame(
        [
            # unclosed <script>: the (?s).*?</script> pass can't match, the
            # tag-stripper still removes the <script> TAG itself; body after
            # it survives (flat-extraction contract, not a DOM parser)
            (1, "<body>before<script>var x = 1; after</script-less"),
            # no markup at all -> identity modulo whitespace collapse
            (2, "  plain   text,  no tags  "),
        ],
        "doc_id long, html string",
    )
    rows = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", html_to_text(F.col("html")).alias("t")).collect()
    }
    assert "before" in rows[1]
    assert rows[2] == "plain text, no tags"


def test_bpe_pair_counts_matches_python_reference(spark):
    from collections import Counter

    from duckdb_cloudflare_spark.operators.text_analysis import bpe_pair_counts

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "a ab abc",  # 'a' dropped by the min-length-2 gate
        None,
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["pair"], r["pair_count"]) for r in bpe_pair_counts(df).collect()
    }

    # reference: word-frequency-weighted char-bigram counts (BPE iter 0)
    words = Counter()
    for t in texts:
        for w in (t or "").split():
            if len(w) >= 2:
                words[w.lower()] += 1
    ref = Counter()
    for w, f in words.items():
        for i in range(len(w) - 1):
            ref[w[i : i + 2]] += f
    assert got == {(p, c) for p, c in ref.items()}
    # the canonical BPE example: 'lo' and 'ow' dominate
    assert ref["lo"] == ref["ow"] == 6  # low×4 + lower + lowest


def test_bpe_pair_counts_top_n_boundary_deterministic(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import bpe_pair_counts

    # four pairs all with count 1 -> top_n=2 must keep the lexicographically
    # smallest pairs, not an arbitrary engine-order subset
    df = spark.createDataFrame([("xy za",), ("qr bc",)], "text string")
    out = [r["pair"] for r in bpe_pair_counts(df, top_n=2).collect()]
    assert out == ["bc", "qr"]


def test_langid_confusion_shares_sum_to_one(spark):
    from duckdb_cloudflare_spark.queries import all_queries

    q = all_queries()["p106_langid_confusion"]
    pdf = q(spark, "/root/testdata/sf0.001").toPandas()
    # every labeled language row's shares sum to 1 and cells are positive
    sums = pdf.groupby("lang_true")["share_of_true"].sum()
    assert ((sums - 1.0).abs() < 1e-12).all()
    assert (pdf["n_docs"] > 0).all()


def test_event_anomaly_flags_planted_spike(spark):
    import datetime as dt

    from duckdb_cloudflare_spark.queries import all_queries
    import duckdb_cloudflare_spark.queries as Qm

    # 30 steady hours at 10 events/hour, then one 300-event spike hour
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(31):
        n = 300 if h == 30 else 10
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=h, seconds=i), 7, "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    # route the registry query at a synthetic table via the loader cache
    key = "/t-anomaly/events"
    Qm._TABLE_CACHE[key] = df
    try:
        out = all_queries()["q61_event_anomaly"](spark, "/t-anomaly").collect()
    finally:
        Qm._TABLE_CACHE.pop(key, None)
    # steady hours: sd == 0 -> excluded by the var>0 guard; only the spike
    # hour (first row with 24 full trailing hours AND variance) can flag —
    # and the spike itself has sd computed over the 24 steady hours... all
    # equal -> var == 0. Jitter one trailing hour so variance is nonzero.
    assert out == []  # all-constant trailing window -> var 0 -> no flags


def test_event_anomaly_flags_spike_with_jittered_baseline(spark):
    import datetime as dt

    from duckdb_cloudflare_spark.queries import all_queries
    import duckdb_cloudflare_spark.queries as Qm

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(31):
        n = 300 if h == 30 else (11 if h % 2 else 10)  # jittered baseline
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=h, seconds=i), 7, "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    key = "/t-anomaly2/events"
    Qm._TABLE_CACHE[key] = df
    try:
        out = all_queries()["q61_event_anomaly"](spark, "/t-anomaly2").collect()
    finally:
        Qm._TABLE_CACHE.pop(key, None)
    assert len(out) == 1
    r = out[0]
    assert r["event_type"] == "click" and r["n"] == 300
    assert r["zscore"] > 100  # a 300-vs-10.5 spike is a massive z
    assert abs(r["trailing_mean"] - 10.5) < 1e-12


def test_conversion_lag_fixture(spark):
    import datetime as dt

    from duckdb_cloudflare_spark.queries import all_queries
    import duckdb_cloudflare_spark.queries as Qm

    mon = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        # user 1: signup then purchase 100s later (converted)
        (0, mon + dt.timedelta(hours=1), 1, "signup", 1.0, "{}"),
        (1, mon + dt.timedelta(hours=1, seconds=100), 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE signup -> not converted
        (2, mon + dt.timedelta(hours=2), 2, "purchase", 1.0, "{}"),
        (3, mon + dt.timedelta(hours=3), 2, "signup", 1.0, "{}"),
        # user 3: signup only -> not converted
        (4, mon + dt.timedelta(hours=4), 3, "signup", 1.0, "{}"),
        # user 4: purchase only -> no signup, excluded entirely
        (5, mon + dt.timedelta(hours=5), 4, "purchase", 1.0, "{}"),
        # user 5: next week, converted after 200s (second purchase ignored)
        (6, mon + dt.timedelta(days=7), 5, "signup", 1.0, "{}"),
        (7, mon + dt.timedelta(days=7, seconds=200), 5, "purchase", 1.0, "{}"),
        (8, mon + dt.timedelta(days=7, seconds=900), 5, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    key = "/t-convlag/events"
    Qm._TABLE_CACHE[key] = df
    try:
        out = {
            r["cohort_week"]: r
            for r in all_queries()["q62_conversion_lag"](spark, "/t-convlag").collect()
        }
    finally:
        Qm._TABLE_CACHE.pop(key, None)
    w1, w2 = mon, mon + dt.timedelta(days=7)
    assert set(out) == {w1, w2}
    r1 = out[w1]
    assert r1["n_signups"] == 3 and r1["n_converted"] == 1
    assert abs(r1["conversion_rate"] - 1 / 3) < 1e-15
    assert r1["median_lag_s"] == 100.0 and r1["p90_lag_s"] == 100.0
    r2 = out[w2]
    assert r2["n_signups"] == 1 and r2["n_converted"] == 1
    assert r2["median_lag_s"] == 200.0  # first purchase, not the later one


def test_q63_approx_twin_tracks_exact_q62(spark):
    """q63's GK-sketch quantiles must agree with q62's exact median/p90
    within the rank-error bound (accuracy=10000 → ≤ n/10000 ranks ≈ exact
    at sf0.01 cohort sizes), and the integer columns must be identical."""
    from duckdb_cloudflare_spark.queries import all_queries

    sf = "/root/testdata/sf0.01"
    exact = {
        r["cohort_week"]: r
        for r in all_queries()["q62_conversion_lag"](spark, sf).collect()
    }
    approx = {
        r["cohort_week"]: r
        for r in all_queries()["q63_conversion_lag_approx"](spark, sf).collect()
    }
    assert set(exact) == set(approx)
    for week, e in exact.items():
        a = approx[week]
        assert a["n_signups"] == e["n_signups"]
        assert a["n_converted"] == e["n_converted"]
        assert a["conversion_rate"] == e["conversion_rate"]
        if e["median_lag_s"] is None:
            assert a["median_lag_s_approx"] is None
            continue
        # GK returns an OBSERVED value at most n/accuracy ranks away from
        # the true quantile; exact q62 interpolates between observed
        # values — allow the neighbor gap (here lags are seconds apart,
        # so 10% relative is a generous envelope)
        assert abs(a["median_lag_s_approx"] - e["median_lag_s"]) <= max(
            0.1 * e["median_lag_s"], 1.0
        )
        assert abs(a["p90_lag_s_approx"] - e["p90_lag_s"]) <= max(
            0.1 * e["p90_lag_s"], 1.0
        )


def test_neardup_eval_internal_consistency_and_identical_docs(spark):
    """TP+FP = candidates, TP+FN = truth; a corpus of verbatim duplicates
    is caught by BOTH engines (identical signatures collide in every
    band), so P = R = 1 there."""
    import duckdb_cloudflare_spark.queries as Qm
    from duckdb_cloudflare_spark.queries import all_queries

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, dup, "en", "s", len(dup)) for i in range(4)] + [
        (10, "one completely unrelated document body here now", "en", "s", 48)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    key = "/t-ndeval/documents"
    Qm._TABLE_CACHE[key] = df
    try:
        r = all_queries()["p107_neardup_eval"](spark, "/t-ndeval").collect()[0]
    finally:
        Qm._TABLE_CACHE.pop(key, None)
    assert r["tp"] + r["fp"] == r["n_candidates"]
    assert r["tp"] + r["fn"] == r["n_truth"]
    assert r["n_truth"] == 6  # C(4,2) verbatim-dup pairs
    assert r["precision"] == 1.0 and r["recall"] == 1.0
