"""r13 operator pins: the full iterative BPE merge loop (p111), its
tokenize/apply side (p113), the multimodal curation capstone (p112), and
the q61 window-semantics contract (observed hours, VERDICT r12 item 5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_cloudflare_spark.operators.multimodal import (
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    image_dhash_bytes,
    multimodal_curation_report,
    multimodal_profile,
)
from duckdb_cloudflare_spark.operators.text_analysis import (
    bpe_train,
    bpe_train_reference,
)


# ---------------------------------------------------------------------------
# p111 — iterative BPE merge loop
# ---------------------------------------------------------------------------


def _word_freqs(texts):
    wf = {}
    for t in texts:
        for w in (t or "").split():
            w = w.lower()
            if len(w) >= 2:
                wf[w] = wf.get(w, 0) + 1
    return wf


def test_bpe_train_matches_python_reference_deep(spark):
    # 8 merges over a corpus with ties, multi-character merges, and words
    # that merge down to a single symbol mid-training — the whole
    # path-dependent trajectory must match the classic dict trainer
    texts = [
        "low low low lower lowest newer newest new",
        "wider wide widest low newer er er",
        "banana bandana ananas",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=8).collect()]
    want = bpe_train_reference(_word_freqs(texts), 8)
    assert got == want
    assert len(got) == 8
    # later merges consume earlier merged symbols (the iterative point):
    # some lhs/rhs must be multi-character by merge 8
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _, _ in got)


def test_bpe_train_greedy_overlap_semantics(spark):
    # pair (a, a) over 'aaaa'/'aaa': non-overlapping left-to-right — the
    # same greedy pass as Sennrich's scan ('aaa' -> [aa, a], never [a, aa])
    texts = ["aaaa aaa aa"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=3).collect()]
    want = bpe_train_reference(_word_freqs(texts), 3)
    assert got == want
    assert got[0][1:4] == ("a", "a", "aa")  # first merge is (a,a)


def test_bpe_train_tie_break_is_lexicographic(spark):
    # 'xy' and 'ab' both appear once: the argmax must pick 'ab' (count
    # DESC, lhs ASC, rhs ASC) — engine-order must not leak through
    df = spark.createDataFrame([("xy ab",)], "text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=1).collect()]
    assert got == [(1, "a", "b", "ab", 1)]


def test_bpe_train_exhausts_merges_gracefully(spark):
    # one 2-char word: after merge 1 the vocab is fully merged — no pairs
    # remain, so merges 2..5 produce no rows (reference breaks its loop)
    df = spark.createDataFrame([("ab ab ab",)], "text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=5).collect()]
    want = bpe_train_reference(_word_freqs(["ab ab ab"]), 5)
    assert got == want == [(1, "a", "b", "ab", 3)]


def test_bpe_train_rejects_bad_n_merges(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError, match="n_merges >= 1"):
        bpe_train(df, n_merges=0)


def test_bpe_train_plan_is_pure_jvm(spark):
    # the whole training loop is codegen string/agg work: no Python eval
    # stage may appear in the plan (the p104 map-only discipline, applied
    # to an iterative operator)
    from duckdb_cloudflare_spark.plans.introspect import formatted_plan

    df = spark.createDataFrame([("low lower",)], "text string")
    plan = formatted_plan(bpe_train(df, n_merges=2))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    # per-iteration argmax is a 1-row broadcast, never a sort-merge join
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# p112 — multimodal curation capstone
# ---------------------------------------------------------------------------


def _fixture_assets():
    """One asset per curation path. doc_ids are deliberately shuffled
    relative to modality so the report cannot lean on id arithmetic."""
    img_a = encode_fake_image(16, 8, 1, bytes(range(128)))  # cluster A
    img_b = encode_fake_image(16, 8, 1, bytes(reversed(range(128))))
    assert image_dhash_bytes(img_a) != image_dhash_bytes(img_b)
    silent = encode_fake_audio(8000, 64, bytes([128] * 64))
    clipped = encode_fake_audio(8000, 64, bytes([0, 255] * 32))
    normal = encode_fake_audio(8000, 64, bytes([148, 108] * 32))
    vid_ok = encode_fake_video(32, 32, 10, 6)
    vid_short = encode_fake_video(32, 32, 10, 1)
    return [
        (1, img_a),  # image cluster A (3 copies -> 2 dups removed)
        (2, img_a),
        (3, img_a),
        (4, img_b),  # distinct image, kept
        (5, encode_fake_image(1, 8, 1, b"xx")),  # w<2: pixel decode fails
        (6, silent),  # gated: silence_frac 1.0
        (7, clipped),  # gated: clipped_frac 1.0
        (8, normal),  # kept
        (9, vid_ok),  # kept
        (10, vid_short),  # gated: n_frames < 2
        (11, b"garbage-bytes"),  # undecodable container
    ]


def test_multimodal_report_fixture_exercises_every_path(spark):
    df = spark.createDataFrame(_fixture_assets(), "doc_id long, asset binary")
    rows = {
        r["modality"]: r
        for r in multimodal_curation_report(
            df, max_silence=0.8, max_clipped=0.05, min_frames=2
        ).collect()
    }
    img = rows["image"]
    assert (
        img["n_assets"],
        img["n_undecodable"],
        img["n_gated"],
        img["n_dup_removed"],
        img["n_kept"],
    ) == (5, 1, 0, 2, 2)
    aud = rows["audio"]
    assert (
        aud["n_assets"],
        aud["n_undecodable"],
        aud["n_gated"],
        aud["n_dup_removed"],
        aud["n_kept"],
    ) == (3, 0, 2, 0, 1)
    vid = rows["video"]
    assert (
        vid["n_assets"],
        vid["n_undecodable"],
        vid["n_gated"],
        vid["n_dup_removed"],
        vid["n_kept"],
    ) == (2, 0, 1, 0, 1)
    und = rows["undecodable"]
    assert (und["n_assets"], und["n_undecodable"], und["n_kept"]) == (1, 1, 0)


def test_multimodal_report_matches_standalone_operators(spark):
    # the capstone is a composition, not new math: its image cluster
    # arithmetic must agree with image_dhash_dedup run standalone, and its
    # audio gate with with_audio_features' columns
    from duckdb_cloudflare_spark.operators.multimodal import (
        image_dhash_dedup,
        with_audio_features,
    )

    assets = _fixture_assets()
    df = spark.createDataFrame(assets, "doc_id long, asset binary")
    img_ids = {1, 2, 3, 4}  # decodable images only
    imgs = df.filter(F.col("doc_id").isin(*img_ids))
    clusters = image_dhash_dedup(imgs).collect()
    dup_removed = sum(r["cluster_size"] - 1 for r in clusters)
    kept = len(clusters)
    rep = {
        r["modality"]: r
        for r in multimodal_curation_report(
            df, max_silence=0.8, max_clipped=0.05, min_frames=2
        ).collect()
    }
    assert rep["image"]["n_dup_removed"] == dup_removed == 2
    assert rep["image"]["n_kept"] == kept == 2
    auds = df.filter(F.col("doc_id").isin(6, 7, 8))
    feats = {r["doc_id"]: r for r in with_audio_features(auds).collect()}
    gated = sum(
        1
        for r in feats.values()
        if r["silence_frac"] > 0.8 or r["clipped_frac"] > 0.05
    )
    assert rep["audio"]["n_gated"] == gated == 2


def test_multimodal_report_reconciles_on_testdata(spark):
    from duckdb_cloudflare_spark.queries import all_queries

    pdf = (
        all_queries()["p112_multimodal_curation"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("modality")
    )
    # every modality reconciles exactly: nothing double-counted or lost
    for _, r in pdf.iterrows():
        assert (
            r["n_assets"]
            == r["n_undecodable"] + r["n_gated"] + r["n_dup_removed"] + r["n_kept"]
        )
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert int(pdf["n_assets"].sum()) == n_docs
    assert {"image", "audio", "video"} <= set(pdf.index)


def test_multimodal_report_single_decode_plan(spark):
    # THE reason multimodal_profile exists: over a binary asset column the
    # whole gate->dedup->report pipeline must contain exactly ONE Python
    # stage (the decode); branching per modality would decode 3x (no
    # ReuseExchange in this build)
    from duckdb_cloudflare_spark.plans.introspect import formatted_plan

    import re

    df = spark.createDataFrame(_fixture_assets(), "doc_id long, asset binary")
    plan = formatted_plan(multimodal_curation_report(df))
    # count physical NODES (formatted mode prints each node in the tree
    # AND in the numbered details section — match the detail headers)
    n_python = len(
        re.findall(
            r"^\(\d+\) (?:MapInPandas|ArrowEvalPython|BatchEvalPython)",
            plan,
            re.MULTILINE,
        )
    )
    assert n_python == 1, plan


def test_multimodal_profile_modality_dispatch(spark):
    df = spark.createDataFrame(_fixture_assets(), "doc_id long, asset binary")
    rows = {r["doc_id"]: r for r in multimodal_profile(df).collect()}
    assert rows[1]["modality"] == "image" and rows[1]["dhash"] is not None
    assert rows[1]["dhash"] == rows[2]["dhash"] == rows[3]["dhash"]
    assert rows[5]["modality"] == "image" and rows[5]["dhash"] is None
    assert rows[6]["modality"] == "audio" and rows[6]["silence_frac"] == 1.0
    assert rows[7]["clipped_frac"] == 1.0
    assert rows[9]["modality"] == "video" and rows[9]["n_frames"] == 6
    assert rows[11]["modality"] == "undecodable"
    # features stay NULL outside their modality (union-schema contract)
    assert rows[1]["silence_frac"] is None and rows[6]["dhash"] is None


# ---------------------------------------------------------------------------
# q61 — observed-hours window contract (VERDICT r12 item 5)
# ---------------------------------------------------------------------------


def test_q61_trailing_window_is_observed_hours_not_calendar(spark):
    """q61's ROWS-24 frame runs over OBSERVED hours (hours with zero
    events are absent from the hourly fold), so the trailing baseline
    spans quiet gaps — 'the last 24 hours WITH traffic'. This fixture
    pins that contract: a spike after a 10-hour silent gap is scored
    against the 24 observed pre-gap hours (calendar semantics would see
    an under-filled window and emit nothing). The oracle mirrors the
    shape, so cross-engine parity never depended on this choice; the
    streaming twin (anomaly_stream) closes hours by arrival and holds
    the same observed-hours contract."""
    import datetime as dt

    import duckdb_cloudflare_spark.queries as Qm
    from duckdb_cloudflare_spark.queries import all_queries

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    counts = {}
    for h in range(24):  # jittered baseline: var > 0
        counts[h] = 11 if h % 2 else 10
    counts[34] = 300  # spike AFTER a 10-hour silent gap (hours 24..33)
    for h, n in counts.items():
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=h, seconds=i), 7, "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    key = "/t-q61-gap/events"
    Qm._TABLE_CACHE[key] = df
    try:
        out = all_queries()["q61_event_anomaly"](spark, "/t-q61-gap").collect()
    finally:
        Qm._TABLE_CACHE.pop(key, None)
    assert len(out) == 1
    r = out[0]
    assert r["hour"] == base + dt.timedelta(hours=34)
    # the baseline is exactly the 24 observed pre-gap hours
    assert r["trailing_mean"] == sum(counts[h] for h in range(24)) / 24.0
    assert r["n"] == 300


# ---------------------------------------------------------------------------
# p113 — BPE tokenization with the learned merges
# ---------------------------------------------------------------------------


def _apply_merges(word, merges):
    syms = list(word)
    for _, lhs, rhs, merged, _ in merges:
        ns, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                ns.append(merged)
                i += 2
            else:
                ns.append(syms[i])
                i += 1
        syms = ns
    return syms


def test_bpe_token_counts_matches_python_reference(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import bpe_token_counts

    texts = [
        "low low low lower lowest newer newest new",
        "wider wide widest low newer er er",
        "banana bandana ananas",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe_token_counts(df, n_merges=4, top_n=20).collect()]
    wf = _word_freqs(texts)
    merges = bpe_train_reference(wf, 4)
    counts = {}
    for w, f in wf.items():
        for t in _apply_merges(w, merges):
            counts[t] = counts.get(t, 0) + f
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want
    # the learned merges actually appear as corpus tokens
    merged_syms = {m[3] for m in merges}
    assert merged_syms & {t for t, _ in got}


def test_bpe_token_counts_tokens_are_consistent_with_trainer(spark):
    # every multi-character token the tokenizer emits must be derivable
    # from the trainer's merge table (a token is a chain of merges)
    from duckdb_cloudflare_spark.operators.text_analysis import (
        bpe_token_counts,
        bpe_train,
    )

    df = spark.createDataFrame(
        [("low low low lower lowest newer newest new",)], "text string"
    )
    merges = {r["merged"] for r in bpe_train(df, n_merges=4).collect()}
    tokens = {r["token"] for r in bpe_token_counts(df, n_merges=4, top_n=50).collect()}
    for t in tokens:
        if len(t) > 1:
            assert t in merges, t


def test_bpe_token_counts_plan_is_pure_jvm(spark):
    from duckdb_cloudflare_spark.plans.introspect import formatted_plan

    from duckdb_cloudflare_spark.operators.text_analysis import bpe_token_counts

    df = spark.createDataFrame([("low lower",)], "text string")
    plan = formatted_plan(bpe_token_counts(df, n_merges=2))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "SortMergeJoin" not in plan


def test_bpe_token_counts_rejects_bad_n_merges(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import bpe_token_counts

    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError, match="n_merges >= 1"):
        bpe_token_counts(df, n_merges=0)
