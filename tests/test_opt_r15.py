"""r15 optimization-round pins: the reshaped internals must be
row-identical to the pre-optimization semantics.

- bpe_train / bpe_token_counts: driver-side 1-row argmax collect +
  literal codegen replace (was: 1-row broadcast crossJoin whose lineage
  re-ran the corpus fold per iteration). Exhaustion path pinned: a step
  with no remaining pairs ends the trajectory (bpe_train keeps the rows
  so far; bpe_token_counts returns the EMPTY token table — the old
  crossJoin-with-empty-best emptied the vocab).
- bpe_pair_counts: pair expansion through a codegen Generate + substring
  projection (was: interpreted transform lambda). In-word duplicate
  pairs must still count once per occurrence.
- jl_project: Arrow int64 matmul kernel (was: interpreted HOF folds).
  NULL vectors must still emit K rows with y NULL; NULL elements and
  short vectors contribute 0 terms exactly as the old coalesce fold.
"""

from __future__ import annotations

import pytest

from duckdb_cloudflare_spark.operators.text_analysis import (
    bpe_pair_counts,
    bpe_token_counts,
    bpe_train,
    bpe_train_reference,
)


def _word_freqs(texts):
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            if len(w) >= 2:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def test_bpe_train_exhaustion_stops_like_old_crossjoin(spark):
    # "ab" supports exactly one merge; asking for 4 must yield 1 row
    # (the old empty-broadcast chain produced no further rows)
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=4).collect()]
    assert got == [(1, "a", "b", "ab", 3)]


def test_bpe_train_empty_corpus_yields_empty_merge_table(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = bpe_train(df, n_merges=2)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "merge_rank", "lhs", "rhs", "merged", "pair_count",
    ]


def test_bpe_train_still_matches_reference_after_reshape(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest",
        "widest widest widest new news",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(df, n_merges=6).collect()]
    want = bpe_train_reference(_word_freqs(texts), 6)
    assert got == want


def test_bpe_token_counts_exhaustion_returns_empty_like_old_chain(spark):
    # one merge possible; n_merges=3 exhausts -> the old crossJoin chain
    # emptied the encoded vocab and the token fold returned ZERO rows
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    assert bpe_token_counts(df, n_merges=3).collect() == []


def test_bpe_token_counts_values_unchanged(spark):
    texts = ["aaab aaab abab", "abab abab aaab aa"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {(r["token"], r["token_count"])
           for r in bpe_token_counts(df, n_merges=2).collect()}
    # reproduce with the python reference trainer + greedy re-tokenize
    merges = bpe_train_reference(_word_freqs(texts), 2)
    vocab = _word_freqs(texts)
    counts: dict[str, int] = {}
    for w, f in vocab.items():
        syms = list(w)
        for _, lhs, rhs, merged, _c in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        for s in syms:
            counts[s] = counts.get(s, 0) + f
    assert got == set(counts.items())


def test_bpe_pair_counts_duplicate_pairs_in_word_counted_per_position(spark):
    # "aaa" contributes pair "aa" TWICE per occurrence (positions 1 and 2)
    df = spark.createDataFrame(
        [(1, "aaa aaa ba")], "doc_id long, text string"
    )
    got = {(r["pair"], r["pair_count"]) for r in bpe_pair_counts(df).collect()}
    assert got == {("aa", 4), ("ba", 1)}


def test_jl_project_null_vector_emits_k_null_rows(spark):
    from duckdb_cloudflare_spark.operators.similarity import jl_project

    df = spark.createDataFrame(
        [(1, None), (2, [0.5] * 64)],
        "vec_id long, embedding array<double>",
    )
    rows = jl_project(df).collect()
    by_id: dict[int, dict[int, object]] = {}
    for r in rows:
        by_id.setdefault(r["vec_id"], {})[r["k"]] = r["y"]
    # the NULL vector still yields all 16 coordinates, each NULL (the old
    # F.array-of-NULL-folds shape, relied on by the dirty-data sweeps)
    assert set(by_id[1]) == set(range(16))
    assert all(v is None for v in by_id[1].values())
    assert all(v is not None for v in by_id[2].values())


def test_jl_project_null_elements_contribute_zero(spark):
    import hashlib
    import math

    from duckdb_cloudflare_spark.operators.similarity import jl_project

    vec = [1.0 if j % 2 == 0 else None for j in range(64)]
    df = spark.createDataFrame(
        [(7, vec)], "vec_id long, embedding array<double>"
    )
    got = {r["k"]: r["y"] for r in jl_project(df).collect()}
    for k in range(16):
        acc = 0
        for j in range(64):
            if vec[j] is None:
                continue
            h = int(hashlib.md5(f"{k}_{j}".encode()).hexdigest()[:8], 16)
            acc += (1 if h % 2 == 0 else -1) * 1_000_000
        want = acc / 1e6 / math.sqrt(16.0)
        assert abs(got[k] - want) < 1e-12, k


@pytest.mark.parametrize("n_merges", [1, 3])
def test_bpe_train_checkpoint_mode_still_identical(spark, n_merges):
    texts = ["foo bar foo baz", "bar bar foo"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pure = [tuple(r) for r in bpe_train(df, n_merges=n_merges).collect()]
    ck = [
        tuple(r)
        for r in bpe_train(df, n_merges=n_merges, checkpoint_every=1).collect()
    ]
    assert pure == ck == bpe_train_reference(_word_freqs(texts), n_merges)
