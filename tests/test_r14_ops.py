"""r14 operator tests: product quantization (p120/p121) against a
pure-Python reference (incl. the empty-cluster carry-over path and the
k>n guard), script_profile fixtures (p122), and interleave_order
determinism/proportionality (p123). The SIMILAR TO / GROUPS dialect
surfaces (q68/q69) are pinned in test_compat.py; oracle parity for all
six runs in test_oracle_parity.py."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# p120/p121 — product quantization
# ---------------------------------------------------------------------------


def _h32(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def _pq_reference(vecs: dict[int, list[float]], m, sub_dims, k, n_iters):
    """Pure-Python PQ with the operator's exact rules: micro-int
    canonicalization, md5-order seeds, (dist, cid) ties, floor(sum/n)
    means, empty clusters carry the previous centroid."""
    xm = {
        vid: [int(_half_up(x * 1e6)) for x in v] for vid, v in vecs.items()
    }
    order = sorted(xm, key=lambda vid: (_h32(vid), vid))
    code = {
        (s, cid): xm[order[cid]][s * sub_dims:(s + 1) * sub_dims]
        for cid in range(k)
        for s in range(m)
    }
    assign = {}
    for _ in range(n_iters):
        assign = {}
        for vid, v in xm.items():
            for s in range(m):
                sub = v[s * sub_dims:(s + 1) * sub_dims]
                best = min(
                    (
                        (
                            sum((a - b) * (a - b) for a, b in zip(sub, code[(s, c)])),
                            c,
                        )
                        for c in range(k)
                    )
                )
                assign[(vid, s)] = best
        new_code = dict(code)
        for s in range(m):
            for c in range(k):
                members = [
                    vid for (vid, ss), (_, cc) in assign.items()
                    if ss == s and cc == c
                ]
                if not members:
                    continue
                sub = [
                    [xm[vid][s * sub_dims + j] for vid in members]
                    for j in range(sub_dims)
                ]
                new_code[(s, c)] = [
                    math.floor(sum(col) / len(col)) for col in sub
                ]
        code = new_code
    final = {}
    for vid, v in xm.items():
        for s in range(m):
            sub = v[s * sub_dims:(s + 1) * sub_dims]
            final[(vid, s)] = min(
                (
                    (
                        sum((a - b) * (a - b) for a, b in zip(sub, code[(s, c)])),
                        c,
                    )
                    for c in range(k)
                )
            )
    return code, final


def _half_up(x: float) -> int:
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def test_pq_train_matches_python_reference(spark, sf_dir):
    from duckdb_cloudflare_spark.operators.similarity import pq_assign, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(40)
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    # python reference canonicalizes via Spark's round-half-up on the
    # DOUBLE value — mirror by recomputing micro ints the same way the
    # operator's F.round does (bankers? no: Spark round = HALF_UP)
    code, final = _pq_reference(vecs, m=4, sub_dims=16, k=8, n_iters=2)
    got_code = {
        (r["subspace"], r["cid"]): True
        for r in pq_train(emb, m=4, sub_dims=16, k=8, n_iters=2).collect()
    }
    got = {}
    for r in pq_train(emb, m=4, sub_dims=16, k=8, n_iters=2).collect():
        got.setdefault((r["subspace"], r["cid"]), {})[r["j"]] = r["c_micro"]
    assert set(got) == set(code)
    for key in code:
        want = code[key]
        have = [got[key][j] for j in range(16)]
        assert have == want, key
    ga = {
        (r["vec_id"], r["subspace"]): (r["sq_err_micro2"], r["cid"])
        for r in pq_assign(emb, m=4, sub_dims=16, k=8, n_iters=2).collect()
    }
    assert ga == final
    assert len(got_code) == 32


def test_pq_empty_cluster_carries_seed_centroid(spark):
    from duckdb_cloudflare_spark.operators.similarity import pq_train

    # two smallest-md5 ids get IDENTICAL vectors -> centroids 0 and 1
    # coincide -> every vector ties to cid 0 -> cluster 1 is EMPTY in
    # iteration 1 and must carry its seed centroid through training
    ids = list(range(1, 7))
    order = sorted(ids, key=lambda i: (_h32(i), i))
    dup_a, dup_b = order[0], order[1]
    vecs = {}
    for i in ids:
        if i in (dup_a, dup_b):
            vecs[i] = [5.0] * 4
        else:
            vecs[i] = [float(i % 3)] * 4
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    out = pq_train(df, m=1, sub_dims=4, k=2, n_iters=2)
    rows = {(r["cid"], r["j"]): r["c_micro"] for r in out.collect()}
    # cluster 1's centroid is exactly the (duplicated) seed vector
    for j in range(4):
        assert rows[(1, j)] == 5_000_000
    code, _ = _pq_reference(vecs, m=1, sub_dims=4, k=2, n_iters=2)
    for (s, c), want in code.items():
        assert [rows[(c, j)] for j in range(4)] == want


def test_pq_k_larger_than_corpus_loud_error(spark):
    from duckdb_cloudflare_spark.operators.similarity import pq_train

    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0] * 4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="at least k="):
        pq_train(df, m=1, sub_dims=4, k=8, n_iters=1)


def test_pq_null_element_vectors_dropped(spark):
    """A NULL element inside a right-sized vector passed the size gate
    but crashed np.asarray(..., int64) in the assign UDF with an opaque
    executor error (r15 advice fix): such rows are dropped at the base,
    like wrong-length vectors, and training matches the clean corpus."""
    from duckdb_cloudflare_spark.operators.similarity import pq_assign, pq_train

    clean = [(i, [float(i % 3) + j * 0.25 for j in range(4)]) for i in range(1, 7)]
    dirty = clean + [(90, [1.0, None, 3.0, 4.0]), (91, [None] * 4)]
    schema = "vec_id long, embedding array<double>"
    df_clean = spark.createDataFrame(clean, schema)
    df_dirty = spark.createDataFrame(dirty, schema)
    want = sorted(
        tuple(r) for r in pq_train(df_clean, m=1, sub_dims=4, k=2,
                                   n_iters=2).collect()
    )
    got = sorted(
        tuple(r) for r in pq_train(df_dirty, m=1, sub_dims=4, k=2,
                                   n_iters=2).collect()
    )
    assert got == want
    enc = pq_assign(df_dirty, m=1, sub_dims=4, k=2, n_iters=2)
    ids = sorted(r["vec_id"] for r in enc.collect())
    assert ids == [i for i, _ in clean]


# ---------------------------------------------------------------------------
# p122 — script profile
# ---------------------------------------------------------------------------


def test_script_profile_fixture(spark):
    from duckdb_cloudflare_spark.operators.text_analysis import script_profile

    rows = [
        (1, "abc 12 #", "s1"),       # 3 latin, 2 digit, 2 ws, 1 other (8)
        (2, "Hello", "s1"),           # 5 latin
        (3, "你好 ok", "s2"),          # 2 other, 1 ws, 2 latin
        (4, None, "s2"),              # NULL text excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in script_profile(df).collect()}
    s1 = got["s1"]
    assert s1["n_docs"] == 2
    assert s1["latin_chars"] == 8
    assert s1["digit_chars"] == 2
    assert s1["ws_chars"] == 2
    assert s1["other_chars"] == 1
    assert s1["latin_ratio"] == 8.0 / 13.0
    s2 = got["s2"]
    assert s2["n_docs"] == 1
    assert (s2["latin_chars"], s2["digit_chars"], s2["ws_chars"],
            s2["other_chars"]) == (2, 0, 1, 2)


# ---------------------------------------------------------------------------
# p123 — weighted interleave order
# ---------------------------------------------------------------------------


def test_interleave_order_matches_python_reference(spark):
    from duckdb_cloudflare_spark.operators.curation import interleave_order

    rows = [(i, "big" if i % 5 else "small") for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    n = {"big": sum(1 for _, s in rows if s == "big"),
         "small": sum(1 for _, s in rows if s == "small")}
    min_w = min(math.sqrt(v) for v in n.values())
    want = sorted(
        (
            ((_h32(i) / 4294967296.0) / (min_w / math.sqrt(n[s])), i, s)
            for i, s in rows
        )
    )[:30]
    got = [
        (r["prio"], r["doc_id"], r["source"], r["pos"])
        for r in interleave_order(df, top_n=30)
        .orderBy("pos")
        .collect()
    ]
    assert [g[3] for g in got] == list(range(1, 31))
    for (wp, wi, ws), (gp, gi, gs, _) in zip(want, got):
        assert (wi, ws) == (gi, gs)
        assert gp == wp  # bit-identical: exact-int divisions + IEEE sqrt

    # determinism across runs
    again = [
        tuple(r) for r in interleave_order(df, top_n=30).orderBy("pos").collect()
    ]
    assert again == [
        tuple(r) for r in interleave_order(df, top_n=30).orderBy("pos").collect()
    ]


def test_interleave_flattens_dominant_source(spark):
    # 'big' has 9x the docs of 'small'; sqrt flattening must give
    # 'small' MORE than its raw 10% share in the top prefix
    rows = [(i, "big") for i in range(1, 901)] + [
        (i, "small") for i in range(1001, 1101)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    from duckdb_cloudflare_spark.operators.curation import interleave_order

    top = interleave_order(df, top_n=300).collect()
    small_share = sum(1 for r in top if r["source"] == "small") / 300.0
    assert small_share > 0.15  # raw share would be ~0.10; sqrt lifts it
    assert small_share < 0.50
