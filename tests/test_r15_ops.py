"""r15 operator tests: PQ ADC top-k (p124) — the serving-side query path
closing the p120/p121 family. Cross-engine exactness is covered by the
oracle-parity gate (the CTE-chain oracle in queries/pipeline_r15.py);
these pin the SEARCH QUALITY against the exact anchor and the bounded
contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _exact_l2_topk(vecs: dict[int, list[float]], qids: list[int], k: int):
    """Ground truth: exact micro-int squared-L2 top-k (the metric ADC
    approximates), self excluded, ties on neighbor id."""
    ids = sorted(vecs)
    M = {i: np.round(np.asarray(vecs[i], dtype=np.float64) * 1e6).astype(np.int64)
         for i in ids}
    out = {}
    for q in qids:
        d = sorted(
            (int(((M[i] - M[q]) ** 2).sum()), i) for i in ids if i != q
        )
        out[q] = [i for _, i in d[:k]]
    return out


@pytest.fixture(scope="module")
def emb_rows(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = (
        df.filter(F.col("vec_id").isNotNull())
        .filter(F.size("embedding") == 64)
        .collect()
    )
    return {int(r["vec_id"]): list(r["embedding"]) for r in rows}


def test_pq_topk_recall_against_exact_anchor(spark, emb_rows):
    """ADC is lossy BY DESIGN — the pin is that recall@10 against exact
    micro-int L2 (the p05-class anchor) (a) beats chance at every
    bitrate and (b) rises MONOTONICALLY with code size, which is the
    property a broken LUT gather / transposed codebook destroys while
    centroid jitter does not. On these synthetic (near-iid) embeddings
    the measured curve is 12 bits → 0.05, 32 → 0.175, 80 → 0.525
    (chance = k/N = 10/500 = 0.02); real clustered embeddings sit far
    higher at every point, but the ORDERING is data-independent."""
    from duckdb_cloudflare_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = sorted(emb_rows)[:4]
    queries = emb.filter(F.col("vec_id").isin([int(q) for q in qids]))
    exact = _exact_l2_topk(emb_rows, qids, k=10)
    curve = []
    for m, sub_dims, kc in [(4, 16, 8), (8, 8, 16), (16, 4, 32)]:
        got = pq_topk(emb, queries, k=10, m=m, sub_dims=sub_dims, kc=kc,
                      n_iters=2)
        by_q: dict[int, list[int]] = {}
        ranks: dict[int, list[int]] = {}
        for r in got.collect():
            by_q.setdefault(int(r["query_id"]), []).append(int(r["neighbor_id"]))
            ranks.setdefault(int(r["query_id"]), []).append(int(r["nn_rank"]))
        assert sorted(by_q) == sorted(exact)
        # ranks are dense 1..10 per query
        assert all(sorted(v) == list(range(1, 11)) for v in ranks.values())
        curve.append(sum(len(set(by_q[q]) & set(exact[q])) / 10
                         for q in qids) / len(qids))
    chance = 10 / len(emb_rows)
    assert all(r >= 2 * chance for r in curve), (curve, chance)
    assert curve[0] < curve[1] < curve[2], curve  # recall rises with bits
    assert curve[2] >= 0.4, curve  # 80-bit codes must be genuinely good


def test_pq_topk_empty_and_bounded_contracts(spark):
    from duckdb_cloudflare_spark.operators.similarity import pq_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = pq_topk(empty, empty, k=5, m=1, sub_dims=4, kc=2, n_iters=1)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "adc_dist_micro2", "nn_rank"
    ]
    # oversized query side fails loudly, not with a driver OOM
    corpus = spark.createDataFrame(
        [(i, [float(i % 5)] * 4) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    import os
    os.environ["SPARK_GRAFT_BRUTE_MAX_QUERIES"] = "3"
    try:
        with pytest.raises(ValueError, match="queries side exceeds"):
            pq_topk(corpus, corpus, k=5, m=1, sub_dims=4, kc=2, n_iters=1)
    finally:
        del os.environ["SPARK_GRAFT_BRUTE_MAX_QUERIES"]


def test_pq_rerank_recovers_recall(spark, emb_rows):
    """The two-stage pattern's whole point: exact re-rank of the ADC
    top-R shortlist lifts recall@10 far above the raw 12-bit scan
    (measured 0.05 → 0.325 with R=50 on these near-iid synthetic
    embeddings — bounded by P(true top-10 ⊂ ADC top-50)), and the
    re-ranked distances are EXACTLY the true L2 for every returned
    neighbor (stage 2 is exact by construction — only the candidate SET
    is approximate)."""
    from duckdb_cloudflare_spark.operators.similarity import (
        pq_rerank_topk, pq_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = sorted(emb_rows)[:4]
    queries = emb.filter(F.col("vec_id").isin([int(q) for q in qids]))
    exact = _exact_l2_topk(emb_rows, qids, k=10)
    M = {
        i: np.round(np.asarray(emb_rows[i], np.float64) * 1e6).astype(np.int64)
        for i in emb_rows
    }

    def recall(df):
        by_q: dict[int, list[int]] = {}
        for r in df.collect():
            by_q.setdefault(int(r["query_id"]), []).append(int(r["neighbor_id"]))
        return sum(
            len(set(by_q[q]) & set(exact[q])) / 10 for q in qids
        ) / len(qids)

    raw = recall(pq_topk(emb, queries, k=10))
    rer_df = pq_rerank_topk(emb, queries, k=10, shortlist=50)
    rer = recall(rer_df)
    assert rer >= raw + 0.15, (raw, rer)
    # every returned distance is the exact int64 L2
    for r in rer_df.collect():
        q, n = int(r["query_id"]), int(r["neighbor_id"])
        assert int(r["l2_dist_micro2"]) == int(((M[q] - M[n]) ** 2).sum())


def test_pq_rerank_empty_input(spark):
    from duckdb_cloudflare_spark.operators.similarity import pq_rerank_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = pq_rerank_topk(empty, empty, k=5, shortlist=8, m=1, sub_dims=4,
                         kc=2, n_iters=1)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "l2_dist_micro2", "nn_rank"
    ]


def test_ivfpq_recall_and_probe_consistency(spark, emb_rows):
    """IVF-PQ must (a) beat chance against the exact anchor, and (b) be
    internally consistent across probe settings: the cell structure,
    residual codes and per-(query, cell) LUTs do not depend on n_probe,
    so any (query, neighbor) pair surfaced by BOTH the 2-probe and the
    all-cells run must carry the IDENTICAL quantized distance, and the
    all-cells run must return a full k for every query (its candidate
    pool is the whole corpus). NOTE recall@10 is deliberately NOT
    asserted monotone in n_probe: on near-iid synthetic vectors, extra
    probed cells add candidates whose quantized distances are mostly
    noise, which can displace true neighbors — observed 0.075 (2-probe)
    vs 0.025 (8-probe) on this fixture; on clustered real embeddings
    the relationship flips. The pruning guarantee itself (a neighbor in
    an unprobed cell is structurally impossible) is graded end-to-end
    by the p126 oracle, whose cand CTE joins through the probed cells."""
    from duckdb_cloudflare_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = sorted(emb_rows)[:4]
    queries = emb.filter(F.col("vec_id").isin([int(q) for q in qids]))
    exact = _exact_l2_topk(emb_rows, qids, k=10)

    def collect(df):
        out = {}
        for r in df.collect():
            out[(int(r["query_id"]), int(r["neighbor_id"]))] = int(
                r["ivfpq_dist_micro2"]
            )
        return out

    probed = collect(ivfpq_topk(emb, queries, k=10, n_probe=2, n_cells=8))
    full = collect(ivfpq_topk(emb, queries, k=10, n_probe=8, n_cells=8))
    chance = 10 / len(emb_rows)
    r_probed = sum(
        len({n for q2, n in probed if q2 == q} & set(exact[q])) / 10
        for q in qids
    ) / len(qids)
    assert r_probed >= 2 * chance, (r_probed, chance)
    # all-cells pool = whole corpus: full k rows per query
    assert len(full) == 4 * 10
    # shared pairs carry identical quantized distances
    shared = set(probed) & set(full)
    assert shared, "probe settings share no pairs — fixture degenerated"
    assert all(probed[p] == full[p] for p in shared)


def test_ivfpq_empty_input(spark):
    from duckdb_cloudflare_spark.operators.similarity import ivfpq_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = ivfpq_topk(empty, empty, k=5, n_probe=1, n_cells=2, m=1,
                     sub_dims=4, kc=2, n_iters=1)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "ivfpq_dist_micro2", "nn_rank"
    ]


def test_pq_family_dirty_embeddings_parity(spark, tmp_path):
    """The global dirty sweep leaves embeddings clean, so the PQ
    family's vector hygiene (the r15 advice fix: null-element vectors
    crashed the assign UDF) is swept HERE: append a null vec_id, a
    wrong-length vector, a null-element vector and an all-null vector,
    then hash-compare every PQ-family graded entry against its oracle
    on the dirtied table — both engines' base CTE/filter must drop the
    same rows."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq_

    src = pq_.read_table(f"{SF_DIR}/embeddings.parquet")
    emb_type = src.schema.field("embedding").type
    lbl = src.schema.field("label")
    extra = pa.table(
        {
            "vec_id": pa.array([None, 990001, 990002, 990003], pa.int64()),
            "embedding": pa.array(
                [
                    [0.5] * 64,               # null id
                    [0.25] * 16,              # wrong length
                    [0.5] * 30 + [None] + [0.5] * 33,  # null element
                    [None] * 64,              # all-null elements
                ],
                emb_type,
            ),
            "label": pa.array([None] * 4, lbl.type),
        }
    ).select(src.column_names).cast(src.schema)
    d = str(tmp_path / "dirty_emb")
    import os as _os
    _os.makedirs(d, exist_ok=True)
    pq_.write_table(pa.concat_tables([src, extra]), f"{d}/embeddings.parquet")

    from duckdb_cloudflare_spark import queries as Q

    all_q, all_o = Q.all_queries(), Q.all_oracles()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    for name in (
        "p120_pq_codebooks", "p121_pq_assign", "p124_pq_adc_topk",
        "p125_pq_rerank_topk", "p126_ivfpq_topk",
    ):
        sdf = all_q[name](spark, d).toPandas().sort_index(axis=1)
        ddf = con.sql(all_o[name]).df().sort_index(axis=1)
        s = sorted(map(tuple, sdf.itertuples(index=False)))
        dd = sorted(map(tuple, ddf.itertuples(index=False)))
        assert len(s) > 0, name
        assert s == dd, (name, s[:3], dd[:3])
