"""Unit pins for the deterministic-sketch operators (p77–p80): Bloom
membership semantics, Count-Min guarantees, HyperLogLog accuracy, and
weighted priority sampling. Cross-engine value parity is covered by the
driver-replica gate; these pin the sketch GUARANTEES (no false negatives,
overestimate-only, bounded relative error, weight-proportional inclusion)
on data built to exercise them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bloom_no_false_negatives_and_deterministic_fps(spark):
    from duckdb_cloudflare_spark.operators.sketches import bloom_probe

    items = spark.createDataFrame(
        [(i, f"value-{i}") for i in range(2000)], "id long, v string"
    )
    members = items.filter(F.col("id") % 7 == 0)
    out = {r["id"]: r["flagged"] for r in
           bloom_probe(items, members, "v", "v", "id").collect()}
    assert len(out) == 2000
    # NO false negatives: every member flags
    assert all(out[i] for i in range(0, 2000, 7))
    # false positives exist in principle but must be rare at k=3, m=2^18,
    # |members|=286 (expected FP rate ~ (3*286/262144)^3 ≈ 3.5e-8)
    fps = [i for i in range(2000) if i % 7 != 0 and out[i]]
    assert len(fps) == 0
    # determinism: a second run flags the identical set
    out2 = {r["id"]: r["flagged"] for r in
            bloom_probe(items, members, "v", "v", "id").collect()}
    assert out == out2


def test_countmin_never_underestimates_and_is_tight_when_sparse(spark):
    from duckdb_cloudflare_spark.operators.sketches import countmin_estimates

    # 3000 instances over 60 distinct tokens, zipf-ish
    rows = []
    for t in range(60):
        rows += [(f"tok{t}",)] * (60 - t)
    inst = spark.createDataFrame(rows, "tok string")
    exact = {r["tok"]: r["n"] for r in
             inst.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {r["tok"]: r["est"] for r in countmin_estimates(inst, "tok").collect()}
    assert set(est) == set(exact)
    for tok, n in exact.items():
        assert est[tok] >= n  # CM never underestimates
    # 60 tokens into 4×1024 cells: collisions are unlikely → exact
    assert est == exact


def test_hll_relative_error_within_bound(spark):
    from duckdb_cloudflare_spark.operators.sketches import hll_estimate

    # 20k distinct values, each appearing 1–3 times: true distinct = 20000;
    # HLL with m=1024 has σ ≈ 1.04/√1024 ≈ 3.25% — assert within 4σ
    rows = [(f"v{i}",) for i in range(20000)] + [(f"v{i}",) for i in range(0, 20000, 2)]
    df = spark.createDataFrame(rows, "v string")
    est = hll_estimate(df, "v").first()["hll_estimate"]
    assert abs(est - 20000) / 20000 < 0.13, est


def test_hll_small_range_uses_linear_counting(spark):
    from duckdb_cloudflare_spark.operators.sketches import hll_estimate

    df = spark.createDataFrame([(f"x{i}",) for i in range(50)], "v string")
    row = hll_estimate(df, "v").first()
    # 50 distinct into 1024 buckets: well inside the linear-counting regime,
    # where the estimate is typically exact-ish
    assert abs(row["hll_estimate"] - 50) < 5
    assert row["n_buckets_used"] <= 50


def test_hll_estimate_ignores_null_values(spark):
    """NULL values are excluded up front (r11 advice): a NULL used to hash
    to a NULL-bucket register row that the count(M) fold silently dropped
    while a count(*)-style oracle counted — the convention is now explicit
    (matching count(DISTINCT)'s NULL handling), so estimates and bucket
    counts are identical with or without NULL rows."""
    from duckdb_cloudflare_spark.operators.sketches import hll_estimate

    clean = spark.createDataFrame([(f"x{i}",) for i in range(200)], "v string")
    dirty = clean.unionAll(
        spark.createDataFrame([(None,)] * 7, "v string")
    )
    a = hll_estimate(clean, "v").first()
    b = hll_estimate(dirty, "v").first()
    assert a["hll_estimate"] == b["hll_estimate"]
    assert a["n_buckets_used"] == b["n_buckets_used"]


def test_priority_sample_prefers_heavy_weights(spark):
    from duckdb_cloudflare_spark.operators.sketches import priority_sample

    # 100 heavy rows (w=1000) vs 900 light rows (w=1): a k=50 sample must be
    # dominated by heavy rows (each heavy item's inclusion odds are ~1000×)
    rows = [(i, 1000) for i in range(100)] + [(i, 1) for i in range(100, 1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = priority_sample(df, "id", "w", k=50).collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r["id"] < 100)
    assert heavy >= 45, heavy
    # deterministic: identical second run
    again = priority_sample(df, "id", "w", k=50).collect()
    assert [r["id"] for r in got] == [r["id"] for r in again]
    # zero/negative weights excluded
    df2 = spark.createDataFrame([(1, 0), (2, -3), (3, 10)], "id long, w long")
    assert [r["id"] for r in priority_sample(df2, "id", "w", k=5).collect()] == [3]


def test_pagerank_matches_numpy_power_iteration(spark):
    # hand-built asymmetric graph, checked against a dense numpy reference
    import numpy as np

    from duckdb_cloudflare_spark.operators.graph import pagerank

    edges = [(0, 1, 1.0), (0, 2, 2.0), (1, 2, 1.0), (2, 0, 1.0), (3, 2, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}

    n, d = 4, 0.85
    r = np.full(n, round(1 / n, 9))
    frac = np.zeros((n, n))
    outw = {0: 3.0, 1: 1.0, 2: 1.0, 3: 1.0}
    for s, t, w in edges:
        frac[s][t] = w / outw[s]
    for _ in range(3):
        r = np.round((1 - d) / n + d * (r @ frac), 9)
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-9), (v, got[v], r[v])
    # node 3 has no inbound edges: pure teleport mass
    assert got[3] == pytest.approx((1 - d) / n, abs=1e-9)


def test_pagerank_dangling_and_empty(spark):
    from duckdb_cloudflare_spark.operators.graph import pagerank

    # dangling node 9 (appears only as dst): still ranked, mass leaks to
    # teleport as documented
    df = spark.createDataFrame([(1, 9, 1.0)], "src long, dst long, w double")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=2).collect()}
    assert set(got) == {1, 9}
    assert got[9] > got[1]  # 9 receives 1's full mass each round
    empty = spark.createDataFrame([], "src long, dst long, w double")
    assert pagerank(empty).count() == 0


def test_hll_high_cardinality_cross_engine_parity(spark):
    """ADVICE r8 (high): the p79 oracle's register-fold divisor was wrong
    (2^61 instead of 2^51) but masked because every tested group sat in the
    linear-counting regime (<= ~155 distinct tokens). This pins the RAW
    HLL branch (>2560 distinct per group, past the 2.5m small-range
    threshold) bit-for-bit against a DuckDB twin of the p79 oracle
    skeleton — the branch the driver data never reaches."""
    import duckdb
    import pandas as pd

    from duckdb_cloudflare_spark.operators.sketches import hll_estimate

    pdf = pd.DataFrame(
        {
            "g": [f"g{i % 2}" for i in range(12000)],
            "v": [f"val-{i}" for i in range(12000)],  # 6000 distinct/group
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = {
        r["g"]: (r["hll_estimate"], r["n_buckets_used"])
        for r in hll_estimate(sdf, "v", group_cols=["g"]).collect()
    }

    con = duckdb.connect()
    con.register("t", pdf)
    alpha_mm = 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            WITH h AS (
                SELECT g, ('0x' || substr(md5('hll:' || v), 1, 15))::BIGINT AS hv
                FROM t
            ), regs AS (
                SELECT g, hv >> 50 AS b,
                       max(CASE WHEN (hv & ((1::BIGINT << 50) - 1)) = 0 THEN 51
                           ELSE 50 - length(bin(hv & ((1::BIGINT << 50) - 1))) + 1
                           END) AS M
                FROM h GROUP BY g, b
            ), agg AS (
                SELECT g, sum((1::BIGINT) << (51 - M)) AS s_star,
                       count(*) AS used
                FROM regs GROUP BY g
            ), est AS (
                SELECT g, used,
                       {alpha_mm!r} /
                       (s_star::DOUBLE / 2251799813685248.0 + (1024 - used))
                           AS raw
                FROM agg
            )
            SELECT g,
                   round(CASE WHEN raw <= 2560.0 AND used < 1024
                              THEN 1024.0 * ln(1024.0 / (1024 - used))
                              ELSE raw END, 4) AS hll_estimate,
                   CAST(used AS INTEGER) AS used
            FROM est
            """
        ).fetchall()
    }
    con.close()
    assert set(got) == {"g0", "g1"}
    # every group must be PAST linear counting (the raw branch fires)
    for g, (est, used) in got.items():
        assert est > 2560.0, (g, est)
        assert got[g] == want[g], (g, got[g], want[g])
        # and the estimate is sane: 6000 +/- 4 sigma (sigma ~ 3.25%)
        assert abs(est - 6000) / 6000 < 0.13, (g, est)
