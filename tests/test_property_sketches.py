"""Hypothesis properties for the deterministic sketches (p77–p81): the
guarantees that must hold for ARBITRARY inputs, not just the fixtures —
Bloom never false-negative, Count-Min never underestimates, HLL bounded
error and permutation invariance, priority sampling scale-free.

Pure-Python reimplementations of the md5 hash math run the per-example
loops (hypothesis needs thousands of cheap evaluations; a Spark job per
example is minutes) — each property FIRST pins the Python twin against
the Spark operator on one batch, so the properties transfer."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _md5_int60(seed: str, v: str) -> int:
    return int(hashlib.md5((seed + v).encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# Python twins (pinned against Spark below)
# ---------------------------------------------------------------------------


def _bloom_positions(v: str, k: int = 3, m: int = 1 << 18) -> list[int]:
    return [_md5_int60(f"bloom{i}:", v) % m for i in range(k)]


def _hll_registers(values, log2m: int = 10) -> list[int]:
    m, rest_bits = 1 << log2m, 60 - log2m
    regs = [0] * m
    for v in values:
        h = _md5_int60("hll:", v)
        b, rest = h >> rest_bits, h & ((1 << rest_bits) - 1)
        rho = rest_bits + 1 if rest == 0 else rest_bits - rest.bit_length() + 1
        regs[b] = max(regs[b], rho)
    return regs


def test_python_twins_match_spark_once(spark):
    # one Spark batch pins the reimplementations the properties rely on
    from pyspark.sql import functions as F

    from duckdb_cloudflare_spark.operators.sketches import (
        bloom_positions,
        hll_estimate,
        hll_finalize,
    )

    vals = [f"w{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    spark_pos = df.select(bloom_positions(F.col("v")).alias("p")).collect()
    for r, v in zip(spark_pos, vals):
        assert list(r["p"]) == _bloom_positions(v), v
    spark_est = hll_estimate(df, "v").first()["hll_estimate"]
    assert spark_est == hll_finalize(_hll_registers(vals))


@given(
    members=st.sets(st.text(st.sampled_from("abcdef09"), min_size=1, max_size=6), max_size=80),
    probes=st.lists(st.text(st.sampled_from("abcdef09"), min_size=1, max_size=6), max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_bloom_membership_never_false_negative(members, probes):
    mem_bits = {p for v in members for p in _bloom_positions(v)}
    for v in members:
        assert all(p in mem_bits for p in _bloom_positions(v))
    # and a probe flagged "not member" is NEVER actually a member
    for v in probes:
        if not all(p in mem_bits for p in _bloom_positions(v)):
            assert v not in members


@given(
    values=st.lists(
        st.text(st.sampled_from("xyz123"), min_size=1, max_size=5),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=100, deadline=None)
def test_countmin_estimate_at_least_true_count(values):
    depth, width = 4, 1024
    cells: dict[tuple[int, int], int] = {}
    for v in values:
        for j in range(depth):
            key = (j, _md5_int60(f"cm{j}:", v) % width)
            cells[key] = cells.get(key, 0) + 1
    from collections import Counter

    exact = Counter(values)
    for v, n in exact.items():
        est = min(cells[(j, _md5_int60(f"cm{j}:", v) % width)] for j in range(4))
        assert est >= n


@given(n=st.integers(1, 30000), seed=st.integers(0, 1 << 20))
@settings(max_examples=30, deadline=None)
def test_hll_error_bounded_for_any_cardinality(n, seed):
    from duckdb_cloudflare_spark.operators.sketches import hll_finalize

    est = hll_finalize(_hll_registers(f"s{seed}:{i}" for i in range(n)))
    # σ ≈ 1.04/√1024 ≈ 3.25%; allow 5σ (linear counting is tighter below
    # ~2.5m, so small n passes easily)
    assert abs(est - n) / n < 0.17, (n, est)


@given(
    values=st.sets(st.text(st.sampled_from("pqr789"), min_size=1, max_size=6), min_size=1, max_size=200),
)
@settings(max_examples=100, deadline=None)
def test_hll_is_order_and_duplication_invariant(values):
    from duckdb_cloudflare_spark.operators.sketches import hll_finalize

    ordered = sorted(values)
    dup = ordered + ordered[::-1] + ordered  # duplicates, shuffled order
    assert hll_finalize(_hll_registers(ordered)) == hll_finalize(_hll_registers(dup))


@given(
    ids=st.sets(st.integers(0, 10**6), min_size=5, max_size=60),
    scale=st.integers(2, 1000),
)
@settings(max_examples=100, deadline=None)
def test_priority_keys_are_weight_scale_free(ids, scale):
    # ln(u)/w ordering is invariant under multiplying ALL weights by a
    # constant — the sample depends on relative weights only
    def keys(ws):
        out = {}
        for i in sorted(ids):
            u = (_md5_int60("ps:", str(i)) + 1) / float(1 << 60)
            out[i] = math.log(u) / ws[i]
        return sorted(out, key=lambda i: (-out[i], i))

    w1 = {i: 1 + (i % 7) for i in ids}
    w2 = {i: w * scale for i, w in w1.items()}
    assert keys(w1) == keys(w2)
