"""operators/web.py (URL canonicalization) and
text_analysis.repetition_stats (Gopher repetition rules) — direct operator
tests with hand-computed expectations; the oracle queries p63/p64 cover the
corpus-scale hash parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_cloudflare_spark.operators.text_analysis import repetition_stats
from duckdb_cloudflare_spark.operators.web import canonicalize_url, url_host


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url(F.col("url")).alias("c")).first()["c"]


class TestCanonicalizeUrl:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            # scheme+host lowering, path case preserved
            ("HTTP://EXAMPLE.com/KeepCase", "http://example.com/KeepCase"),
            # default ports dropped, non-default kept
            ("https://ex.com:443/a", "https://ex.com/a"),
            ("http://ex.com:80/a", "http://ex.com/a"),
            ("https://ex.com:8080/a", "https://ex.com:8080/a"),
            # http:443 is NOT http's default → kept
            ("http://ex.com:443/a", "http://ex.com:443/a"),
            # fragment dropped
            ("https://ex.com/a#middle", "https://ex.com/a"),
            # tracking params removed, remainder sorted, '?' dropped if none
            (
                "https://ex.com/p?utm_source=x&b=2&a=1&fbclid=F&gclid=G",
                "https://ex.com/p?a=1&b=2",
            ),
            ("https://ex.com/p?utm_campaign=x", "https://ex.com/p"),
            # bare tracking name without '=' also dropped
            ("https://ex.com/p?fbclid&a=1", "https://ex.com/p?a=1"),
            # empty path → '/', trailing slash stripped on non-root
            ("https://ex.com", "https://ex.com/"),
            ("https://ex.com/a/b/", "https://ex.com/a/b"),
            ("https://ex.com/", "https://ex.com/"),
            # a NON-tracking param that merely starts like one is kept
            ("https://ex.com/p?fbclid_x=1", "https://ex.com/p?fbclid_x=1"),
        ],
    )
    def test_rules(self, spark, raw, expected):
        assert _canon(spark, raw) == expected

    def test_not_a_url_is_null(self, spark):
        assert _canon(spark, "not a url at all") is None

    def test_null_in_null_out(self, spark):
        df = spark.createDataFrame([(None,)], "url string")
        assert df.select(canonicalize_url(F.col("url")).alias("c")).first()["c"] is None

    def test_host_extract(self, spark):
        df = spark.createDataFrame([("HTTPS://WWW.Ex.COM:9/x",)], "url string")
        assert df.select(url_host(F.col("url")).alias("h")).first()["h"] == "www.ex.com"

    def test_canonical_collision_is_the_dedup_key(self, spark):
        # The whole point: trivially-different URLs of the same page land on
        # ONE canonical key.
        variants = [
            "https://Ex.com/page?b=2&a=1",
            "HTTPS://ex.com:443/page/?a=1&b=2#top",
            "https://ex.com/page?utm_source=mail&a=1&b=2",
        ]
        df = spark.createDataFrame([(v,) for v in variants], "url string")
        keys = [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
        assert len(set(keys)) == 1 and keys[0] == "https://ex.com/page?a=1&b=2"


class TestRepetitionStats:
    def _run(self, spark, text):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return repetition_stats(df).first()

    def test_hand_computed(self, spark):
        # "ab cd ab cd xx": tokens 5, total_chars 10.
        # 2-grams: "ab cd"(2), "cd ab"(1), "cd xx"(1) → top: 2*4/10 = 0.8
        # 3-grams: each once → top: 1*6/10 = 0.6 (tie → charlen, then gram asc:
        #   "ab cd ab", "ab cd xx"? no — grams are "ab cd ab","cd ab cd","ab cd xx";
        #   all cnt 1 chars 6 → lexicographically smallest wins, frac same)
        # 5-grams: one, count 1 → dup5 0
        r = self._run(spark, "ab cd ab cd xx")
        assert r["total_chars"] == 10
        assert r["top2_frac"] == pytest.approx(0.8)
        assert r["top3_frac"] == pytest.approx(0.6)
        assert r["dup5_frac"] == 0.0

    def test_heavy_repetition_flags(self, spark):
        # "w w w w w w w w w w": every 5-gram is "w w w w w" ×6 → dup mass
        # 6*5=30 over 10 chars → 3.0 (pressure score may exceed 1).
        r = self._run(spark, " ".join(["w"] * 10))
        assert r["top2_frac"] == pytest.approx(9 * 2 / 10)
        assert r["dup5_frac"] == pytest.approx(3.0)

    def test_no_repetition(self, spark):
        r = self._run(spark, "alpha beta gamma delta epsilon zeta")
        assert r["dup5_frac"] == 0.0
        # unique 2-grams: top frac = covered chars of one bigram / total
        assert 0 < r["top2_frac"] < 0.5

    def test_short_and_empty_docs(self, spark):
        assert self._run(spark, "single")["top2_frac"] == 0.0
        r = self._run(spark, "")
        assert r["total_chars"] == 0
        assert (r["top2_frac"], r["top3_frac"], r["dup5_frac"]) == (0.0, 0.0, 0.0)


class TestFitLogistic:
    def _fit(self, spark, rows, steps=1, lr=1.0):
        from duckdb_cloudflare_spark.operators.quality_model import fit_logistic

        df = spark.createDataFrame(rows, "y double, b double, x double")
        return fit_logistic(df, ["b", "x"], "y", steps=steps, lr=lr).first()

    def test_single_step_hand_computed(self, spark):
        # From w=0 every sigmoid is 0.5: w_b = avg(y-0.5), w_x = avg((y-0.5)x).
        rows = [(1.0, 1.0, 2.0), (0.0, 1.0, -2.0)]
        w = self._fit(spark, rows, steps=1)
        assert w["w_b"] == pytest.approx((0.5 - 0.5) / 1)  # avg(0.5, -0.5) = 0
        assert w["w_x"] == pytest.approx((0.5 * 2.0 + (-0.5) * -2.0) / 2)  # 1.0

    def test_two_steps_move_toward_separator(self, spark):
        # Separable data (y=1 iff x>0): more steps grow the x weight
        # monotonically and keep improving training log-likelihood.
        import math

        rows = [(1.0, 1.0, 1.0), (1.0, 1.0, 2.0), (0.0, 1.0, -1.0), (0.0, 1.0, -2.0)]
        w1 = self._fit(spark, rows, steps=1)
        w2 = self._fit(spark, rows, steps=2)
        assert w2["w_x"] > w1["w_x"] > 0

        def loglik(wb, wx):
            tot = 0.0
            for y, _, x in rows:
                p = 1.0 / (1.0 + math.exp(-(wb + wx * x)))
                tot += math.log(p if y else 1 - p)
            return tot

        assert loglik(w2["w_b"], w2["w_x"]) > loglik(w1["w_b"], w1["w_x"])

    def test_lr_scales_first_step(self, spark):
        rows = [(1.0, 1.0, 2.0), (0.0, 1.0, -2.0)]
        half = self._fit(spark, rows, steps=1, lr=0.5)
        full = self._fit(spark, rows, steps=1, lr=1.0)
        assert half["w_x"] == pytest.approx(full["w_x"] * 0.5)

    def test_no_features_raises(self, spark):
        from duckdb_cloudflare_spark.operators.quality_model import fit_logistic

        df = spark.createDataFrame([(1.0,)], "y double")
        with pytest.raises(ValueError, match="at least one"):
            fit_logistic(df, [], "y")


class TestCorpusDiff:
    def test_statuses(self, spark):
        from duckdb_cloudflare_spark.operators.curation import corpus_diff

        old = spark.createDataFrame(
            [(1, "same"), (2, "before"), (3, "gone")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "same"), (2, "after"), (4, "fresh")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
        assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    def test_null_text_fingerprints_as_empty(self, spark):
        from duckdb_cloudflare_spark.operators.curation import corpus_diff

        old = spark.createDataFrame([(1, None)], "doc_id long, text string")
        new = spark.createDataFrame([(1, "")], "doc_id long, text string")
        assert corpus_diff(old, new).first()["status"] == "unchanged"

    def test_text_never_shuffles(self, spark):
        # The join must move (id, fingerprint) only: no exchange carries the
        # text column.
        from duckdb_cloudflare_spark.operators.curation import corpus_diff

        old = spark.range(100).selectExpr("id AS doc_id", "repeat('x', 100) AS text")
        new = spark.range(50, 150).selectExpr("id AS doc_id", "repeat('y', 100) AS text")
        plan = corpus_diff(old, new)._jdf.queryExecution().executedPlan().toString()
        import re

        for m in re.finditer(r"Exchange [^\n]*", plan):
            assert "text" not in m.group(0), m.group(0)
