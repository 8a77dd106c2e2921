"""Dirty-input robustness: every registry query must survive documents with
NULL text / empty text / whitespace-only text / NULL lang / NULL source —
the rows every real crawl contains. This sweep found a REAL class of bug:
the positional shingle/chunk transforms were only safe behind their
``size(ts) >= k`` filters, but Catalyst pushes derived predicates on the
shingle column BELOW those filters, evaluating the transform on short
arrays where ``sequence(0, size-k)`` turns descending and ``element_at``
faults under ANSI mode (executor error in p34/p39/p46/p48/p54). The
transforms are now TOTAL expressions (when-guarded) — safe in any
evaluation order — and this sweep pins that.

Smoke subset always-on; the full-registry sweep behind
SPARK_GRAFT_NULL_SWEEP=1 (~1 min)."""

from __future__ import annotations

import os

import pytest

from duckdb_cloudflare_spark import queries as Q

ALL = Q.all_queries()

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "embeddings",
)

# The five operators that crashed before the guards, plus one per family.
SMOKE = [
    "p34_exact_jaccard_pairs", "p39_components_exact", "p46_doc_novelty",
    "p48_minhash_estimate", "p54_curation_pipeline", "p44_chunk_dedup",
    "p41_dup_span_stats", "p50_bigram_logprob", "p02_text_stats",
    "p49_temperature_resample",
    # dirty-events representatives: windows, sessionize, funnel, time bucket
    "q40_ranking", "q47_sessionize_batch", "q51_funnel", "q28_time_bucket",
]


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_dirty")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        spark.read.parquet(f"{src}/{t}.parquet").write.parquet(
            str(d / f"{t}.parquet")
        )
    docs = spark.read.parquet(f"{src}/documents.parquet")
    extra = spark.createDataFrame(
        [
            (900001, None, "en", "srcX", 0),      # NULL text
            (900002, "", None, "srcX", 0),        # empty text, NULL lang
            (900003, "   ", "en", None, 3),       # whitespace-only, NULL source
            (900004, "one two three four five", "xx", "srcY", 23),  # short doc
            # non-ASCII doc: multi-byte UTF-8 through every tokenizer/hash
            (900005, "héllo wörld ünïcode ✓ 測試 текст emoji 🚀 done", "xx", "srcY", 46),
        ],
        schema=docs.schema,
    )
    docs.unionByName(extra).write.parquet(str(d / "documents.parquet"))
    # dirty events too: NULL ts / user_id / event_type / value / props
    # (windows, sessionization, funnels, and time buckets must all cope)
    import datetime

    from duckdb_cloudflare_spark.queries import load

    ev = load(spark, src, "events")
    ev_extra = spark.createDataFrame(
        [
            (9900001, None, 42, "click", 1.0, "{}"),
            (9900002, datetime.datetime(2024, 1, 1), None, "view", None, None),
            (9900003, datetime.datetime(2024, 1, 2), 43, None, 2.0, "not json"),
        ],
        schema=ev.schema,
    )
    ev.unionByName(ev_extra).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", SMOKE)
def test_dirty_input_smoke(spark, dirty_dir, name):
    assert ALL[name](spark, dirty_dir).count() >= 0


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_NULL_SWEEP") != "1",
    reason="full dirty-input sweep; enable with SPARK_GRAFT_NULL_SWEEP=1",
)
@pytest.mark.parametrize("name", sorted(set(ALL) - set(SMOKE)))
def test_dirty_input_full(spark, dirty_dir, name):
    assert ALL[name](spark, dirty_dir).count() >= 0
