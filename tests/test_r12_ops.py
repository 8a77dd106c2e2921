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
