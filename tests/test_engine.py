"""Engine facade: the one-call surface a reference user switches to —
dialect SQL over attached tables, registered content functions, federated
read wrappers, secrets, and the D1 batch path, all through one object."""

from __future__ import annotations

import pytest

from duckdb_cloudflare_spark.engine import Engine

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark):
    eng = Engine(spark)
    eng.attach_parquet_dir(SF_DIR)
    return eng


def test_attach_registers_views_and_plain_sql_works(engine):
    assert engine.sql("SELECT count(*) AS n FROM customer").first()["n"] > 0


def test_dialect_sql_qualify(engine):
    df = engine.sql(
        """
        SELECT c_custkey, c_nationkey
        FROM customer
        QUALIFY row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_custkey) <= 2
        """
    )
    rows = df.groupBy("c_nationkey").count().collect()
    assert rows and all(r["count"] <= 2 for r in rows)


def test_content_functions_registered(engine):
    row = engine.sql("SELECT sanitize_utf8(CAST('abc' AS BINARY)) AS s").first()
    assert row["s"] == "abc"


def test_read_wayback_wrapper_through_engine(engine):
    df = engine.read_wayback(
        "example.com", distinct_on=("year",), debug="true", dry_run="true"
    )
    url = df.select("cdx_url").first()["cdx_url"]
    assert "&collapse=timestamp:4" in url


def test_secret_and_d1_transaction_batch(engine, tmp_path):
    import sqlite3

    db = str(tmp_path / "eng.sqlite")
    sqlite3.connect(db).executescript(
        "CREATE TABLE t (a INTEGER); INSERT INTO t VALUES (1);"
    )
    engine.create_secret(
        "eng_test", type="d1", account_id="acct", api_token="tok", database_id="db"
    )
    with engine.d1_transaction(secret="eng_test", d1_sqlite_stub=db) as tx:
        tx.execute("INSERT INTO t VALUES (2)")
        # reference semantics: reads inside the txn don't see buffered writes
        assert len(tx.query("SELECT a FROM t WHERE a = 2")) == 0
    # committed on exit as one batched POST
    with engine.d1_transaction(secret="eng_test", d1_sqlite_stub=db) as tx:
        assert len(tx.query("SELECT a FROM t WHERE a = 2")) == 1


def test_engine_r7_operator_facades(spark):
    from pyspark.sql import functions as F

    from duckdb_cloudflare_spark.engine import Engine

    eng = Engine(spark)
    old = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    new = spark.createDataFrame([(2, "B"), (3, "c")], "doc_id long, text string")
    got = {r["doc_id"]: r["status"] for r in eng.corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "changed", 3: "added"}

    urls = spark.createDataFrame([("HTTPS://Ex.com:443/p/?b=1&utm_s=x",)], "url string")
    assert (
        eng.canonicalize_urls(urls).first()["canonical_url"]
        == "https://ex.com/p?b=1"
    )

    feats = spark.createDataFrame(
        [(1.0, 1.0, 2.0), (0.0, 1.0, -2.0)], "y double, b double, x double"
    )
    w = eng.fit_quality_model(feats, ["b", "x"], "y", steps=1).first()
    assert abs(w["w_x"] - 1.0) < 1e-9
