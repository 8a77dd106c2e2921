from __future__ import annotations

import os

import pytest

# Default gate runs at sf0.01 — the scale the external driver grades at —
# so a query that diverges only above sf0.001 (the class q48 was: a
# round-half divergence that needed enough rows to land on an exact half)
# fails the DEFAULT suite, not just a gated sweep. Export
# SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for the fast inner loop.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from duckdb_cloudflare_spark.session import get_spark

    # Small core count for tests: faster session startup, less task overhead
    # on tiny data.
    spark = get_spark("tests", master="local[8]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        # The library factory no longer sizes the heap (ADVICE r3); the test
        # harness opts into a modest one so cached-table suites don't churn GC.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"),
    })
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
