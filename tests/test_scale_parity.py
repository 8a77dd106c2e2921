"""Scale-stress oracle parity at sf0.1 — 10× the driver's grading scale.

This sweep caught a real bug the sf0.01 gate cannot see (q48's
round(cume_dist, 6) landing on an exact decimal half where Spark and
DuckDB round differently). Testdata is regenerated every round, so values
move; run this at round start alongside the sf0.01 gate.

Gated behind SPARK_GRAFT_SCALE_PARITY=1 because it multiplies suite
runtime (~4 min extra): the default CI loop stays fast, the canary runs
on demand / at round boundaries.
"""

from __future__ import annotations

import os

import pytest

from duckdb_cloudflare_spark import queries as Q
from tests.test_oracle_parity import _driver_canon, _norm_cell

SCALE_SF_DIR = "/root/testdata/sf0.1"

# Quadratic BY DESIGN (exact all-pairs verification anchors meant for
# slices): 8000² pairwise cosine at sf0.1 is minutes in BOTH engines.
QUADRATIC_SLICE_ANCHORS = {"p35_exact_cosine_pairs"}

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_PARITY") != "1",
    reason="scale-stress sweep; enable with SPARK_GRAFT_SCALE_PARITY=1",
)

ORACLES = Q.all_oracles()
ALL = Q.all_queries()


@pytest.fixture(scope="module")
def duck_scale():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SCALE_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(set(ORACLES) - QUADRATIC_SLICE_ANCHORS)
)
def test_scale_parity(spark, duck_scale, name):
    # Same driver-faithful pandas protocol as the sf0.01 gate (r6 rewrite).
    spdf = ALL[name](spark, SCALE_SF_DIR).toPandas()
    opdf = duck_scale.sql(ORACLES[name]).df()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (
        f"{name}@sf0.1: rows {len(spdf)} vs {len(opdf)}"
    )
    cs, co = _driver_canon(spdf), _driver_canon(opdf)
    ns = sorted(tuple(_norm_cell(v) for v in row) for row in cs.itertuples(index=False))
    no = sorted(tuple(_norm_cell(v) for v in row) for row in co.itertuples(index=False))
    mismatches = [(a, b) for a, b in zip(ns, no) if a != b]
    assert not mismatches, f"{name}@sf0.1: first mismatches: {mismatches[:3]}"
