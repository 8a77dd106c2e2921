"""Local replica of the driver's t2 correctness gate: run every registered
query on Spark AND its DuckDB oracle, compare row count, column names, and
order-insensitive values (columns sorted by name — same normalization the
driver applies)."""

from __future__ import annotations

import math

import pytest

from duckdb_cloudflare_spark import queries as Q

ALL = Q.all_queries()
ORACLES = Q.all_oracles()


def _normalize(rows, colnames):
    """Sort columns by name, stringify values with float rounding, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # 12 significant digits: tolerates last-ulp double noise, catches
            # any real mismatch (queries already round aggregates to 4-6 dp).
            return f"{v:.12g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = ALL[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLES[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatching rows: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_query_runs_rows_only(spark, sf_dir, name):
    """Queries without oracles must still run, return a stable schema, AND
    survive the driver's pandas canonicalizer (sort_values over all columns
    dies on unhashable cells like array columns — the exact failure that made
    p13 ungradable in round 3)."""
    sdf = ALL[name](spark, sf_dir)
    assert sdf.columns
    pdf = sdf.toPandas()
    assert len(pdf) >= 0
    # Replica of the driver's rows-only canonicalization: any column whose
    # cells are lists/dicts raises TypeError here, exactly as in the driver.
    pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
