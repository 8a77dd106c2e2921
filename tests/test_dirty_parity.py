"""DIRTY-INPUT ORACLE PARITY: the null/blank/unicode sweep upgraded from
"doesn't crash" to "both engines return the SAME VALUES". The r10
self-review found two parity traps (q58 null-ts ordering: Spark windows
default NULLS FIRST vs DuckDB NULLS LAST; p96/p02 blank text:
string_split_regex('') is [''] while tokens('') is []) that the
crash-only sweep was structurally blind to — this gate makes the whole
class mechanical. The dirty rows are appended with pyarrow so the
parquet physical types stay EXACTLY the driver's (naive timestamp[us];
a Spark rewrite would stamp isAdjustedToUTC and change what DuckDB
reads).

Gated behind SPARK_GRAFT_DIRTY_PARITY=1 (full-registry compare ~ the
oracle-parity gate's runtime again)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_cloudflare_spark import queries as Q
from tests.test_oracle_parity import _driver_canon, _norm_cell, _numeric_kind

ALL = Q.all_queries()
ORACLES = Q.all_oracles()

_SRC = "/root/testdata/sf0.001"
_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "embeddings",
)


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_dirty_parity")
    for t in _TABLES:
        pq.write_table(pq.read_table(f"{_SRC}/{t}.parquet"), str(d / f"{t}.parquet"))

    docs = pq.read_table(f"{_SRC}/documents.parquet")
    extra = pa.table(
        {
            "doc_id": pa.array(
                [900001, 900002, 900003, 900004, 900005,
                 900006, 900007, 900008, 900009, 900010, 900011],
                pa.int64()),
            "text": pa.array(
                _DIRTY_TEXTS := [
                    None, "", "   ", "one two three four five",
                    "héllo wörld ünïcode ✓ 測試 текст emoji 🚀 done",
                    "!!! ... ??? ---",            # punctuation-only tokens
                    "a\tb\nc\r\nd  e",             # tabs/newlines/CRLF/double space
                    "aaaaaaaaaaaaaaaaaaaaaaaa",   # one repeated char (entropy 0)
                    "x" * 3000,                   # one very long token
                    "it ends with a period.",     # sentence-final punct
                    "punct then newline!\n",      # Java '$' vs RE2 '$' trap
                ],
                pa.string(),
            ),
            "lang": pa.array(
                ["en", None, "en", "xx", "xx", "en", "en", "xx", "xx",
                 "en", "en"],
                pa.string()),
            "source": pa.array(
                ["srcX", "srcX", None, "srcY", "srcY", "srcX", "srcY",
                 "srcX", "srcY", "srcX", "srcY"], pa.string()),
            # codepoint lengths COMPUTED from the text (Python len ==
            # DuckDB length(); hand-written constants drifted — review
            # find), 0 for the NULL row
            "n_chars": pa.array(
                [0 if t is None else len(t) for t in _DIRTY_TEXTS],
                pa.int64()),
        }
    ).select(docs.column_names).cast(docs.schema)
    pq.write_table(pa.concat_tables([docs, extra]), str(d / "documents.parquet"))

    ev = pq.read_table(f"{_SRC}/events.parquet")
    ts_type = ev.schema.field("ts").type
    extra_ev = pa.table(
        {
            "event_id": pa.array(
                [9900001, 9900002, 9900003, 9900004, 9900005], pa.int64()),
            "ts": pa.array(
                # NULL, two normal, epoch-0, far future (2200-01-01)
                [None, 1704067200000000, 1704153600000000, 0,
                 7258118400000000],
                pa.timestamp("us"),
            ).cast(ts_type),
            "user_id": pa.array([42, None, 43, 44, 44], pa.int64()),
            "event_type": pa.array(
                ["click", "view", None, "click", "purchase"], pa.string()),
            "value": pa.array([1.0, None, 2.0, -3.5, 1e15], pa.float64()),
            "props": pa.array(
['{"k": []}', None, "not json", '{"k": "7"}', '{"k": 7.5}'],
                pa.string()),
        }
    ).select(ev.column_names).cast(ev.schema)
    pq.write_table(pa.concat_tables([ev, extra_ev]), str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_dirty(dirty_sf):
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in _TABLES + ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dirty_sf}/{t}.parquet')"
        )
    return con


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_DIRTY_PARITY") != "1",
    reason="dirty-input value-parity sweep; enable with SPARK_GRAFT_DIRTY_PARITY=1",
)
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_dirty_value_parity(spark, duck_dirty, dirty_sf, name):
    spdf = ALL[name](spark, dirty_sf).toPandas()
    opdf = duck_dirty.sql(ORACLES[name]).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), name
    assert len(spdf) == len(opdf), (
        f"{name}: rowcount diverges ON DIRTY INPUT: "
        f"spark={len(spdf)} duck={len(opdf)}"
    )
    cs, co = _driver_canon(spdf), _driver_canon(opdf)
    for col in cs.columns:
        ks, ko = _numeric_kind(cs[col].dtype), _numeric_kind(co[col].dtype)
        if ks is not None and ko is not None:
            assert ks == ko, f"{name}.{col}: dtype kind diverges on dirty input"
    ns = sorted(tuple(_norm_cell(v) for v in row) for row in cs.itertuples(index=False))
    no = sorted(tuple(_norm_cell(v) for v in row) for row in co.itertuples(index=False))
    mismatches = [(a, b) for a, b in zip(ns, no) if a != b]
    assert not mismatches, f"{name}: dirty-input value divergence: {mismatches[:3]}"
