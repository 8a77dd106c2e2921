"""Column-function surface tests: SQL registration, JVM/Python path parity,
WARC struct decode through SQL."""

from __future__ import annotations

import gzip

import pytest

from pyspark.sql import functions as F

from duckdb_cloudflare_spark.functions import (
    cdx_timestamp_to_ts,
    register_all,
    ts_to_cdx_timestamp,
)
from duckdb_cloudflare_spark.util.text import parse_cdx_timestamp, to_cdx_timestamp

WARC_RECORD = (
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Target-URI: https://example.com/\r\n"
    b"\r\n"
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html\r\n"
    b"X-Dup: a\r\n"
    b"X-Dup: b\r\n"
    b"\r\n"
    b"<html>hello</html>"
)


@pytest.fixture(scope="module")
def sqlspark(spark):
    register_all(spark)
    return spark


def test_sql_parse_warc_struct(sqlspark):
    df = sqlspark.createDataFrame([(WARC_RECORD,)], "raw binary")
    df.createOrReplaceTempView("warc_raw")
    row = sqlspark.sql(
        """SELECT parse_warc(raw).warc_version  AS v,
                  parse_warc(raw).http_status_code AS status,
                  parse_warc(raw).http_headers['Content-Type'] AS ct,
                  parse_warc(raw).http_headers['X-Dup'] AS dup,
                  CAST(parse_warc(raw).body AS STRING) AS body
           FROM warc_raw"""
    ).first()
    assert row["v"] == "1.0"
    assert row["status"] == 200
    assert row["ct"] == "text/html"
    assert row["dup"] == "a, b"  # duplicate headers joined ', ' (reference)
    assert row["body"] == "<html>hello</html>"
    # missing map key -> NULL, matching reference error-contract tests
    missing = sqlspark.sql(
        "SELECT parse_warc(raw).http_headers['Nope'] AS x FROM warc_raw"
    ).first()
    assert missing["x"] is None


def test_sql_gzip_and_sanitize_roundtrip(sqlspark):
    payload = "héllo wörld".encode("utf-8")
    blob = gzip.compress(payload)
    df = sqlspark.createDataFrame([(blob,)], "gz binary")
    df.createOrReplaceTempView("gz_raw")
    row = sqlspark.sql(
        "SELECT sanitize_utf8(decompress_gzip(gz)) AS s FROM gz_raw"
    ).first()
    assert row["s"] == "héllo wörld"
    # invalid UTF-8 bytes become '?' per byte (reference SanitizeUTF8);
    # sanitize_utf8 takes BINARY (invalid UTF-8 can't ride an Arrow string)
    bad = sqlspark.createDataFrame([(b"ok\xff\xfe",)], "b binary")
    bad.createOrReplaceTempView("bad_raw")
    assert sqlspark.sql("SELECT sanitize_utf8(b) AS s FROM bad_raw").first()["s"] == "ok??"


def test_sql_parse_http_headers(sqlspark):
    hdrs = "A: 1\r\nB: 2\r\nA: 3\r\ngarbage-line\r\n"
    df = sqlspark.createDataFrame([(hdrs,)], "h string")
    df.createOrReplaceTempView("hdr_raw")
    row = sqlspark.sql("SELECT parse_http_headers(h) AS m FROM hdr_raw").first()
    assert row["m"] == {"A": "1, 3", "B": "2"}


CDX_CASES = [
    "20240601000000",  # strips to 20240601
    "20240601123000",
    "20241231235959",
    "20200101010101",
    "bogus",  # malformed -> epoch
    "2024",  # short -> epoch
]


def test_cdx_timestamp_jvm_matches_python_port(sqlspark):
    df = sqlspark.createDataFrame([(c,) for c in CDX_CASES], "c string")
    got = df.select(cdx_timestamp_to_ts("c").alias("ts")).collect()
    for case, row in zip(CDX_CASES, got):
        expected = parse_cdx_timestamp(case).replace(tzinfo=None)
        assert row["ts"] == expected, case


def test_to_cdx_timestamp_jvm_matches_python_port(sqlspark):
    stamps = ["2024-06-01 00:00:00", "2024-06-01 12:30:00", "2024-12-31 23:59:59"]
    df = sqlspark.createDataFrame([(s,) for s in stamps], "s string")
    got = df.select(
        ts_to_cdx_timestamp(F.to_timestamp("s")).alias("cdx"), "s"
    ).collect()
    for row in got:
        # python port takes ISO-ish strings: digits-only then strip
        assert row["cdx"] == to_cdx_timestamp(row["s"]), row["s"]


def test_sql_registered_cdx_functions(sqlspark):
    row = sqlspark.sql(
        "SELECT cdx_to_timestamp('20240601123000') AS ts,"
        "       to_cdx_timestamp('2024-06-01 00:00:00') AS cdx"
    ).first()
    assert str(row["ts"]) == "2024-06-01 12:30:00"
    assert row["cdx"] == "20240601"


def test_image_meta_sql_dispatches_all_codecs(spark):
    from duckdb_cloudflare_spark.functions.content import register_all
    from duckdb_cloudflare_spark.util import bmp, jpeg, png

    register_all(spark)
    rows = [
        (1, png.encode_png(bytes(27), 3, 3, 3)),
        (2, jpeg.encode_jpeg(bytes([9]) * 64, 8, 8)),
        (3, bmp.encode_bmp(bytes(36), 4, 3)),
        (4, b"\x00garbage"),
        (5, None),
    ]
    spark.createDataFrame(rows, "id long, asset binary").createOrReplaceTempView(
        "assets_t"
    )
    got = {
        r["id"]: (r["m"]["mime"], r["m"]["width"], r["m"]["height"], r["m"]["error"] is not None)
        for r in spark.sql("SELECT id, image_meta(asset) AS m FROM assets_t").collect()
    }
    assert got[1] == ("image/png", 3, 3, False)
    assert got[2] == ("image/jpeg", 8, 8, False)
    assert got[3] == ("image/bmp", 4, 3, False)
    assert got[4][0] is None and got[4][3] is True
    assert got[5][0] is None and got[5][3] is True
