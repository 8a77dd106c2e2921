"""End-to-end composition: federated CC source (fixture transport) → text
extraction → quality/dedup operators → sized parquet write → re-read.
The 'crawl to training corpus' path a user of the engine actually runs,
exercised hermetically."""

from __future__ import annotations

import glob
import gzip
import json

import pytest

from pyspark.sql import functions as F

CC_CRAWL = "CC-MAIN-2025-43"


@pytest.fixture(scope="module")
def registered(spark):
    from duckdb_cloudflare_spark.session import register_sources

    register_sources(spark)
    return spark


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from duckdb_cloudflare_spark.sources.cdx import build_cc_cdx_url

    d = tmp_path_factory.mktemp("e2e_fixtures")
    warc = (
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html>fixture page</html>"
    )
    member = gzip.compress(warc)
    (d / "blob.warc.gz").write_bytes(member)
    fields = ["url", "timestamp", "mimetype", "statuscode", "digest",
              "filename", "offset", "length"]
    rows = [
        {"url": "https://www.example.com/", "timestamp": "20251015120000",
         "mime": "text/html", "status": "200", "digest": "DIGA",
         "filename": "crawl-data/seg/x.warc.gz", "offset": "10",
         "length": str(len(member))},
        {"url": "https://www.example.com/about", "timestamp": "20251016120000",
         "mime": "text/html", "status": "404", "digest": "DIGB",
         "filename": "", "offset": "0", "length": "0"},
    ]
    (d / "cc.ndjson").write_text("\n".join(json.dumps(r) for r in rows))
    cc_url = build_cc_cdx_url(CC_CRAWL, "*.example.com/*", fields, max_results=100)
    manifest = {
        cc_url: "cc.ndjson",
        f"https://data.commoncrawl.org/crawl-data/seg/x.warc.gz|Range:bytes=10-{10+len(member)-1}": "blob.warc.gz",
    }
    (d / "manifest.json").write_text(json.dumps(manifest))
    return str(d)


def test_crawl_to_corpus(registered, fixture_dir, tmp_path):
    from duckdb_cloudflare_spark.functions.content import sanitize_utf8_col
    from duckdb_cloudflare_spark.operators.dedup import exact_dedup
    from duckdb_cloudflare_spark.operators.text_analysis import identify_language
    from duckdb_cloudflare_spark.sources.write import write_sized_parquet

    # 1. federated scan with content fetch (canned CDX + WARC fixtures)
    crawl = (
        registered.read.format("common_crawl")
        .option("url", "*.example.com/*")
        .option("crawl_id", CC_CRAWL)
        .option("fixture_dir", fixture_dir)
        .option("fetch_response", "true")
        .load()
    )

    # 2. extract text: UTF-8-sanitized response body, rows with content only
    docs = (
        crawl.filter(F.col("response.body").isNotNull() & (F.length("response.body") > 0))
        .select(
            F.col("url"),
            F.col("digest").alias("doc_id"),
            sanitize_utf8_col(F.col("response.body")).alias("text"),
        )
    )

    # 3. pipeline operators compose on the federated output
    enriched = docs.withColumn("lang", identify_language(F.col("text")))
    surviving = exact_dedup(enriched, text_col="text", id_col="doc_id")
    assert surviving.count() >= 1

    # 4. sized write + re-read round-trip
    out = str(tmp_path / "corpus")
    write_sized_parquet(enriched, out, target_file_mb=64)
    back = registered.read.parquet(out)
    assert back.count() == docs.count()
    assert set(back.columns) == {"url", "doc_id", "text", "lang"}
    assert glob.glob(out + "/*.parquet")
    row = back.filter(F.col("url") == "https://www.example.com/").first()
    assert "fixture page" in row["text"]
