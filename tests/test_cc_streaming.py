"""Common Crawl streaming source tests: offset semantics (new-crawls-only
batches), replayability, and an end-to-end readStream drain over fixtures."""

from __future__ import annotations

import gzip
import json

import pytest

from duckdb_cloudflare_spark.sources.cdx import build_cc_cdx_url
from duckdb_cloudflare_spark.sources.common_crawl import (
    CommonCrawlDataSource,
    CommonCrawlStreamReader,
)

CC_FIELDS = ["url", "timestamp", "mimetype", "statuscode", "digest", "filename", "offset", "length"]
CRAWLS = ["CC-MAIN-2025-43", "CC-MAIN-2025-38", "CC-MAIN-2025-30"]  # newest first


@pytest.fixture(scope="module")
def stream_fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("cc_stream")
    collinfo = [
        {"id": cid, "name": cid, "from": f"2025-0{i+1}-01T00:00:00", "to": f"2025-0{i+2}-01T00:00:00"}
        for i, cid in enumerate(CRAWLS)
    ]
    (d / "collinfo.json").write_text(json.dumps(collinfo))
    manifest = {"https://index.commoncrawl.org/collinfo.json": "collinfo.json"}
    for cid in CRAWLS:
        rows = [
            {
                "url": f"https://www.example.com/{cid}",
                "timestamp": "20251015120000",
                "mime": "text/html",
                "status": "200",
                "digest": f"D-{cid}",
                "filename": "",
                "offset": "0",
                "length": "0",
            }
        ]
        fname = f"cdx_{cid}.ndjson"
        (d / fname).write_text("\n".join(json.dumps(r) for r in rows))
        manifest[build_cc_cdx_url(cid, "*.example.com/*", CC_FIELDS, max_results=100)] = fname
    (d / "manifest.json").write_text(json.dumps(manifest))
    return str(d)


def _make_reader(fixture_dir, **extra) -> CommonCrawlStreamReader:
    from pyspark.sql.types import _parse_datatype_string

    opts = {"url": "*.example.com/*", "fixture_dir": fixture_dir, **extra}
    src = CommonCrawlDataSource(opts)
    schema = _parse_datatype_string(src.schema())
    return src.simpleStreamReader(schema)


def test_initial_offset_starts_at_latest(spark, stream_fixtures):
    r = _make_reader(stream_fixtures)
    start = r.initialOffset()
    done = set(start["processed"].split(","))
    assert done == set(CRAWLS[1:])  # everything but the latest


def test_first_batch_reads_only_latest(spark, stream_fixtures):
    r = _make_reader(stream_fixtures)
    rows, end = r.read(r.initialOffset())
    urls = [row[0] for row in rows]
    assert urls == [f"https://www.example.com/{CRAWLS[0]}"]
    assert set(end["processed"].split(",")) == set(CRAWLS)
    # nothing new afterwards -> empty batch, same offset
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == end


def test_from_scratch_reads_all_crawls(spark, stream_fixtures):
    r = _make_reader(stream_fixtures, stream_start_latest="false")
    start = r.initialOffset()
    assert start == {"processed": ""}
    rows, end = r.read(start)
    assert len(list(rows)) == len(CRAWLS)


def test_read_between_offsets_replays_exactly(spark, stream_fixtures):
    r = _make_reader(stream_fixtures, stream_start_latest="false")
    _, end = r.read({"processed": ""})
    replay = list(r.readBetweenOffsets({"processed": ""}, end))
    assert len(replay) == len(CRAWLS)
    partial = list(
        r.readBetweenOffsets({"processed": ",".join(sorted(CRAWLS[1:]))}, end)
    )
    assert len(partial) == 1


def test_missing_url_filter_raises(spark, stream_fixtures):
    r = _make_reader(stream_fixtures)
    r.batch_reader.spec.url_pattern = ""
    with pytest.raises(ValueError, match="URL filter"):
        r.initialOffset()


def test_readstream_end_to_end(registered, stream_fixtures):
    df = (
        registered.readStream.format("common_crawl")
        .option("url", "*.example.com/*")
        .option("fixture_dir", stream_fixtures)
        .option("stream_start_latest", "false")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("cc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = registered.table("cc_stream").select("url", "crawl_id").collect()
    assert {r["crawl_id"] for r in got} == set(CRAWLS)
    assert len(got) == len(CRAWLS)


@pytest.fixture(scope="module")
def registered(spark):
    from duckdb_cloudflare_spark.session import register_sources

    register_sources(spark)
    return spark
