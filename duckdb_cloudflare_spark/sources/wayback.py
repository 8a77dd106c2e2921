"""Internet Archive Wayback Machine DataSource.

Spark-first re-expression of the reference's ``wayback_machine()`` table
function (/root/reference src/internet_archive.cpp: bind :360-454, init
:457-571, scan :574-693):

- schema: url, timestamp, urlkey, mimetype, statuscode, digest, length,
  response struct<body binary, error string>, computed year/month columns
  (:434-440, derived from the 14-char CDX timestamp at scan time :663-678),
  debug-only cdx_url
- options mirror the named parameters + the pushdowns Python can't see:
  max_results, collapse (repeatable via ';;'), debug, timeout, url,
  match_type, from, to, fast_latest (negative limit, TopN stays in the Spark
  plan exactly as the reference keeps it, :1393-1403), offset, fetch_response
- one partition per OFFSET PAGE when ``page_size`` is set (the CDX API
  supports offset pagination, :126-129) — otherwise a single partition;
  archived-page fetches fan out with bounded concurrency inside the partition
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from duckdb_cloudflare_spark.sources.cdx import (
    WAYBACK_ORDERED_FIELDS,
    build_wayback_cdx_url,
    build_wayback_page_url,
    parse_wayback_csv,
)
from duckdb_cloudflare_spark.sources.pushdown import CdxQuerySpec, translate_wayback_filter
from duckdb_cloudflare_spark.util.http import fetch_with_retry, make_transport
from duckdb_cloudflare_spark.util.text import parse_cdx_timestamp

_BASE_SCHEMA = (
    "url string, timestamp timestamp, urlkey string, mimetype string, statuscode int, "
    "digest string, length bigint, "
    "response struct<body: binary, error: string>, "
    "year int, month int"
)

DEFAULT_MAX_RESULTS = 100
DEFAULT_TIMEOUT_SECONDS = 180
FETCH_CONCURRENCY = 8


def _truthy(v: str | None) -> bool:
    return str(v).lower() in ("true", "1", "yes")


class WaybackMachineDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wayback_machine"

    def schema(self) -> str:
        from duckdb_cloudflare_spark.sources.options import (
            WAYBACK_OPTIONS,
            validate_options,
        )

        validate_options("wayback_machine", dict(self.options), WAYBACK_OPTIONS)
        if _truthy(self.options.get("debug")):
            return _BASE_SCHEMA + ", cdx_url string"
        return _BASE_SCHEMA

    def reader(self, schema: StructType) -> "WaybackReader":
        return WaybackReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> "WaybackStreamReader":
        """Streaming surface: poll for snapshots archived after the current
        timestamp watermark (see WaybackStreamReader)."""
        return WaybackStreamReader(schema, dict(self.options))


class PagePartition(InputPartition):
    def __init__(self, offset: int, limit: int):
        self.offset = offset
        self.limit = limit


class WaybackReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.options = options
        self.spec = CdxQuerySpec(
            url_pattern=options.get("url", ""),
            match_type=options.get("match_type", "exact"),
            cdx_filters=[f for f in options.get("filter", "").split(";;") if f],
            from_ts=options.get("from", ""),
            to_ts=options.get("to", ""),
        )
        self.collapses = [c for c in options.get("collapse", "").split(";;") if c]
        self.debug = _truthy(options.get("debug"))
        self.dry_run = _truthy(options.get("dry_run"))
        self.fetch_response = _truthy(options.get("fetch_response"))
        self.fast_latest = _truthy(options.get("fast_latest"))
        self.max_results = int(options.get("max_results", DEFAULT_MAX_RESULTS))
        self.offset = int(options.get("offset", 0))
        self.page_size = int(options.get("page_size", 0))
        self.timeout_seconds = int(options.get("timeout", DEFAULT_TIMEOUT_SECONDS))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            outcome = translate_wayback_filter(f, self.spec)
            # absorbed → removed from plan; weaker → residual (pushdown.py)
            if outcome != "absorbed":
                yield f

    def partitions(self) -> list[InputPartition]:
        if not self.spec.url_pattern:
            raise ValueError(
                "wayback_machine requires a URL filter. Use .option('url', 'example.com') "
                "or WHERE url = / startswith / endswith / contains"
            )
        if self.page_size > 0 and not self.fast_latest:
            pages = []
            off = self.offset
            remaining = self.max_results
            while remaining > 0:
                size = min(self.page_size, remaining)
                pages.append(PagePartition(off, size))
                off += size
                remaining -= size
            return pages
        return [PagePartition(self.offset, self.max_results)]

    def _build_url(self, partition: PagePartition) -> str:
        # matchType inference: an explicit option wins; '*.' prefix → the CDX
        # API treats the pattern itself as a domain query (reference emits the
        # pattern unchanged, internet_archive_pushdown.test:462-505).
        return build_wayback_cdx_url(
            self.spec.url_pattern,
            match_type=self.spec.match_type if self.spec.match_type != "exact" else self.options.get("match_type", "exact"),
            fields_needed=list(WAYBACK_ORDERED_FIELDS),
            cdx_filters=self.spec.cdx_filters,
            from_date=self.spec.from_ts,
            to_date=self.spec.to_ts,
            max_results=partition.limit,
            collapses=self.collapses,
            fast_latest=self.fast_latest,
            offset=partition.offset,
        )

    def read(self, partition: PagePartition):
        fields = [f.name for f in self.schema_.fields]
        cdx_url = self._build_url(partition)
        if self.dry_run:
            row = {name: None for name in fields}
            if "cdx_url" in fields:
                row["cdx_url"] = cdx_url
            yield tuple(row[name] for name in fields)
            return

        transport = make_transport(self.options)
        start = time.monotonic()
        result = fetch_with_retry(
            transport, cdx_url, start_time=start, timeout_seconds=self.timeout_seconds
        )
        if result.error:
            raise IOError(f"Error querying Internet Archive CDX API: {result.error}")
        records = parse_wayback_csv(result.body, list(WAYBACK_ORDERED_FIELDS))

        responses: dict[int, tuple] = {}
        if self.fetch_response and records:
            with ThreadPoolExecutor(max_workers=FETCH_CONCURRENCY) as pool:
                futures = {
                    i: pool.submit(self._fetch_page, transport, rec, start, self.timeout_seconds)
                    for i, rec in enumerate(records)
                }
                responses = {i: fut.result() for i, fut in futures.items()}

        for i, rec in enumerate(records):
            # year/month derived from the raw 14-char timestamp string
            # (src/internet_archive.cpp:663-678).
            year = int(rec.timestamp[:4]) if len(rec.timestamp) >= 4 and rec.timestamp[:4].isdigit() else None
            month = int(rec.timestamp[4:6]) if len(rec.timestamp) >= 6 and rec.timestamp[4:6].isdigit() else None
            row = {
                "url": rec.original,
                "timestamp": parse_cdx_timestamp(rec.timestamp),
                "urlkey": rec.urlkey,
                "mimetype": rec.mime_type,
                "statuscode": rec.status_code,
                "digest": rec.digest,
                "length": rec.length,
                "response": responses.get(i),
                "year": year,
                "month": month,
                "cdx_url": cdx_url,
            }
            yield tuple(row.get(name) for name in fields)

    @staticmethod
    def _fetch_page(transport, rec, start: float, timeout_seconds: int) -> tuple:
        """Full GET of the raw archived page; errors as row data
        (src/internet_archive.cpp:271-353)."""
        if not rec.timestamp or not rec.original:
            return (None, "Missing timestamp or URL")
        url = build_wayback_page_url(rec.timestamp, rec.original)
        result = fetch_with_retry(
            transport, url, start_time=start, timeout_seconds=timeout_seconds
        )
        if result.error:
            return (None, result.error)
        return (result.body, "")


class WaybackStreamReader(SimpleDataSourceStreamReader):
    """Incremental Wayback polling: offset = {"from_ts": "YYYYMMDDhhmmss"},
    each micro-batch fetches snapshots archived strictly AFTER the offset
    (CDX ``&from=`` is inclusive, so boundary records are filtered out) and
    advances the offset to the newest timestamp seen. ``readBetweenOffsets``
    re-queries the closed interval with ``&from=``/``&to=`` — the CDX index
    for past time ranges is append-stable, so replay is exact.

    Options mirror the batch reader; ``stream_from`` sets the initial
    watermark (default 19960101000000, the web archive's epoch)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.options = options
        if not options.get("url"):
            raise ValueError("wayback_machine stream requires a URL filter: .option('url', ...)")
        self.ts_index = [f.name for f in schema.fields].index("timestamp")

    def initialOffset(self) -> dict:
        return {"from_ts": self.options.get("stream_from", "19960101000000")}

    def _fetch(self, from_ts: str, to_ts: str | None) -> list:
        opts = dict(self.options)
        opts["from"] = from_ts
        if to_ts:
            opts["to"] = to_ts
        reader = WaybackReader(self.schema_, opts)
        [partition] = reader.partitions()
        lower = parse_cdx_timestamp(from_ts)
        rows = [
            r
            for r in reader.read(partition)
            if r[self.ts_index] is not None and r[self.ts_index] > lower
        ]
        return rows

    def read(self, start: dict):
        rows = self._fetch(start["from_ts"], None)
        if rows:
            newest = max(r[self.ts_index] for r in rows)
            end = {"from_ts": newest.strftime("%Y%m%d%H%M%S")}
        else:
            end = dict(start)
        return rows, end

    def readBetweenOffsets(self, start: dict, end: dict):
        if end.get("from_ts") == start.get("from_ts"):
            return []
        upper = parse_cdx_timestamp(end["from_ts"])
        return [
            r
            for r in self._fetch(start["from_ts"], end["from_ts"])
            if r[self.ts_index] <= upper
        ]
