"""SQL table-function parity: the reference exposes its scans as DuckDB
TABLE FUNCTIONS — ``SELECT * FROM common_crawl_index(url := '...',
max_results := 100)`` (reference src/common_crawl_index.cpp table-function
registration; named-parameter binding at :320-342). This module registers
the same call shape as Spark Python UDTFs, and ``compat.duck_sql`` rewrites
DuckDB's ``:=`` named-argument token to Spark's ``=>`` — so the reference's
query text runs verbatim through ``Engine.sql``.

Scope note (documented, deliberate): the UDTF path executes the whole scan
inside ONE executor task — it is the *call-syntax parity* surface. The
distributed path is the DataSource reader (``spark.read.format(
"common_crawl")``: partition-per-crawl, filter pushdown, streaming
prefetch); ``Engine.read_common_crawl`` wraps it. Both share the SAME
reader implementation (`CommonCrawlReader`/`WaybackReader`), so options,
golden URLs, retry policy, and error contracts are identical by
construction, and the hermetic test transports (``fixture_dir``,
``dry_run``) work unchanged.

``analyze`` runs in a session-less Python process, so the UDTF schemas are
built programmatically here; ``tests/test_table_functions.py`` pins them
equal to ``StructType.fromDDL`` of the DataSources' authoritative DDL
strings (drift in either direction fails the suite).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(name: str, dt) -> StructField:
    return StructField(name, dt)


_STR_MAP = MapType(StringType(), StringType())

# Programmatic twins of the readers' _BASE_SCHEMA DDL (pinned equal by test).
CC_SCHEMA = StructType(
    [
        _s("url", StringType()),
        _s("timestamp", TimestampType()),
        _s("mimetype", StringType()),
        _s("statuscode", IntegerType()),
        _s("digest", StringType()),
        _s("filename", StringType()),
        _s("offset", LongType()),
        _s("length", LongType()),
        _s("crawl_id", StringType()),
        _s(
            "warc",
            StructType([_s("version", StringType()), _s("headers", _STR_MAP)]),
        ),
        _s(
            "response",
            StructType(
                [
                    _s("body", BinaryType()),
                    _s("headers", _STR_MAP),
                    _s("http_version", StringType()),
                    _s("error", StringType()),
                ]
            ),
        ),
    ]
)

WAYBACK_SCHEMA = StructType(
    [
        _s("url", StringType()),
        _s("timestamp", TimestampType()),
        _s("urlkey", StringType()),
        _s("mimetype", StringType()),
        _s("statuscode", IntegerType()),
        _s("digest", StringType()),
        _s("length", LongType()),
        _s(
            "response",
            StructType([_s("body", BinaryType()), _s("error", StringType())]),
        ),
        _s("year", IntegerType()),
        _s("month", IntegerType()),
    ]
)


def _options_from(kwargs: dict) -> dict:
    """Normalize UDTF argument values to the string options the readers
    expect (booleans lowercased so ``_truthy`` sees 'true')."""
    out = {}
    for k, v in kwargs.items():
        val = getattr(v, "value", v)  # AnalyzeArgument at analyze time
        if val is None:
            continue
        out[k] = str(val).lower() if isinstance(val, bool) else str(val)
    return out


def _with_debug(base: StructType, options: dict) -> StructType:
    if str(options.get("debug", "")).lower() in ("true", "1", "yes"):
        return StructType(base.fields + [_s("cdx_url", StringType())])
    return base


class CommonCrawlIndexUDTF:
    """``common_crawl_index(url => ..., crawl_id => ..., ...)`` — same named
    parameters, defaults, bind-time unknown-option errors, and row contract
    as the ``common_crawl`` DataSource (they share the reader)."""

    @staticmethod
    def analyze(**kwargs):
        from pyspark.sql.functions import AnalyzeResult

        from duckdb_cloudflare_spark.sources.options import (
            CC_OPTIONS,
            validate_options,
        )

        opts = _options_from(kwargs)
        validate_options("common_crawl_index", opts, CC_OPTIONS)
        return AnalyzeResult(schema=_with_debug(CC_SCHEMA, opts))

    def eval(self, **kwargs):
        from duckdb_cloudflare_spark.sources.common_crawl import CommonCrawlReader

        opts = _options_from(kwargs)
        reader = CommonCrawlReader(_with_debug(CC_SCHEMA, opts), opts)
        for part in reader.partitions():
            yield from reader.read(part)


class WaybackMachineUDTF:
    """``wayback_machine(url => ..., collapse => ..., ...)`` — the reference's
    Internet Archive table function as a UDTF over the shared reader."""

    @staticmethod
    def analyze(**kwargs):
        from pyspark.sql.functions import AnalyzeResult

        from duckdb_cloudflare_spark.sources.options import (
            WAYBACK_OPTIONS,
            validate_options,
        )

        opts = _options_from(kwargs)
        validate_options("wayback_machine", opts, WAYBACK_OPTIONS)
        return AnalyzeResult(schema=_with_debug(WAYBACK_SCHEMA, opts))

    def eval(self, **kwargs):
        from duckdb_cloudflare_spark.sources.wayback import WaybackReader

        opts = _options_from(kwargs)
        reader = WaybackReader(_with_debug(WAYBACK_SCHEMA, opts), opts)
        for part in reader.partitions():
            yield from reader.read(part)


class D1ScanUDTF:
    """``d1_scan(table => ..., ...)`` — typed rows via the shared D1 reader.
    Schema discovery (remote PRAGMA + affinity rules) happens at analyze
    time, mirroring the reference's bind-time schema fetch.

    Credential caveat: ``analyze``/``eval`` run in separate Python
    processes, so the in-process secrets registry is NOT visible — use env
    credentials (CLOUDFLARE_ACCOUNT_ID / CLOUDFLARE_API_TOKEN), explicit
    ``account_id``/``api_token`` arguments, or the test stub options."""

    @staticmethod
    def analyze(**kwargs):
        from pyspark.sql.functions import AnalyzeResult

        from duckdb_cloudflare_spark.sources.d1 import _client_from_options
        from duckdb_cloudflare_spark.sources.options import (
            D1_OPTIONS,
            validate_options,
        )

        opts = _options_from(kwargs)
        validate_options("d1_scan", opts, D1_OPTIONS)
        table = opts.get("table")
        if not table:
            raise ValueError("d1_scan requires a table => '<name>' argument")
        return AnalyzeResult(
            schema=_client_from_options(opts).table_schema(table)
        )

    def eval(self, **kwargs):
        from duckdb_cloudflare_spark.sources.d1 import D1Reader, _client_from_options

        opts = _options_from(kwargs)
        schema = _client_from_options(opts).table_schema(opts["table"])
        reader = D1Reader(schema, opts)
        for part in reader.partitions():
            yield from reader.read(part)


class D1QueryUDTF:
    """``d1_query(sql => ...)`` — arbitrary SQL, all-VARCHAR rows with column
    order from the first result row (the reference's degenerate d1_query
    schema, src/d1_functions.cpp:119-131). Like the reference, the query
    runs at BIND time to discover columns (and again at execution)."""

    @staticmethod
    def analyze(**kwargs):
        from pyspark.sql.functions import AnalyzeResult

        from duckdb_cloudflare_spark.sources.d1 import _client_from_options

        opts = _options_from(kwargs)
        sql = opts.pop("sql", None)
        if not sql:
            raise ValueError("d1_query requires a sql => '<statement>' argument")
        rows = _client_from_options(opts).query(sql)
        cols = list(rows[0].keys()) if rows else ["result"]
        return AnalyzeResult(
            schema=StructType([_s(c, StringType()) for c in cols])
        )

    def eval(self, **kwargs):
        from duckdb_cloudflare_spark.sources.d1 import _client_from_options, _plain

        opts = _options_from(kwargs)
        sql = opts.pop("sql")
        rows = _client_from_options(opts).query(sql)
        if not rows:
            return
        cols = list(rows[0].keys())
        for r in rows:
            yield tuple(
                None if r.get(c) is None else str(_plain(r.get(c))) for c in cols
            )


def register_table_functions(spark) -> None:
    """Register the reference's table-function names on the session
    (idempotent — re-registration replaces)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("common_crawl_index", udtf(CommonCrawlIndexUDTF))
    spark.udtf.register("wayback_machine", udtf(WaybackMachineUDTF))
    spark.udtf.register("d1_scan", udtf(D1ScanUDTF))
    spark.udtf.register("d1_query", udtf(D1QueryUDTF))
