"""Column-function surface: the reference's content-processing utilities
re-expressed as Spark column functions + SQL-registered UDFs."""

from duckdb_cloudflare_spark.functions.content import (  # noqa: F401
    cdx_timestamp_to_ts,
    decompress_gzip_col,
    extract_json_value_col,
    parse_headers_col,
    parse_warc_col,
    register_all,
    sanitize_utf8_col,
    ts_to_cdx_timestamp,
)
