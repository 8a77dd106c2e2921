"""Content-processing column functions — the reference's scalar utility
surface (gzip, WARC/HTTP parsing, UTF-8 sanitization, CDX timestamps, JSON
extraction) as Spark columns, usable from both the DataFrame API and SQL
(``register_all(spark)``).

Reference parity (citations into /root/reference):
- sanitize_utf8        ← SanitizeUTF8        src/web_archive_utils.cpp:91-148
- decompress_gzip      ← DecompressGzip      src/web_archive_utils.cpp:225-268
- parse_headers        ← ParseHeaders        src/web_archive_utils.cpp:274-315
- parse_warc_response  ← ParseWARCResponse   src/web_archive_utils.cpp:317-419
- cdx_timestamp_to_ts  ← ParseCDXTimestamp   src/web_archive_utils.cpp:199-219
- ts_to_cdx_timestamp  ← ToCdxTimestamp      src/web_archive_utils.cpp:74-89
- extract_json_value   ← ExtractJSONValue    src/web_archive_utils.cpp:160-177

Design: anything expressible with built-in ``pyspark.sql.functions`` stays
JVM-side (codegen, vectorized); the byte-level parsers (gzip, WARC, UTF-8
scanner) are Arrow-batched pandas UDFs over the pure-Python ports in
``duckdb_cloudflare_spark.util`` — the same functions the DataSource readers
use, so behavior is identical on both paths.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from duckdb_cloudflare_spark.util.text import (
    parse_cdx_timestamp,
    sanitize_utf8,
    to_cdx_timestamp,
)
from duckdb_cloudflare_spark.util.warc import (
    decompress_gzip,
    parse_headers,
    parse_warc_response,
)

# ---------------------------------------------------------------------------
# Native-expression functions (JVM-side, stay in codegen)
# ---------------------------------------------------------------------------


def cdx_timestamp_to_ts(col: Column | str) -> Column:
    """Strict 14-char CDX ``YYYYMMDDhhmmss`` → TIMESTAMP (UTC); anything
    malformed → epoch 0, the reference's error value."""
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.to_timestamp(c, "yyyyMMddHHmmss")
    ok = (F.length(c) == 14) & c.rlike(r"^\d{14}$") & parsed.isNotNull()
    return F.when(ok, parsed).otherwise(F.timestamp_seconds(F.lit(0)))


def ts_to_cdx_timestamp(col: Column | str) -> Column:
    """TIMESTAMP → CDX string: format to 14 digits, then strip trailing
    zeros (``2024-06-01 00:00:00`` → ``20240601``). Never strips below
    4 digits (the year survives, matching ToCdxTimestamp's use for
    from/to params)."""
    c = F.col(col) if isinstance(col, str) else col
    digits = F.date_format(c, "yyyyMMddHHmmss")
    stripped = F.regexp_replace(digits, r"(?<=^\d{4})(\d*?)0+$", r"$1")
    return stripped


def extract_json_value_col(col: Column | str, key: str) -> Column:
    """JSON field extraction via the JVM's get_json_object (superset of the
    reference's naive string scanner — handles escaping correctly)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{key}")


# ---------------------------------------------------------------------------
# Pandas-UDF functions (byte-level parsers shared with the DataSources)
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def sanitize_utf8_col(s: pd.Series) -> pd.Series:
    """BINARY → sanitized STRING. Takes *binary* input by contract: invalid
    UTF-8 cannot ride an Arrow string column (Arrow enforces validity), so
    the sanitizer is exactly the binary→string boundary — same place the
    reference applies SanitizeUTF8 (on ingest)."""
    return s.map(lambda v: None if v is None else sanitize_utf8(bytes(v)))


@pandas_udf(BinaryType())
def decompress_gzip_col(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else decompress_gzip(bytes(v)))


@pandas_udf(MapType(StringType(), StringType()))
def parse_headers_col(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else parse_headers(v))


WARC_RECORD_SCHEMA = StructType(
    [
        StructField("warc_version", StringType()),
        StructField("warc_headers", MapType(StringType(), StringType())),
        StructField("http_version", StringType()),
        StructField("http_status_code", IntegerType()),
        StructField("http_headers", MapType(StringType(), StringType())),
        StructField("body", BinaryType()),
        StructField("error", StringType()),
    ]
)


@pandas_udf(WARC_RECORD_SCHEMA)
def parse_warc_col(s: pd.Series) -> pd.DataFrame:
    rows = []
    for v in s:
        if v is None:
            rows.append({f.name: None for f in WARC_RECORD_SCHEMA})
            continue
        r = parse_warc_response(bytes(v))
        rows.append(
            {
                "warc_version": r.warc_version,
                "warc_headers": r.warc_headers,
                "http_version": r.http_version,
                "http_status_code": r.http_status_code,
                "http_headers": r.http_headers,
                "body": r.body,
                "error": r.error,
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in WARC_RECORD_SCHEMA])


@pandas_udf(TimestampType())
def _cdx_to_timestamp_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else parse_cdx_timestamp(v).replace(tzinfo=None))


@pandas_udf(StringType())
def _to_cdx_timestamp_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else to_cdx_timestamp(str(v)))


# ---------------------------------------------------------------------------
# SQL registration
# ---------------------------------------------------------------------------


_IMAGE_META_TYPE = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("error", StringType()),
    ]
)


@pandas_udf(_IMAGE_META_TYPE)
def image_meta_col(data: pd.Series) -> pd.DataFrame:
    """Header-only image metadata over a binary column — dispatches across
    the three REAL built-in codecs (PNG, baseline JPEG, 24-bit BMP; see
    util/) plus the synthetic containers, error-as-row for anything else.
    Arrow-batched; only the header bytes are inspected, never the pixel
    payload."""
    from duckdb_cloudflare_spark.operators.multimodal import decode_asset_meta

    cols = {k: [] for k in ("mime", "width", "height", "channels", "error")}
    for blob in data:
        m = decode_asset_meta(None if blob is None else bytes(blob))
        for k in cols:
            cols[k].append(m[k])
    return pd.DataFrame(cols)


def register_all(spark: SparkSession) -> None:
    """Register the function surface for ``spark.sql`` use:

    ``sanitize_utf8, decompress_gzip, parse_http_headers, parse_warc,
    cdx_to_timestamp, to_cdx_timestamp`` — mirroring the utility operators
    the reference applies inside its scans, exposed as first-class SQL
    functions here — plus ``image_meta`` over the built-in real codecs.
    The SQL entry points wrap the same pure-Python ports the DataSource
    readers use; the DataFrame-API variants above (cdx_timestamp_to_ts /
    ts_to_cdx_timestamp) are pure JVM expressions."""
    spark.udf.register("sanitize_utf8", sanitize_utf8_col)
    spark.udf.register("decompress_gzip", decompress_gzip_col)
    spark.udf.register("parse_http_headers", parse_headers_col)
    spark.udf.register("parse_warc", parse_warc_col)
    spark.udf.register("cdx_to_timestamp", _cdx_to_timestamp_udf)
    spark.udf.register("to_cdx_timestamp", _to_cdx_timestamp_udf)
    spark.udf.register("image_meta", image_meta_col)
