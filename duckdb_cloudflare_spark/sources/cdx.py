"""CDX index clients: URL builders + response parsers for Common Crawl and
the Internet Archive Wayback Machine.

URL-building parity (citations into /root/reference):
- Common Crawl URL assembly   ← src/common_crawl_index.cpp:65-115
  (field-name mapping mimetype→mime / statuscode→status at :73-80,
   &fl= list :82-93, &limit= :96-99, &from=/&to= :101-111, &filter= :113-115)
- Wayback URL assembly        ← BuildArchiveOrgCDXUrl src/internet_archive.cpp:82-142
  (ordered field list :86-99, &output=csv :101-104, &matchType= :106-109,
   &from/&to :111-117, fastLatest/limit :119-124, &offset= :126-129,
   &filter= :131-134, &collapse= :136-139)

Parsing parity:
- CC ND-JSON rows             ← src/common_crawl_index.cpp:152-191
- Wayback space-delimited CSV ← src/internet_archive.cpp:210-256
"""

from __future__ import annotations

from dataclasses import dataclass, field

from duckdb_cloudflare_spark.util.text import extract_json_value, sanitize_utf8

CC_INDEX_BASE = "https://index.commoncrawl.org"
CC_DATA_BASE = "https://data.commoncrawl.org"
WAYBACK_CDX_BASE = "https://web.archive.org/cdx/search/cdx"
WAYBACK_WEB_BASE = "https://web.archive.org/web"

# Wayback CDX field order is significant: the CSV response follows &fl= order.
WAYBACK_ORDERED_FIELDS = (
    "urlkey",
    "timestamp",
    "original",
    "mimetype",
    "statuscode",
    "digest",
    "length",
)


def cc_field_name(col_name: str) -> str:
    """DuckDB column name → CC CDX API field name."""
    return {"mimetype": "mime", "statuscode": "status"}.get(col_name, col_name)


def build_cc_cdx_url(
    index_name: str,
    url_pattern: str,
    fields_needed: list[str],
    cdx_filters: list[str] | None = None,
    max_results: int = 100,
    from_ts: str = "",
    to_ts: str = "",
) -> str:
    """Common Crawl CDX query URL. ``from_ts``/``to_ts`` are already-CDX-form
    timestamps (ToCdxTimestamp output)."""
    field_list = ",".join(cc_field_name(f) for f in fields_needed)
    url = (
        f"{CC_INDEX_BASE}/{index_name}-index?url={url_pattern}"
        f"&output=json&fl={field_list}&limit={max_results}"
    )
    if from_ts:
        url += f"&from={from_ts}"
    if to_ts:
        url += f"&to={to_ts}"
    for filt in cdx_filters or []:
        url += f"&filter={filt}"
    return url


def build_wayback_cdx_url(
    url_pattern: str,
    match_type: str = "exact",
    fields_needed: list[str] | None = None,
    cdx_filters: list[str] | None = None,
    from_date: str = "",
    to_date: str = "",
    max_results: int = 100,
    collapses: list[str] | None = None,
    fast_latest: bool = False,
    offset: int = 0,
) -> str:
    """Wayback Machine CDX query URL (CSV output, ordered &fl= list)."""
    needed = set(fields_needed or [])
    field_list = ",".join(f for f in WAYBACK_ORDERED_FIELDS if f in needed)
    url = f"{WAYBACK_CDX_BASE}?url={url_pattern}&output=csv"
    if field_list:
        url += f"&fl={field_list}"
    if match_type != "exact":
        url += f"&matchType={match_type}"
    if from_date:
        url += f"&from={from_date}"
    if to_date:
        url += f"&to={to_date}"
    if fast_latest:
        url += f"&fastLatest=true&limit=-{max_results}"
    else:
        url += f"&limit={max_results}"
    if offset > 0:
        url += f"&offset={offset}"
    for filt in cdx_filters or []:
        url += f"&filter={filt}"
    for collapse in collapses or []:
        url += f"&collapse={collapse}"
    return url


def build_warc_url(filename: str) -> str:
    return f"{CC_DATA_BASE}/{filename}"


def build_wayback_page_url(timestamp: str, original: str) -> str:
    """Raw-content fetch URL (id_ suffix) — src/internet_archive.cpp:281."""
    return f"{WAYBACK_WEB_BASE}/{timestamp}id_/{original}"


@dataclass
class CDXRecord:
    url: str = ""
    timestamp: str = ""
    mime_type: str = ""
    status_code: int = 0
    digest: str = ""
    filename: str = ""
    offset: int = 0
    length: int = 0
    crawl_id: str = ""


def parse_cc_ndjson(response_data: bytes | str, index_name: str, need_warc_fields: bool) -> list[CDXRecord]:
    """Parse CC CDX ND-JSON: skip non-'{' lines and rows without url; empty
    status → 0; offset/length parsed only when WARC fields are needed."""
    text = sanitize_utf8(response_data) if isinstance(response_data, bytes) else response_data
    records: list[CDXRecord] = []
    for line in text.splitlines():
        if not line or line[0] != "{":
            continue
        url = extract_json_value(line, "url")
        if not url:
            continue
        rec = CDXRecord(
            url=url,
            timestamp=extract_json_value(line, "timestamp"),
            mime_type=extract_json_value(line, "mime"),
            digest=extract_json_value(line, "digest"),
            crawl_id=index_name,
        )
        status_str = extract_json_value(line, "status")
        rec.status_code = int(status_str) if status_str.lstrip("-").isdigit() else 0
        if need_warc_fields:
            rec.filename = extract_json_value(line, "filename")
            offset_str = extract_json_value(line, "offset")
            length_str = extract_json_value(line, "length")
            rec.offset = int(offset_str) if offset_str.lstrip("-").isdigit() else 0
            rec.length = int(length_str) if length_str.lstrip("-").isdigit() else 0
        records.append(rec)
    return records


@dataclass
class ArchiveOrgRecord:
    urlkey: str = ""
    timestamp: str = ""
    original: str = ""
    mime_type: str = ""
    status_code: int = 0
    digest: str = ""
    length: int = 0


def parse_wayback_csv(
    response_data: bytes | str, fields_needed: list[str]
) -> list[ArchiveOrgRecord]:
    """Parse space-delimited Wayback CDX CSV. Fields arrive in
    WAYBACK_ORDERED_FIELDS order filtered to the requested set; '-' and empty
    numerics → 0; short lines skipped."""
    text = sanitize_utf8(response_data) if isinstance(response_data, bytes) else response_data
    needed = set(fields_needed)
    in_order = [f for f in WAYBACK_ORDERED_FIELDS if f in needed]
    records: list[ArchiveOrgRecord] = []
    for line in text.splitlines():
        values = line.split()
        if not values or len(values) < len(in_order):
            continue
        rec = ArchiveOrgRecord()
        for fname, val in zip(in_order, values):
            if fname == "urlkey":
                rec.urlkey = val
            elif fname == "timestamp":
                rec.timestamp = val
            elif fname == "original":
                rec.original = val
            elif fname == "mimetype":
                rec.mime_type = val
            elif fname == "statuscode":
                rec.status_code = 0 if val in ("", "-") else int(val) if val.lstrip("-").isdigit() else 0
            elif fname == "digest":
                rec.digest = val
            elif fname == "length":
                rec.length = 0 if val in ("", "-") else int(val) if val.lstrip("-").isdigit() else 0
        records.append(rec)
    return records
