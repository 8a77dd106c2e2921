"""Gzip + HTTP/WARC parsing — behavior-parity ports of the reference
(citations into /root/reference):

- decompress_gzip     ← DecompressGzip     src/web_archive_utils.cpp:225-268
- parse_headers       ← ParseHeaders       src/web_archive_utils.cpp:274-315
- parse_warc_response ← ParseWARCResponse  src/web_archive_utils.cpp:317-419

Error contract: decompression failures return the reference's bracketed error
string ("[Error: ...]") so callers can route it into response.error rather
than failing the query (error-as-row-data semantics).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field


def decompress_gzip(data: bytes) -> bytes:
    """Single-gzip-member inflate (windowBits 15+16). On failure returns the
    reference-format error marker as bytes."""
    try:
        d = zlib.decompressobj(15 + 16)
        out = d.decompress(data)
        out += d.flush()
        return out
    except zlib.error as exc:
        return f"[Error: Gzip decompression failed with code {exc.args[0] if exc.args else '?'}]".encode()


def parse_headers(header_text: str) -> dict[str, str]:
    """CRLF/LF header block → dict; duplicate keys concatenated with ', '.
    Lines without ': ' are skipped (status lines, garbage)."""
    headers: dict[str, str] = {}
    for line in header_text.replace("\r\n", "\n").split("\n"):
        if ": " in line:
            key, value = line.split(": ", 1)
            if key in headers:
                headers[key] += ", " + value
            else:
                headers[key] = value
    return headers


@dataclass
class WARCResponse:
    warc_version: str = ""
    warc_headers: dict[str, str] = field(default_factory=dict)
    http_version: str = ""
    http_status_code: int = 0
    http_headers: dict[str, str] = field(default_factory=dict)
    body: bytes = b""
    error: str = ""


def _find_block_end(data: bytes, start: int = 0) -> tuple[int, int]:
    """Return (end_index, separator_size) of the first blank line (CRLFCRLF
    preferred, LFLF fallback), or (-1, 0)."""
    end = data.find(b"\r\n\r\n", start)
    if end != -1:
        return end, 4
    end = data.find(b"\n\n", start)
    if end != -1:
        return end, 2
    return -1, 0


def parse_warc_response(warc_data: bytes) -> WARCResponse:
    """WARC record → (version, warc headers, HTTP status/headers, body).

    Structure: WARC version line + WARC headers, blank line, HTTP status line
    + HTTP headers, blank line, body. Tolerates LF-only blocks. Returns a
    partially-filled result on malformed input (reference behavior).
    """
    result = WARCResponse()

    warc_end, sep = _find_block_end(warc_data)
    if warc_end == -1:
        return result

    warc_section = warc_data[:warc_end].decode("utf-8", errors="replace")
    first_nl = warc_section.find("\r\n")
    if first_nl == -1:
        first_nl = warc_section.find("\n")
    if first_nl != -1:
        version_line = warc_section[:first_nl]
        if version_line.startswith("WARC/"):
            result.warc_version = version_line[5:]
        rest = warc_section[first_nl:].lstrip("\r\n")
        result.warc_headers = parse_headers(rest)

    http_start = warc_end + sep
    http_end, http_sep = _find_block_end(warc_data, http_start)
    if http_end == -1:
        return result

    http_section = warc_data[http_start:http_end].decode("utf-8", errors="replace")
    first_nl = http_section.find("\r\n")
    if first_nl == -1:
        first_nl = http_section.find("\n")
    if first_nl != -1:
        status_line = http_section[:first_nl]
        if status_line.startswith("HTTP/") and " " in status_line:
            space1 = status_line.index(" ")
            result.http_version = status_line[5:space1]
            rest_status = status_line[space1 + 1 :]
            status_str = rest_status.split(" ", 1)[0]
            try:
                result.http_status_code = int(status_str)
            except ValueError:
                result.http_status_code = 0
        rest = http_section[first_nl:].lstrip("\r\n")
        result.http_headers = parse_headers(rest)

    result.body = warc_data[http_end + http_sep :]
    return result
