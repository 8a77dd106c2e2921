"""String/timestamp utilities — behavior-parity ports of the reference's pure
functions (all citations into /root/reference):

- like_to_regex            ← LikeToRegex            src/web_archive_utils.cpp:28-72
- to_cdx_timestamp         ← ToCdxTimestamp         src/web_archive_utils.cpp:74-89
- sanitize_utf8            ← SanitizeUTF8           src/web_archive_utils.cpp:91-148
- extract_json_value       ← ExtractJSONValue       src/web_archive_utils.cpp:160-177
- sql_wildcards_to_cdx     ← ConvertSQLWildcardsToCDX src/web_archive_utils.cpp:179-197
- parse_cdx_timestamp      ← ParseCDXTimestamp      src/web_archive_utils.cpp:199-219
- parse_iso8601            ← ParseISO8601Timestamp  src/web_archive_utils.cpp:426-445
"""

from __future__ import annotations

from datetime import datetime, timezone

# Regex metachars that MUST be escaped; () deliberately NOT escaped (the CDX
# backend's Java regex tolerates unmatched ')'), and the escape is the literal
# URL-encoded backslash "%5C" — both quirks preserved from the reference.
_ESCAPED = set(".[]{}+?^$|*")


def like_to_regex(like_pattern: str) -> str:
    """SQL LIKE pattern → anchored regex string for CDX filter= params."""
    starts_pct = like_pattern.startswith("%")
    ends_pct = like_pattern.endswith("%")
    out = [] if starts_pct else ["^"]
    i = 0
    while i < len(like_pattern):
        c = like_pattern[i]
        if c == "\\" and i + 1 < len(like_pattern):
            out.append(like_pattern[i + 1])
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        elif c in _ESCAPED:
            out.append("%5C")
            out.append(c)
        else:
            out.append(c)
        i += 1
    if not ends_pct:
        out.append("$")
    return "".join(out)


def escape_cdx_regex(val: str) -> str:
    """Escape regex metachars in a literal value embedded in a CDX filter=
    regex — mirror of EscapeRegex (src/internet_archive.cpp:723-740): the
    escape is the literal URL-encoded backslash "%5C", () stay unescaped,
    and backslashes are dropped (the next char then escapes normally).
    """
    out = []
    for c in val:
        if c == "\\":
            continue
        if c in _ESCAPED:
            out.append("%5C")
        out.append(c)
    return "".join(out)


def to_cdx_timestamp(ts_str: str) -> str:
    """Digits only, truncate to 14 chars, strip trailing zeros (but keep at
    least the 4-digit year)."""
    digits = "".join(c for c in ts_str if c.isdigit())[:14]
    while len(digits) > 4 and digits.endswith("0"):
        digits = digits[:-1]
    return digits


def sql_wildcards_to_cdx(pattern: str) -> str:
    """SQL %/_ wildcards → CDX */? wildcards."""
    return pattern.replace("%", "*").replace("_", "?")


def sanitize_utf8(data: bytes | str) -> str:
    """Byte-level UTF-8 validation; every invalid start byte, invalid
    continuation byte, or truncated sequence becomes a single '?'.

    Matches the reference's scanner exactly: on an invalid sequence only ONE
    byte is consumed; on truncation at end-of-input the remainder is dropped
    after a single '?'.
    """
    if isinstance(data, str):
        data = data.encode("utf-8", errors="replace")
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c < 0x80:
            out.append(c)
            i += 1
            continue
        if (c & 0xE0) == 0xC0:
            ln = 2
        elif (c & 0xF0) == 0xE0:
            ln = 3
        elif (c & 0xF8) == 0xF0:
            ln = 4
        else:
            out += b"?"
            i += 1
            continue
        if i + ln > n:
            out += b"?"
            break
        if all((data[i + j] & 0xC0) == 0x80 for j in range(1, ln)):
            out += data[i : i + ln]
            i += ln
        else:
            out += b"?"
            i += 1
    return out.decode("utf-8", errors="replace")


def extract_json_value(json_line: str, key: str) -> str:
    """Naive string-scan JSON field extraction (with/without space after the
    colon), sanitized — the reference's fast path for ND-JSON CDX rows."""
    search = f'"{key}": "'
    start = json_line.find(search)
    if start == -1:
        search = f'"{key}":"'
        start = json_line.find(search)
        if start == -1:
            return ""
    start += len(search)
    end = json_line.find('"', start)
    if end == -1:
        return ""
    return sanitize_utf8(json_line[start:end])


def parse_cdx_timestamp(cdx_timestamp: str) -> datetime | None:
    """Strict 14-char YYYYMMDDhhmmss → UTC datetime; epoch on error (the
    reference returns timestamp 0 — we map that to epoch)."""
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    if len(cdx_timestamp) != 14:
        return epoch
    try:
        return datetime.strptime(cdx_timestamp, "%Y%m%d%H%M%S").replace(tzinfo=timezone.utc)
    except ValueError:
        return epoch


def parse_iso8601(iso_timestamp: str) -> datetime | None:
    """ISO-8601 'YYYY-MM-DDTHH:MM:SS' → UTC datetime; epoch on bad input."""
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    if len(iso_timestamp) < 19:
        return epoch
    try:
        return datetime.strptime(iso_timestamp[:19], "%Y-%m-%dT%H:%M:%S").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return epoch
