"""Unit tests for util.text — parity with the reference's pure functions
(expectations derived from /root/reference test/sql/internet_archive_pushdown.test
and URL_GENERATION_TESTS.md)."""

from __future__ import annotations

from datetime import datetime, timezone

from duckdb_cloudflare_spark.util.text import (
    extract_json_value,
    like_to_regex,
    parse_cdx_timestamp,
    parse_iso8601,
    sanitize_utf8,
    sql_wildcards_to_cdx,
    to_cdx_timestamp,
)


class TestLikeToRegex:
    def test_contains(self):
        assert like_to_regex("%test%") == ".*test.*"

    def test_suffix(self):
        # urlkey LIKE '%apply' → .*apply$  (internet_archive_pushdown.test:197)
        assert like_to_regex("%apply") == ".*apply$"

    def test_prefix(self):
        assert like_to_regex("test%") == "^test.*"

    def test_underscore(self):
        assert like_to_regex("a_c") == "^a.c$"

    def test_parenthesis_not_escaped(self):
        # 'com,example)/%/%' → ^com,example)/.*/.*  (pushdown.test:232-242)
        assert like_to_regex("com,example)/%/%") == "^com,example)/.*/.*"

    def test_metachars_escaped_with_pct5c(self):
        assert like_to_regex("%a.b%") == ".*a%5C.b.*"
        assert like_to_regex("%x?%") == ".*x%5C?.*"

    def test_backslash_escape_passthrough(self):
        assert like_to_regex("a\\%b") == "^a%b$"


class TestToCdxTimestamp:
    def test_strip_trailing_zeros(self):
        # '2024-06-01 00:00:00' → '20240601'  (SURVEY §2.1)
        assert to_cdx_timestamp("2024-06-01 00:00:00") == "20240601"

    def test_keeps_year(self):
        # All-zero tail strips down to the 4-digit year floor.
        assert to_cdx_timestamp("20000000000000") == "2000"

    def test_truncate_to_14(self):
        assert to_cdx_timestamp("20240601123456789") == "20240601123456"

    def test_non_digits_removed(self):
        assert to_cdx_timestamp("2024-01-01") == "20240101"


class TestSqlWildcards:
    def test_pct_to_star(self):
        assert sql_wildcards_to_cdx("example.com/%") == "example.com/*"

    def test_underscore_to_question(self):
        assert sql_wildcards_to_cdx("a_b") == "a?b"


class TestSanitizeUtf8:
    def test_ascii_passthrough(self):
        assert sanitize_utf8(b"hello") == "hello"

    def test_valid_multibyte(self):
        assert sanitize_utf8("héllo→".encode()) == "héllo→"

    def test_invalid_start_byte(self):
        assert sanitize_utf8(b"a\xffb") == "a?b"

    def test_invalid_continuation(self):
        assert sanitize_utf8(b"a\xc3\x28b") == "a?(b"

    def test_truncated_sequence_at_end(self):
        assert sanitize_utf8(b"ab\xe2\x82") == "ab?"


class TestExtractJsonValue:
    def test_with_space(self):
        assert extract_json_value('{"url": "http://x.com"}', "url") == "http://x.com"

    def test_without_space(self):
        assert extract_json_value('{"url":"http://x.com"}', "url") == "http://x.com"

    def test_missing(self):
        assert extract_json_value('{"a": "b"}', "url") == ""


class TestParseTimestamps:
    def test_cdx_valid(self):
        assert parse_cdx_timestamp("20240601123456") == datetime(
            2024, 6, 1, 12, 34, 56, tzinfo=timezone.utc
        )

    def test_cdx_wrong_length_is_epoch(self):
        assert parse_cdx_timestamp("2024").year == 1970

    def test_cdx_garbage_is_epoch(self):
        assert parse_cdx_timestamp("2024060112345x").year == 1970

    def test_iso(self):
        assert parse_iso8601("2025-11-06T20:07:18") == datetime(
            2025, 11, 6, 20, 7, 18, tzinfo=timezone.utc
        )

    def test_iso_short_is_epoch(self):
        assert parse_iso8601("2025-11-06").year == 1970
