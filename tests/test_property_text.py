"""Property-based tests (hypothesis) for the parity-critical text utilities:
these functions gate byte-level behavior the reference defines exactly, so we
pin invariants over the whole input space, not just examples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_cloudflare_spark.util.text import (
    like_to_regex,
    parse_cdx_timestamp,
    sanitize_utf8,
    sql_wildcards_to_cdx,
    to_cdx_timestamp,
)


@given(st.binary(max_size=300))
@settings(max_examples=200)
def test_sanitize_utf8_always_valid_utf8(data):
    out = sanitize_utf8(data)
    # output must always round-trip as strict UTF-8
    out.encode("utf-8").decode("utf-8")


@given(st.binary(max_size=300))
@settings(max_examples=200)
def test_sanitize_utf8_idempotent(data):
    once = sanitize_utf8(data)
    assert sanitize_utf8(once.encode("utf-8")) == once


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_sanitize_utf8_valid_text_unchanged(text):
    # surrogates can't encode; hypothesis text() excludes them by default
    assert sanitize_utf8(text.encode("utf-8")) == text


@given(st.datetimes(min_value=__import__("datetime").datetime(1980, 1, 1),
                    max_value=__import__("datetime").datetime(2099, 12, 31)))
@settings(max_examples=200)
def test_cdx_timestamp_roundtrip(dt):
    # format a full 14-digit stamp, parse it back (second precision)
    stamp = dt.strftime("%Y%m%d%H%M%S")
    parsed = parse_cdx_timestamp(stamp)
    assert parsed.strftime("%Y%m%d%H%M%S") == stamp


@given(st.datetimes(min_value=__import__("datetime").datetime(1980, 1, 1),
                    max_value=__import__("datetime").datetime(2099, 12, 31)))
@settings(max_examples=200)
def test_to_cdx_strip_preserves_prefix_semantics(dt):
    # stripped form is a PREFIX of the full stamp and never below 4 chars
    full = dt.strftime("%Y-%m-%d %H:%M:%S")
    out = to_cdx_timestamp(full)
    digits = dt.strftime("%Y%m%d%H%M%S")
    assert digits.startswith(out)
    assert len(out) >= 4
    # only trailing zeros were stripped
    assert digits[len(out):] == "" or set(digits[len(out):]) == {"0"}


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60))
@settings(max_examples=200)
def test_like_to_regex_anchoring(pattern):
    # anchored except where a leading/trailing % makes the anchor redundant
    # (reference LikeToRegex drops it there)
    rx = like_to_regex(pattern)
    assert rx.startswith("^") or pattern.startswith("%")
    assert rx.endswith("$") or pattern.endswith("%")


@given(st.text(alphabet="abc%_*?", max_size=40))
@settings(max_examples=200)
def test_sql_wildcards_total(pattern):
    out = sql_wildcards_to_cdx(pattern)
    assert "%" not in out and "_" not in out
    assert len(out) == len(pattern)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40))
@settings(max_examples=300)
def test_escape_cdx_regex_matches_literal(value):
    # The escaped form, with the CDX %5C unescaped back to a backslash, must
    # FULL-match exactly the literal value (backslashes dropped — the
    # reference's EscapeRegex consumes them) and nothing else interpretable:
    # this is the property whose absence made absorbed filters widen results.
    import re

    from duckdb_cloudflare_spark.util.text import escape_cdx_regex

    literal = value.replace("\\", "")
    if "(" in literal or ")" in literal:
        # () deliberately unescaped (reference quirk: urlkey uses ')' and the
        # backend tolerates it) — the regex is not literal-safe there
        return
    escaped = escape_cdx_regex(value).replace("%5C", "\\")
    assert re.fullmatch(escaped, literal), (value, escaped)


@given(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20),
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20),
)
@settings(max_examples=300)
def test_escape_cdx_regex_no_false_positive(value, other):
    import re

    from duckdb_cloudflare_spark.util.text import escape_cdx_regex

    literal = value.replace("\\", "")
    target = other.replace("\\", "")
    if "(" in literal or ")" in literal or target == literal:
        return
    escaped = escape_cdx_regex(value).replace("%5C", "\\")
    assert not re.fullmatch(escaped, target), (value, other, escaped)


class TestCollapseMappingProperties:
    """Invariants of the DISTINCT ON → collapse expression analysis."""

    @given(
        col=st.sampled_from(
            ["urlkey", "timestamp", "digest", "length", "statuscode", "mimetype", "url"]
        ),
        n=st.integers(min_value=1, max_value=99),
    )
    def test_prefix_forms_agree(self, col, n):
        from duckdb_cloudflare_spark.sources.api import distinct_on_to_collapse as m

        expected_field = "original" if col == "url" else col
        assert m(f"substr({col}, 1, {n})") == f"{expected_field}:{n}"
        assert m(f"{col}[:{n}]") == f"{expected_field}:{n}"
        assert m(f"{col}[1:{n}]") == f"{expected_field}:{n}"
        # bare column: full-value collapse
        assert m(col) == expected_field

    @given(name=st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True))
    def test_unknown_columns_abandon_not_raise(self, name):
        from duckdb_cloudflare_spark.sources.api import distinct_on_to_collapse as m

        if name.lower() in (
            "urlkey", "timestamp", "digest", "length", "statuscode",
            "mimetype", "url", "year",
        ):
            assert m(name) is not None
        elif name.lower() == "month":
            import pytest

            with pytest.raises(ValueError):
                m(name)
        else:
            assert m(name) is None


class TestReplaceRewriteProperties:
    @given(
        col=st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
        fn=st.sampled_from(["lower", "upper", "trim"]),
    )
    def test_single_item_shape(self, col, fn):
        from duckdb_cloudflare_spark.compat import rewrite_replace

        out = rewrite_replace(f"SELECT * REPLACE ({fn}({col}) AS {col}) FROM t")
        assert out == f"SELECT * EXCEPT ({col}), {fn}({col}) AS {col} FROM t"
        # idempotent on the rewritten form (no REPLACE remains)
        assert rewrite_replace(out) == out
