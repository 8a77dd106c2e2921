"""Property tests for the compat-layer rewrites added in the r4
continuation: the rewriters must (a) never touch string literals, (b) be
idempotent where re-application is possible, and (c) keep balanced-paren /
quoted-argument structure intact for arbitrary argument expressions."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_cloudflare_spark.compat import (
    rewrite_function_names,
    rewrite_list_exprs,
    rewrite_named_args,
)

# Identifier-ish / expression-ish fragments that may appear as arguments,
# including nested calls, commas inside strings, and doubled quotes.
_ARG = st.sampled_from([
    "x", "t.col", "f(y)", "g(a, b)", "'lit,with,commas'", "'it''s'",
    "l[1]", "CASE WHEN a THEN b ELSE c END", "1 + 2", "arr",
])


@given(_ARG, _ARG)
@settings(max_examples=200, deadline=None)
def test_named_args_rewrite_structure(a, b):
    sql = f"SELECT * FROM fn(p := {a}, q := {b})"
    out = rewrite_named_args(sql)
    # every top-level := becomes => and nothing else changes
    assert out == sql.replace(":=", "=>") if "'" not in sql else True
    # quotes and parens survive untouched
    assert out.count("(") == sql.count("(") and out.count(")") == sql.count(")")
    assert out.count("'") == sql.count("'")
    # idempotent: nothing left to rewrite
    assert rewrite_named_args(out) == out


@given(st.text(alphabet="ab:=' (),", max_size=60))
@settings(max_examples=300, deadline=None)
def test_named_args_never_edits_string_literals(s):
    out = rewrite_named_args(s)
    # a := inside a properly-quoted literal survives; we can't easily parse
    # arbitrary soup, but invariants hold: length unchanged (:= → => is
    # 1:1) and quote count unchanged
    assert len(out) == len(s)
    assert out.count("'") == s.count("'")


@given(_ARG, _ARG)
@settings(max_examples=200, deadline=None)
def test_list_contains_rewrite_keeps_args_verbatim(a, v):
    sql = f"SELECT list_contains({a}, {v}) FROM t"
    out = rewrite_list_exprs(sql)
    assert "list_contains" not in out
    assert "array_position(" in out
    # argument text embedded verbatim
    assert a in out and v in out
    assert rewrite_list_exprs(out) == out  # idempotent


@given(_ARG, _ARG)
@settings(max_examples=200, deadline=None)
def test_list_has_any_rewrite_keeps_args_verbatim(a, b):
    sql = f"SELECT list_has_any({a}, {b}) FROM t"
    out = rewrite_list_exprs(sql)
    assert "list_has_any" not in out
    assert "array_intersect(filter(" in out
    assert a in out and b in out
    assert rewrite_list_exprs(out) == out


@given(_ARG)
@settings(max_examples=100, deadline=None)
def test_list_first_last_rewrite(a):
    out = rewrite_list_exprs(f"SELECT list_first({a}), list_last({a}) FROM t")
    assert f"try_element_at({a}, 1)" in out
    assert f"try_element_at({a}, -1)" in out


@given(st.sampled_from(["starts_with", "ends_with", "regexp_split_to_array",
                        "list_pack", "array_reverse", "list_position"]))
@settings(max_examples=50, deadline=None)
def test_alias_rewrites_only_call_sites(fn):
    # bare identifier (not a call) and string-literal occurrences untouched
    sql = f"SELECT {fn}, '{fn}(x)' AS s, {fn}(a, b) FROM t"
    out = rewrite_function_names(sql)
    assert out.startswith(f"SELECT {fn}, '{fn}(x)' AS s, ")
    assert f"{fn}(a, b)" not in out  # the call site was rewritten


# ---------------------------------------------------------------------------
# rewrite_scan_limit robustness (r11): it runs on EVERY duck_sql call, so
# it must never raise on arbitrary input and must be a no-op unless the
# exact pushdown shape is present; injection must be idempotent.
# ---------------------------------------------------------------------------


@given(st.text(alphabet=st.sampled_from(list(
    "SELECT FROM limit() '\"*,;=><:0123456789abcwhere_"
)), max_size=120))
@settings(max_examples=400, deadline=None)
def test_rewrite_scan_limit_never_raises_on_garbage(s):
    from duckdb_cloudflare_spark.compat import rewrite_scan_limit

    out = rewrite_scan_limit(s)
    assert isinstance(out, str)
    # untouched unless BOTH a known scan function and LIMIT appear
    low = s.lower()
    if not (("common_crawl_index" in low or "wayback_machine" in low
             or "d1_scan" in low) and "limit" in low):
        assert out == s


@given(
    st.sampled_from(["common_crawl_index", "wayback_machine", "d1_scan"]),
    st.integers(min_value=1, max_value=10_000),
    st.sampled_from(["", " t", " AS t"]),
)
@settings(max_examples=100, deadline=None)
def test_rewrite_scan_limit_injection_is_idempotent(fn, n, alias):
    from duckdb_cloudflare_spark.compat import rewrite_scan_limit

    sql = f"SELECT * FROM {fn}(url => 'x'){alias} LIMIT {n}"
    once = rewrite_scan_limit(sql)
    assert once != sql and f"=> {n}" in once
    assert rewrite_scan_limit(once) == once  # option now present → no-op
    assert once.rstrip().upper().endswith(f"LIMIT {n}")
