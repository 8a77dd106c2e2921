"""Hypothesis property suite for the PSL matcher (operators/psl.py):
structural invariants that must hold for ANY host under ANY rule set —
the algorithm is pure Python inside the pandas UDF, so the properties run
engine-free on `_CompiledRules.registrable` directly (the UDF only maps
it over a series)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_cloudflare_spark.operators.psl import (
    SNAPSHOT_RULES,
    _CompiledRules,
)

_RULES = _CompiledRules(SNAPSHOT_RULES)

_label = st.text("abcxyz09-", min_size=1, max_size=6).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
# bias toward suffixes the snapshot actually contains + plain TLDs
_tld = st.sampled_from(
    ["com", "org", "io", "uk", "jp", "br", "ck", "us", "mx", "np", "dev"]
)
_host = st.builds(
    lambda labels, tld: ".".join(labels + [tld]),
    st.lists(_label, min_size=0, max_size=4),
    _tld,
)


@given(_host)
@settings(max_examples=300, deadline=None)
def test_registrable_is_a_label_aligned_suffix(h):
    out = _RULES.registrable(h)
    assert h.endswith(out)
    assert h == out or h[-len(out) - 1] == "."


@given(_host)
@settings(max_examples=300, deadline=None)
def test_registrable_is_idempotent(h):
    out = _RULES.registrable(h)
    assert _RULES.registrable(out) == out


@given(st.lists(_label, min_size=2, max_size=5))
@settings(max_examples=200, deadline=None)
def test_implicit_star_gives_last_two_labels(labels):
    """Hosts under TLDs with NO snapshot rule fall to the implicit '*':
    registrable = last 2 labels — exactly the LITE default's base case."""
    h = ".".join(labels + ["dev"])  # 'dev' has no snapshot rules
    assert _RULES.registrable(h) == ".".join(labels[-1:] + ["dev"])


@given(st.lists(_label, min_size=1, max_size=3))
@settings(max_examples=200, deadline=None)
def test_exception_rule_dominates_wildcard(labels):
    """!www.ck beats *.ck: anything at or under www.ck keys as www.ck."""
    h = ".".join(labels + ["www", "ck"])
    assert _RULES.registrable(h) == "www.ck"


@given(_label, _label, st.lists(_label, min_size=0, max_size=2))
@settings(max_examples=200, deadline=None)
def test_wildcard_tld_suffix_is_two_labels_deep(a, b, subs):
    """Under *.ck (b != www), the public suffix is b.ck, so the
    registrable domain is always a.b.ck regardless of deeper subdomains."""
    if b == "www":
        return
    h = ".".join(subs + [a, b, "ck"])
    assert _RULES.registrable(h) == f"{a}.{b}.ck"


@given(st.lists(_label, min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_user_rules_are_a_complete_replacement(labels):
    """A caller-supplied rules list is COMPLETE (snapshot not merged):
    with an empty list every host keys by the implicit '*' alone."""
    empty = _CompiledRules([])
    h = ".".join(labels + ["uk"])
    want = ".".join((labels + ["uk"])[-2:])
    assert empty.registrable(h) == want
