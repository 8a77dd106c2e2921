"""The driver grades the FIRST 50 registry entries; this pins the r4 window
composition exactly, so an innocent-looking registration change cannot
silently rotate an unvetted query into (or a vetted one out of) the graded
prefix. Update deliberately when applying the documented rotation plan."""

from __future__ import annotations

from duckdb_cloudflare_spark import queries as Q


def test_graded_window_is_exactly_the_r4_rotation():
    names = list(Q.all_queries())
    window = names[:50]
    expected = (
        [f"p{n}_" for n in range(34, 55)]      # 21 zero-history pipeline ops
        + ["q54_", "q55_"]                     # zero-history relational
        + [f"q{n:02d}_" for n in range(2, 29)]  # stalest graded (last r2)
    )
    assert len(window) == len(expected) == 50
    for name, prefix in zip(window, expected):
        assert name.startswith(prefix), (name, prefix)
    # every windowed entry must be oracle-bearing (the r4 window guarantee)
    oracles = Q.all_oracles()
    assert all(n in oracles for n in window)


def test_post_window_entries_all_locally_gated():
    # Post-window entries are only safe to rotate out because the local
    # gate verifies the FULL registry: assert the gate's source of truth
    # (all_queries) and the declared inventory agree in size.
    names = list(Q.all_queries())
    assert len(names) >= 114  # grows monotonically; never silently shrinks
