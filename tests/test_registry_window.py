"""The driver grades the FIRST 50 registry entries; this pins the r7 window
composition exactly, so an innocent-looking registration change cannot
silently rotate an unvetted query into (or a vetted one out of) the graded
prefix. Update deliberately when applying the documented rotation plan."""

from __future__ import annotations

from duckdb_cloudflare_spark import queries as Q


def test_graded_window_is_exactly_the_r7_rotation():
    names = list(Q.all_queries())
    window = names[:50]
    expected = (
        # new r7 operators (zero driver history) lead
        ["p62_", "p63_", "p64_", "p65_", "p66_", "p67_", "p68_", "p69_"]
        # stalest green (r3; missed by the r5/r6 rotations — ADVICE r6)
        + ["q44_"]
        # rest of the r4-graded set per the documented plan
        + [f"p{n}_" for n in range(49, 55)]
        + ["q54_", "q55_"]
        # stalest r5-graded greens to fill 50
        + ["q36_", "q39_", "q52_"]
        + [f"p{n}_" for n in range(55, 62)]
        + ["q29_", "q30_", "q32_", "q33_", "q34_", "q35_", "q37_", "q51_"]
        + ["q01_"]
        + [f"p{n:02d}_" for n in range(1, 6)]
        + ["p11_", "p12_", "p13_"]
        + [f"p{n}_" for n in range(15, 20)]
        + ["p21_"]
    )
    assert len(window) == len(expected) == 50
    for name, prefix in zip(window, expected):
        assert name.startswith(prefix), (name, prefix)
    # every windowed entry must be oracle-bearing (window invariant since r4)
    oracles = Q.all_oracles()
    assert all(n in oracles for n in window)


def test_rows_only_entries_sort_last():
    # The driver emits `err: no_oracle` for rows-only entries; they must
    # never be adjacent to the window boundary. The reorder pushes them to
    # the absolute end of the registry.
    names = list(Q.all_queries())
    oracles = Q.all_oracles()
    rows_only = [n for n in names if n not in oracles]
    assert rows_only == names[-len(rows_only):]


def test_post_window_entries_all_locally_gated():
    # Post-window entries are only safe to rotate out because the local
    # gate verifies the FULL registry: assert the gate's source of truth
    # (all_queries) and the declared inventory agree in size.
    names = list(Q.all_queries())
    assert len(names) >= 116  # grows monotonically; never silently shrinks
