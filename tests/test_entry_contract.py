"""Driver-contract invariants for __spark_entry__ — the composition
of the 50-entry driver window is DERIVED from section lists; these
assertions keep the rotation policy honest (the round-3 ADVICE found
hand-kept counts drifting from the lists)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_driver_order_is_consistent():
    order = entry_mod._DRIVER_ORDER
    assert len(order) == len(set(order)), "duplicate entry names"
    sections = (
        entry_mod._NEW_THIS_ROUND
        + entry_mod._STALE_PREV
        + entry_mod._NEW_BEHIND
        + entry_mod._STALE_SPILL
        + entry_mod._FRESH_PREV
    )
    assert sorted(sections) == sorted(order)
    # every section is disjoint from the others
    assert len(sections) == len(set(sections))


def test_driver_window_contains_new_and_stale_first():
    """The refresh policy: every never-checked entry and every entry
    whose last driver row is oldest must sit INSIDE the 50-entry
    window (any stale entries that cannot fit are explicitly listed
    in _STALE_SPILL, to front the NEXT round's window)."""
    order = entry_mod._DRIVER_ORDER
    window = set(order[: entry_mod._DRIVER_WINDOW])
    assert set(entry_mod._NEW_THIS_ROUND) <= window
    assert set(entry_mod._STALE_PREV) <= window
    # the window is exactly full: new + stale = 50, nothing wasted
    assert (
        len(entry_mod._NEW_THIS_ROUND) + len(entry_mod._STALE_PREV)
        == entry_mod._DRIVER_WINDOW
    )
    # spilled stale entries sit IMMEDIATELY behind the window, ahead
    # of everything fresher, so they open the next round's window
    n_front = len(entry_mod._NEW_THIS_ROUND) + len(
        entry_mod._STALE_PREV
    ) + len(entry_mod._NEW_BEHIND)
    behind = order[n_front : n_front + len(entry_mod._STALE_SPILL)]
    assert behind == entry_mod._STALE_SPILL


def test_core_entries_always_in_window():
    """CORE policy (round 6 on): the ~10 most load-bearing entries —
    one per family — are pinned inside the driver window every round,
    so the flagship plans never carry stale driver evidence."""
    order = entry_mod._DRIVER_ORDER
    window = set(order[: entry_mod._DRIVER_WINDOW])
    assert set(entry_mod._CORE) <= window, (
        f"core entries outside the driver window: "
        f"{set(entry_mod._CORE) - window}"
    )


def test_queries_and_oracles_cover_driver_order():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert list(qs) == entry_mod._DRIVER_ORDER
    # every windowed entry has a value oracle (the driver records a
    # weaker rows-only check otherwise)
    window = entry_mod._DRIVER_ORDER[: entry_mod._DRIVER_WINDOW]
    missing = [n for n in window if n not in sqls]
    assert not missing, f"windowed entries without oracles: {missing}"
