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
        + entry_mod._FRESH_PREV
    )
    assert sorted(sections) == sorted(order)
    # every section is disjoint from the others
    assert len(sections) == len(set(sections))


def test_driver_window_contains_new_and_stale_first():
    """The refresh policy: every never-checked entry and every entry
    whose last driver row is oldest must sit INSIDE the 50-entry
    window; the window is filled to exactly 50 with core entries."""
    order = entry_mod._DRIVER_ORDER
    window = set(order[: entry_mod._DRIVER_WINDOW])
    assert set(entry_mod._NEW_THIS_ROUND) <= window
    assert set(entry_mod._STALE_PREV) <= window
    spill = (
        len(entry_mod._NEW_THIS_ROUND) + len(entry_mod._STALE_PREV)
        - entry_mod._DRIVER_WINDOW
    )
    assert spill <= 0, (
        f"new+stale exceed the driver window by {spill} — split the "
        "stale refresh across rounds"
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
