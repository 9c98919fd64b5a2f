"""Adapter-surface guards: the driver consumes __spark_entry__.py's
queries()/oracle_sql() dicts and proves the FIRST 50 keys each round —
a typo in the rotation sets or a missing oracle entry silently burns a
round's worth of driver budget, so lock the contract here."""

from __future__ import annotations

import importlib.util
import os

from datapipeline_scripts_spark.registry import all_queries


def _entry_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_added_r3_keys_all_registered():
    mod = _entry_module()
    specs = all_queries()
    missing = sorted(k for k in mod._ADDED_R3 if k not in specs)
    assert not missing, f"_ADDED_R3 names unregistered keys: {missing}"


def test_added_r8_keys_registered_and_lead_the_window():
    """Round-8 flip (VERDICT r7 item 1): the five staged keys are
    registered, named in _ADDED_R8, and — having no driver evidence —
    occupy the front of the 50-key window."""
    mod = _entry_module()
    specs = all_queries()
    missing = sorted(k for k in mod._ADDED_R8 if k not in specs)
    assert not missing, f"_ADDED_R8 names unregistered keys: {missing}"
    proven = mod._driver_proven_keys()
    head = mod._ordered_keys()[:50]
    unproven_new = sorted(mod._ADDED_R8 - set(proven))
    stragglers = [k for k in unproven_new if k not in head]
    assert not stragglers, f"new keys outside the driver window: {stragglers}"


def test_added_r9_keys_registered_and_lead_the_window():
    """Round-9 flip (VERDICT r8 item 1): the eight staged keys are
    registered, named in _ADDED_R9, and — having no driver evidence —
    occupy the front of the 50-key window."""
    mod = _entry_module()
    specs = all_queries()
    missing = sorted(k for k in mod._ADDED_R9 if k not in specs)
    assert not missing, f"_ADDED_R9 names unregistered keys: {missing}"
    proven = mod._driver_proven_keys()
    head = mod._ordered_keys()[:50]
    unproven_new = sorted(mod._ADDED_R9 - set(proven))
    stragglers = [k for k in unproven_new if k not in head]
    assert not stragglers, f"new keys outside the driver window: {stragglers}"


def test_proven_tail_ordered_stalest_evidence_first():
    """VERDICT r7 item 2 + r9 latest-round fix: with the backlog
    empty, the window's spare slots must refresh the STALEST driver
    evidence — the proven tail is sorted by LATEST-proven round,
    ascending. (Earliest-proven would pin the same keys in the window
    every round, since a re-proof never changes a key's earliest.)"""
    mod = _entry_module()
    proven = mod._driver_proven_keys()
    ordered = mod._ordered_keys()
    tail_rounds = [proven[k] for k in ordered if k in proven]
    assert tail_rounds == sorted(tail_rounds), (
        "proven tail is not oldest-evidence-first"
    )
    # the age map itself must be non-trivial: the stalest evidence
    # leads the tail
    if tail_rounds:
        assert tail_rounds[0] == min(proven.values())


def test_spare_window_slots_land_on_stalest_cohort():
    """The measurable point of the latest-first fix: the re-proof
    slots in the 50-key window (whatever remains after the unproven
    head) must all sit inside the stalest cohort — no slot may hold a
    key whose evidence is fresher than some key left outside the
    window."""
    mod = _entry_module()
    proven = mod._driver_proven_keys()
    ordered = mod._ordered_keys()
    window, outside = ordered[:50], ordered[50:]
    in_rounds = [proven[k] for k in window if k in proven]
    out_rounds = [proven[k] for k in outside if k in proven]
    if in_rounds and out_rounds:
        assert max(in_rounds) <= min(out_rounds), (
            "window re-proves fresher evidence than what it leaves out"
        )


def test_every_query_has_an_oracle():
    # round-2 milestone: zero rows-only entries — keep it that way
    specs = all_queries()
    rows_only = sorted(k for k, s in specs.items() if s.oracle is None)
    assert not rows_only, f"queries without a DuckDB oracle: {rows_only}"


def test_entry_exports_cover_registry():
    mod = _entry_module()
    q = mod.queries()
    o = mod.oracle_sql()
    specs = all_queries()
    assert set(q) == set(specs), "queries() must export the whole registry"
    assert set(o) == set(specs), "oracle_sql() must cover every exported key"
    # rotation sanity: first-50 window contains no already-proven key
    # unless everything is proven (late rounds)
    proven = mod._driver_proven_keys()
    head = list(q)[:50]
    unproven_total = len([k for k in specs if k not in proven])
    if unproven_total >= 50:
        overlap = [k for k in head if k in proven]
        assert not overlap, f"rotation wastes driver budget on proven keys: {overlap}"


def test_rotation_puts_every_unproven_key_first():
    """The end-game invariant the whole backlog drain rides on
    (VERDICT r05 item 7): NO proven key may be ordered before ANY
    unproven key, so the driver's 50-key window is spent entirely on
    the keys with the least evidence — including the <50-remaining
    tail round, which the window-overlap check above can't see."""
    mod = _entry_module()
    proven = mod._driver_proven_keys()
    ordered = mod._ordered_keys()
    first_proven_pos = next(
        (i for i, k in enumerate(ordered) if k in proven), len(ordered)
    )
    stragglers = [k for k in ordered[first_proven_pos:] if k not in proven]
    assert not stragglers, (
        f"unproven keys ordered BEHIND a proven key (driver budget wasted): {stragglers}"
    )
    # and the parsed evidence itself must be non-trivial: the rotation
    # reads CORRECTNESS_r*.json at import, so an accidental rename/move
    # of those files would silently reset the whole rotation
    assert len(proven) >= 246, (
        f"driver-proven set shrank to {len(proven)} — CORRECTNESS_r*.json "
        "files missing or unreadable?"
    )
