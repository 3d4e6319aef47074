"""Guards for the mechanical driver-window ordering of the oracle registry.

The driver records CORRECTNESS rows for only the first DRIVER_WINDOW (50)
queries() entries (VERDICT r04 "What's wrong" #1: a hand-maintained order let
an edited entry escape verification for a round). These tests pin the
invariants the ordering relies on — no Spark session needed."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry


def _changed_names():
    fns, sqls = entry._query_fns(), entry._oracle_sqls()
    manifest = entry.load_manifest()
    return {
        n
        for n in fns
        if n not in manifest
        or manifest[n].get("hash") != entry.definition_hash(n, fns, sqls)
    }


def test_changed_entries_fit_driver_window():
    """Every entry whose definition changed since its last driver
    verification must land inside the recorded window — if more than 50
    entries change in one round, some would silently go unverified and the
    round has to be split."""
    changed = _changed_names()
    assert len(changed) <= entry.DRIVER_WINDOW, (
        f"{len(changed)} changed/new entries exceed the driver's "
        f"{entry.DRIVER_WINDOW}-entry CORRECTNESS window: {sorted(changed)}"
    )
    order = entry.registry_order()
    positions = {n: i for i, n in enumerate(order)}
    outside = [n for n in changed if positions[n] >= entry.DRIVER_WINDOW]
    assert not outside, f"changed entries outside the driver window: {outside}"


def test_changed_entries_lead_the_order():
    order = entry.registry_order()
    changed = _changed_names()
    assert set(order[: len(changed)]) == changed


def test_unchanged_entries_rotate_oldest_first():
    """Beyond the changed block, entries are ordered by last-verified round
    ascending, so with <=2x window entries every one gets a fresh driver row
    within two rounds."""
    manifest = entry.load_manifest()
    order = entry.registry_order()
    changed = _changed_names()
    rounds = [manifest[n]["round"] for n in order if n not in changed]
    assert rounds == sorted(rounds)


def test_registries_align():
    qs = entry.queries()
    sqls = entry.oracle_sql()
    assert set(sqls) <= set(qs)
    # every operator claimed done has a value-level oracle (0 rows-only)
    assert set(sqls) == set(qs), sorted(set(qs) - set(sqls))
    # both present the same order to the driver
    assert [n for n in qs if n in sqls] == list(sqls)


def test_registry_rotation_period_bounded():
    """With a 50-entry window, every UNCHANGED entry must get a fresh
    driver row within ceil(total/window) rounds; cap that period at three
    rounds (<=3x window total) so a stale entry is never more than two
    rounds behind its last green driver row. Changed/new entries always
    verify in the very next round regardless (they lead the order —
    test_changed_entries_fit_driver_window); staleness beyond that is
    hash-pinned by the manifest: an entry without a fresh row is
    byte-identical to the definition the driver last verified."""
    assert len(entry._query_fns()) <= 3 * entry.DRIVER_WINDOW
