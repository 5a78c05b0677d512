"""Pin the registry's first-50 window: the correctness driver hashes the
FIRST 50 keys of queries() in dict order (verified in the round-3 verdict).
The window ROTATES each round so every registry entry eventually gets an
official CORRECTNESS record: the 13 SMT reference-parity rows stay pinned
every round, and the other 37 slots hold rows never yet recorded in any
committed CORRECTNESS_r*.json."""

import glob
import json
import os

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMT_CORE = [
    "smt_drop_struct", "smt_drop_subtree", "smt_drop_json_schema",
    "smt_drop_json_udf", "smt_hoist_struct", "smt_hoist_null_inner",
    "smt_hoist_json_wrap", "smt_hoist_json_keep", "smt_to_json_map",
    "smt_chain_envelope", "stream_chain_envelope", "kafka_roundtrip",
    "smt_mixed_chain",
]


def test_window_is_the_first_50_keys():
    keys = list(entry_mod.queries().keys())
    assert len(entry_mod.CORRECTNESS_WINDOW) == 50
    assert keys[:50] == entry_mod.CORRECTNESS_WINDOW


def test_window_leads_with_smt_parity_core():
    assert entry_mod.CORRECTNESS_WINDOW[:13] == SMT_CORE


def test_window_fill_rows_are_never_officially_recorded():
    """Every non-SMT slot must be a row absent from committed
    CORRECTNESS_r*.json files — the whole point of the rotation.

    The NEWEST record is excluded when its key set equals the current
    window: that file is the record OF this window (the driver writes
    it after the builder pins the window), not a staleness signal.
    Older records are never excluded, so a window left unrotated for a
    full round (its rows now in round N-1's record too) still fails."""
    paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    window = set(entry_mod.CORRECTNESS_WINDOW)
    recorded: set[str] = set()
    for i, path in enumerate(paths):
        with open(path) as f:
            keys = set(json.load(f).keys())
        if i == len(paths) - 1 and keys == window:
            continue  # this round's own record, not staleness
        recorded |= keys
    stale = [
        k for k in entry_mod.CORRECTNESS_WINDOW[13:] if k in recorded
    ]
    assert stale == [], stale


def test_first_50_all_have_oracles_or_documented_weak():
    """Rows without an oracle get the driver's weaker rows-only check;
    keep them rare and intentional inside the window."""
    oracles = entry_mod.oracle_sql()
    missing = [k for k in entry_mod.CORRECTNESS_WINDOW if k not in oracles]
    assert missing == [], missing


def test_no_duplicate_keys_and_all_callable():
    q = entry_mod.queries()
    assert len(q) == len(set(q))
    assert all(callable(v) for v in q.values())
    assert len(set(entry_mod.CORRECTNESS_WINDOW)) == 50
