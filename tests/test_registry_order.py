"""Pin the registry's first-50 window: the correctness driver hashes the
FIRST 50 keys of queries() in dict order (verified in the round-3 verdict).
The window ROTATES each round so every registry entry periodically gets an
official CORRECTNESS record: the 13 SMT reference-parity rows stay pinned
every round; the other 37 slots hold every row never yet recorded, then
the least-recently-recorded rows (the round-7 rotation closed the
never-recorded backlog, so re-records are the steady state from here)."""

import glob
import os
import re
import sys

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from rotate_window import last_recorded as _tool_last_recorded  # noqa: E402

SMT_CORE = [
    "smt_drop_struct", "smt_drop_subtree", "smt_drop_json_schema",
    "smt_drop_json_udf", "smt_hoist_struct", "smt_hoist_null_inner",
    "smt_hoist_json_wrap", "smt_hoist_json_keep", "smt_to_json_map",
    "smt_chain_envelope", "stream_chain_envelope", "kafka_roundtrip",
    "smt_mixed_chain",
]


def _last_recorded() -> dict[str, int]:
    """Map each query name to the newest round whose committed
    CORRECTNESS_r*.json contains it — shared with tools/rotate_window.py
    (one implementation; a drift between the tool and these guards is
    impossible by construction). The record whose round number EQUALS
    ``CORRECTNESS_WINDOW_ROUND`` is excluded: that file is the record OF
    the current window (the driver writes it after the builder pins the
    window), not a staleness signal. The exclusion is keyed on the round
    NUMBER, not key-set equality, so a window left unrotated (and its
    round marker unbumped) is caught as soon as the next round's record
    lands: that record's round differs from the stale marker, so it
    counts, and the window's fill rows are suddenly the MOST-recently-
    recorded rows — failing
    ``test_window_fill_rows_are_least_recently_recorded`` below."""
    return _tool_last_recorded(entry_mod.CORRECTNESS_WINDOW_ROUND)


def test_window_is_the_first_50_keys():
    keys = list(entry_mod.queries().keys())
    assert len(entry_mod.CORRECTNESS_WINDOW) == 50
    assert keys[:50] == entry_mod.CORRECTNESS_WINDOW


def test_window_leads_with_smt_parity_core():
    assert entry_mod.CORRECTNESS_WINDOW[:13] == SMT_CORE


def test_window_round_marker_not_lagging():
    """The marker must be bumped with every rotation: once a record for
    round N exists, a window still marked N-1 (or older) means the
    rotation was skipped. The marker may run exactly one ahead of the
    newest record (the normal state while a round is in flight) — but
    never further: a marker past newest+1 would wrongly count this
    round's own record as staleness once it lands."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    assert rounds, "no committed CORRECTNESS records"
    assert max(rounds) <= entry_mod.CORRECTNESS_WINDOW_ROUND <= max(rounds) + 1


def test_window_contains_the_full_never_recorded_backlog():
    """Any registry row with NO official record (in counted rounds) must
    occupy a window slot — never-recorded rows always outrank
    re-records. (Since the round-7 rotation this set is empty unless a
    new query was added; the registry-growth cap in SURVEY §9 keeps it
    under one window.)"""
    last = _last_recorded()
    registry = list(entry_mod.queries().keys())
    never = [k for k in registry if k not in last]
    window = set(entry_mod.CORRECTNESS_WINDOW)
    assert len(never) <= 37, "backlog no longer fits one window"
    missing = [k for k in never if k not in window]
    assert missing == [], missing


def test_window_fill_rows_are_least_recently_recorded():
    """Every previously-recorded fill row must be at least as stale as
    every row LEFT OUT of the window: rotating in a recently-recorded
    row while a staler one waits outside defeats the rotation. Ties are
    fine (several rows share a last-recorded round); never-recorded
    rows are covered by the backlog test above."""
    last = _last_recorded()
    window = entry_mod.CORRECTNESS_WINDOW
    registry = list(entry_mod.queries().keys())
    re_recorded_fills = [k for k in window[13:] if k in last]
    outside = [k for k in registry if k not in set(window) and k in last]
    if re_recorded_fills and outside:
        newest_fill = max(last[k] for k in re_recorded_fills)
        stalest_outside = min(last[k] for k in outside)
        offenders = [
            (k, last[k]) for k in re_recorded_fills
            if last[k] > stalest_outside
        ]
        assert newest_fill <= stalest_outside, offenders


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


def test_rotate_window_tool_agrees_with_committed_window():
    """tools/rotate_window.py must select exactly the committed window's
    row SET for the current round (intra-window order beyond the SMT
    prefix is free) — the tool and these guards encode the same rule, and
    this pin catches them drifting apart."""
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, os.path.join(REPO, "tools", "rotate_window.py"),
         str(entry_mod.CORRECTNESS_WINDOW_ROUND)],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout
    ns: dict = {}
    exec(out, ns)  # the tool prints executable Python
    assert ns["CORRECTNESS_WINDOW_ROUND"] == entry_mod.CORRECTNESS_WINDOW_ROUND
    assert set(ns["CORRECTNESS_WINDOW"]) == set(entry_mod.CORRECTNESS_WINDOW)
    assert ns["CORRECTNESS_WINDOW"][:13] == SMT_CORE


def _round_close_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "round_close", os.path.join(REPO, "tools", "round_close.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_staleness_gate_on_synthetic_records():
    """The round_close staleness gate (r13 verdict): a row whose newest
    record is older than STALENESS_MAX_ROUNDS fails unless it sits in the
    current window; never-recorded rows fail the same way."""
    rc = _round_close_mod()
    registry = ["fresh", "aging", "stale", "rescued", "never", "new_in_window"]
    last = {"fresh": 13, "aging": 9, "stale": 8, "rescued": 8}
    window = ["rescued", "new_in_window"]
    out = rc.stale_rows(last, registry, window, window_round=14, max_age=5)
    # aging: 14-9=5 <= 5 ok; stale: 14-8=6 > 5 fails; rescued: in window;
    # never: no record and not in window; new_in_window: in window
    assert out == ["stale", "never"]


def test_staleness_gate_green_on_live_registry():
    """The invariant must HOLD right now — every registry row recorded
    within the ceiling or scheduled in the current window. If this fails
    the rotation fell behind; widen the window fills before round close."""
    rc = _round_close_mod()
    ok, detail = rc.registry_staleness_gate()
    assert ok, detail
