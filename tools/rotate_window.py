#!/usr/bin/env python
"""Compute the next round's CORRECTNESS_WINDOW — the mechanical half of the
rotation that SURVEY §10.2 requires in each round's FIRST commit.

    python tools/rotate_window.py [next_round]

Prints a ready-to-paste Python list: the 13 pinned SMT reference-parity
rows, then every never-recorded registry row (new rows always outrank
re-records), then the least-recently-recorded rows in registry order until
the window holds 50. The selection rule is EXACTLY the one
``tests/test_registry_order.py`` guards, so the pasted window passes the
guard by construction; the human steps that remain are pasting the list,
bumping ``CORRECTNESS_WINDOW_ROUND``, and REORDERING the ``queries()``
dict so the window is its first 50 keys (the driver hashes dict order).

``next_round`` defaults to (newest committed CORRECTNESS record) + 1.
Records whose round equals ``next_round`` are excluded from staleness, the
same exclusion the guard test applies to the in-flight round.

Intra-window order beyond the 13-row SMT prefix is free — the guards and
the driver's hash care about MEMBERSHIP and the window being the first 50
``queries()`` keys, not the order within; this tool emits never-recorded
rows before re-records (the §10.2 priority, which is also the selection
rule), while some hand-built windows historically interleaved them.
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SMT_CORE = [
    "smt_drop_struct", "smt_drop_subtree", "smt_drop_json_schema",
    "smt_drop_json_udf", "smt_hoist_struct", "smt_hoist_null_inner",
    "smt_hoist_json_wrap", "smt_hoist_json_keep", "smt_to_json_map",
    "smt_chain_envelope", "stream_chain_envelope", "kafka_roundtrip",
    "smt_mixed_chain",
]
WINDOW_SIZE = 50


def last_recorded(excluded_round: int) -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if m is None:
            continue  # *_repro and other suffixed files are not driver records
        rnum = int(m.group(1))
        if rnum == excluded_round:
            continue
        with open(path) as f:
            for key in json.load(f):
                last[key] = max(last.get(key, 0), rnum)
    return last


def main(argv: list[str]) -> int:
    import __spark_entry__ as entry_mod

    rounds = [
        int(m.group(1))
        for p in glob.glob(str(REPO / "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    if len(argv) > 1:
        next_round = int(argv[1])
    elif rounds:
        next_round = max(rounds) + 1
    else:
        print(
            "no committed CORRECTNESS_r*.json records to infer the round "
            "from — pass next_round explicitly: "
            "python tools/rotate_window.py <next_round>",
            file=sys.stderr,
        )
        return 1
    last = last_recorded(next_round)
    registry = list(entry_mod.queries().keys())

    never = [k for k in registry if k not in last and k not in SMT_CORE]
    fill_budget = WINDOW_SIZE - len(SMT_CORE) - len(never)
    if fill_budget < 0:
        print(
            f"never-recorded backlog ({len(never)}) exceeds the "
            f"{WINDOW_SIZE - len(SMT_CORE)} fill slots — registry grew past "
            "the per-round cap",
            file=sys.stderr,
        )
        return 1
    candidates = sorted(
        (k for k in registry if k in last and k not in SMT_CORE),
        key=lambda k: (last[k], registry.index(k)),
    )
    fills = candidates[:fill_budget]
    window = SMT_CORE + never + fills

    by_round: dict[int, int] = {}
    for k in fills:
        by_round[last[k]] = by_round.get(last[k], 0) + 1
    print(
        f"# CORRECTNESS_WINDOW for round {next_round}: 13 SMT + "
        f"{len(never)} never-recorded + fills {by_round} "
        "(least-recently-recorded, registry order)",
        file=sys.stderr,
    )
    print(f"CORRECTNESS_WINDOW_ROUND = {next_round}\n")
    print("CORRECTNESS_WINDOW = [")
    for k in window:
        print(f'    "{k}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
