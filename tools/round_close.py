#!/usr/bin/env python
"""Executable round-close checklist (SURVEY.md §10).

Runs the fast process gates in one command and prints PASS/FAIL per step:

  1. guard tests   — registry window + contract + bench-guard unit tests
  2. TWS probe     — is google.protobuf still absent? (informational)
  3. bench guard   — compare a bench result against the committed baseline
                     (pass a file produced by `bench.py | tail -1`, or
                     --run-bench to measure now; skipped if neither given)

Slow gates (full pytest suite, sf0.01 oracle sweep, idle n=5 bench) stay
manual — see SURVEY §10 steps 7-8.

Usage:
    python tools/round_close.py [/tmp/bench_now.json] [--run-bench]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GUARD_TESTS = [
    "tests/test_registry_order.py",
    "tests/test_contract.py",
    "tests/test_bench_guard.py",
]


def step(name: str, ok: bool, detail: str = "") -> bool:
    print(f"[{'PASS' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
    return ok


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--run-bench"]
    run_bench = "--run-bench" in sys.argv[1:]
    ok = True

    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *GUARD_TESTS],
        cwd=REPO, capture_output=True, text=True,
    )
    tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else r.stderr[-200:]
    ok &= step("guard tests (registry window / contract / bench-guard)",
               r.returncode == 0, tail)

    try:
        # find_spec raises ModuleNotFoundError when the parent 'google'
        # namespace package itself is absent (the normal state here)
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    # informational either way: absence keeps the TWS wiring guarded;
    # presence means SURVEY §10 step 4 applies (flip to a real TWS row)
    step("TWS probe", True,
         "google.protobuf AVAILABLE — wire transformWithStateInPandas (SURVEY §10.4)"
         if has_protobuf else "google.protobuf still absent — guard stands")

    if args or run_bench:
        cmd = [sys.executable, os.path.join(REPO, "tools", "bench_guard.py"), *args[:1]]
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else r.stderr[-200:]
        ok &= step("bench guard", r.returncode == 0, tail)
    else:
        step("bench guard", True,
             "SKIPPED — pass a bench JSON file or --run-bench (SURVEY §10.8)")

    print("round_close:", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
