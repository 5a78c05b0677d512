"""Pin tools/bench_guard.py's baseline selection: the newest round wins,
and within a round a committed idle ``*_repro`` file outranks the official
record (official records can be taken under driver-machine load; the repro
files are quiesced reruns — see SURVEY §8)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_guard", os.path.join(REPO, "tools", "bench_guard.py")
)
bench_guard = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_guard)


def test_repro_outranks_same_round_official():
    paths = [
        "BENCH_r05.json",
        "BENCH_r06_repro.json",
        "BENCH_r06.json",
        "BENCH_r05_repro.json",
    ]
    ranked = sorted(paths, key=bench_guard._baseline_key)
    assert ranked == [
        "BENCH_r05.json",
        "BENCH_r05_repro.json",
        "BENCH_r06.json",
        "BENCH_r06_repro.json",
    ]
    # load_baseline walks reversed(sorted(...)) — the last element is
    # what it tries first
    assert ranked[-1] == "BENCH_r06_repro.json"


def test_unparseable_names_sort_first():
    key = bench_guard._baseline_key("BENCH_weird.json")
    assert key < bench_guard._baseline_key("BENCH_r01.json")


def test_bench_line_parser_takes_last_json_line():
    text = 'noise\n{"metric": "a", "queries": {}}\nmore noise\n' \
           '{"metric": "b", "queries": {"q": 1.0}}\n'
    parsed = bench_guard._bench_line(text)
    assert parsed["metric"] == "b"
    assert bench_guard._bench_line("no json here") is None


def test_load_baseline_prefers_repro_and_skips_unparseable(tmp_path, monkeypatch):
    """End-to-end on a fabricated repo dir: the same-round repro wins over
    the official record, and an unparseable newest file falls back to the
    next-best baseline."""
    (tmp_path / "BENCH_r08.json").write_text(
        '{"metric": "m", "value": 9.9, "queries": {"q": 2.0}}')
    (tmp_path / "BENCH_r08_repro.json").write_text(
        '{"metric": "m", "value": 5.0, "queries": {"q": 1.0}}')
    monkeypatch.setattr(bench_guard, "REPO", str(tmp_path))
    name, bench = bench_guard.load_baseline()
    assert name == "BENCH_r08_repro.json"
    assert bench["queries"]["q"] == 1.0

    # a newer but truncated/unparseable record falls through to the repro
    (tmp_path / "BENCH_r09.json").write_text('{"tail": "garbage no json"}')
    name, bench = bench_guard.load_baseline()
    assert name == "BENCH_r08_repro.json"

    # so do invalid JSON (truncated write) and a non-dict top level —
    # a corrupt newest record must not abort the guard with a traceback
    (tmp_path / "BENCH_r10.json").write_text('{"metric": trunca')
    (tmp_path / "BENCH_r11.json").write_text('[1, 2, 3]')
    name, bench = bench_guard.load_baseline()
    assert name == "BENCH_r08_repro.json"


def test_live_repo_baseline_is_parseable():
    """Whatever the committed newest baseline is, the guard must be able
    to parse it — a silent exit(0) here would disable regression checks."""
    name, bench = bench_guard.load_baseline()
    assert "queries" in bench and bench["queries"]
