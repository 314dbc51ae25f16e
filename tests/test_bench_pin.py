"""The bench regression pin must stay consistent with the query surface:
every pinned query still exists (a rename would silently drop its gate)
and the gate tool runs. The actual time comparison happens after each
bench.py run (tools/bench_regress.py and bench.py's regressed_vs_pin
output) — pytest never runs the bench."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pin_matches_query_surface():
    from etl_load_spark.queries import QUERIES
    pin = json.load(open(os.path.join(ROOT, "BENCH_PINNED.json")))
    assert pin["threshold"] >= 1.0 and pin["abs_floor_sec"] >= 0
    unknown = sorted(set(pin["steady"]) - set(QUERIES))
    assert not unknown, f"pinned queries no longer registered: {unknown}"
    # every pinned value is a sane positive time
    assert all(0 < v < 600 for v in pin["steady"].values())


def test_bench_regress_tool_runs():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "bench_regress.py")],
        capture_output=True, text=True)
    assert r.returncode in (0, 1, 2), r.stderr
    assert "bench_regress:" in r.stdout or "nothing compared" in r.stdout


def test_bench_regress_fresh_clone(tmp_path):
    """ADVICE r6: BENCH_DETAIL.json is a gitignored bench artifact, so a
    fresh clone has the pin but no detail — the tool must report a clean
    'nothing compared' (exit 2), not crash with FileNotFoundError."""
    import shutil
    tools = tmp_path / "tools"
    tools.mkdir()
    shutil.copy(os.path.join(ROOT, "tools", "bench_regress.py"),
                tools / "bench_regress.py")
    shutil.copy(os.path.join(ROOT, "BENCH_PINNED.json"),
                tmp_path / "BENCH_PINNED.json")
    r = subprocess.run([sys.executable, str(tools / "bench_regress.py")],
                       capture_output=True, text=True)
    assert r.returncode == 2, (r.stdout, r.stderr)
    assert "nothing compared" in r.stdout
    assert "BENCH_DETAIL.json" in r.stdout


def test_bench_regress_verify_flag_argument_errors():
    """--verify (VERDICT r6 #5): bad arguments exit 2 with a clear
    message and never start a Spark session. The happy path (isolated
    re-timing) is exercised manually per adjudication; argument handling
    is what must not rot."""
    tool = os.path.join(ROOT, "tools", "bench_regress.py")
    r = subprocess.run([sys.executable, tool, "--verify"],
                       capture_output=True, text=True)
    assert r.returncode == 2 and "nothing compared" in r.stdout
    r = subprocess.run([sys.executable, tool, "--verify", "zz_nope"],
                       capture_output=True, text=True)
    assert r.returncode == 2 and "matches 0 pinned" in r.stdout
    r = subprocess.run([sys.executable, tool, "--verify", "q"],
                       capture_output=True, text=True)
    assert r.returncode == 2 and "unambiguously" in r.stdout


def test_bench_regress_verify_without_pin(tmp_path):
    """ADVICE r7: --verify on a fresh clone with NO pin file (or a pin
    lacking the 'steady' key) must mirror main()'s missing-file message
    and exit 2 — not report the misleading 'matches 0 pinned queries'
    or KeyError on pin['steady']."""
    import json
    import shutil
    tools = tmp_path / "tools"
    tools.mkdir()
    shutil.copy(os.path.join(ROOT, "tools", "bench_regress.py"),
                tools / "bench_regress.py")
    r = subprocess.run(
        [sys.executable, str(tools / "bench_regress.py"), "--verify", "q01"],
        capture_output=True, text=True)
    assert r.returncode == 2, (r.stdout, r.stderr)
    assert "BENCH_PINNED.json" in r.stdout and "nothing compared" in r.stdout
    (tmp_path / "BENCH_PINNED.json").write_text(json.dumps({"sf": "0.1"}))
    r = subprocess.run(
        [sys.executable, str(tools / "bench_regress.py"), "--verify", "q01"],
        capture_output=True, text=True)
    assert r.returncode == 2 and "nothing compared" in r.stdout


def test_shuffled_order_deterministic_permutation():
    """--shuffle-order's execution order must be a seed-deterministic
    permutation of the pinned set, independent of input ordering (the
    r13 stall/regression de-aliasing mode — a reproducible seed is what
    makes two runs comparable)."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import bench_regress as b
    names = [f"q{i:03d}" for i in range(50)]
    o1 = b.shuffled_order(list(names), 13)
    o2 = b.shuffled_order(list(reversed(names)), 13)
    assert o1 == o2                       # input order must not matter
    assert sorted(o1) == sorted(names)    # a permutation, nothing lost
    assert o1 != sorted(names)            # actually shuffled
    assert b.shuffled_order(list(names), 7) != o1   # seed matters


def test_shuffle_order_mode_without_pin_is_clean(tmp_path):
    """--shuffle-order on a tree without BENCH_PINNED.json must report
    'nothing compared' (exit 2), like the other modes — not crash."""
    import shutil
    tools = tmp_path / "tools"
    tools.mkdir()
    shutil.copy(os.path.join(ROOT, "tools", "bench_regress.py"),
                tools / "bench_regress.py")
    r = subprocess.run([sys.executable, str(tools / "bench_regress.py"),
                        "--shuffle-order"], capture_output=True, text=True)
    assert r.returncode == 2, (r.stdout, r.stderr)
    assert "nothing compared" in r.stdout
