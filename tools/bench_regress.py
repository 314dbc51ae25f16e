#!/usr/bin/env python3
"""Steady-state bench regression gate (VERDICT r5 #4).

Compares BENCH_DETAIL.json's ``steady_state_second_run`` (written by the
most recent ``bench.py`` run) against the committed BENCH_PINNED.json —
the round-5 driver recording at sf0.1. A query FAILS when its steady
time exceeds ``threshold``× its pinned value AND pinned + ``abs_floor_sec``
(sub-second queries jitter by scheduling noise; the floor keeps
0.2 s → 0.35 s out of the report).

Usage:
    python3 tools/bench_regress.py            # exit 1 on any regression
    python3 tools/bench_regress.py --repin    # after an ACCEPTED change:
        rewrite the pin from the current BENCH_DETAIL (keeps threshold/
        floor), so the next round is measured against the new reality.
        Repin deliberately: a regression you repin over is a regression
        you shipped.

New queries (registered after the pin) are listed informationally and
added to the pin on --repin; they never fail the gate by absence.

Adjudicating a flag: the steady pass runs after ~340 query executions
in one JVM on a shared box — transient contention/GC spikes DO flag
innocent queries (round 6 saw 3-10x spikes that an isolated 3-run
re-measurement disproved). A flag is confirmed only by re-timing the
query alone in a fresh session; repin over a disproved spike with the
OLD value, never the spiked one.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(ROOT, "BENCH_DETAIL.json")
PIN = os.path.join(ROOT, "BENCH_PINNED.json")


def main() -> int:
    # BENCH_DETAIL.json is a bench.py artifact, gitignored by design — a
    # fresh clone has the pin but no detail. "Nothing to compare" is a
    # clean state (exit 2, the same code as an SF mismatch), not a crash.
    missing = [p for p in (DETAIL, PIN) if not os.path.exists(p)]
    if missing:
        print("bench_regress: missing "
              + ", ".join(os.path.basename(p) for p in missing)
              + " — run bench.py at the pin's SF first; nothing compared.")
        return 2
    detail = json.load(open(DETAIL))
    pin = json.load(open(PIN))
    if str(detail.get("sf")) != str(pin.get("sf")):
        print(f"bench_regress: BENCH_DETAIL is sf={detail.get('sf')}, "
              f"pin is sf={pin.get('sf')} — run bench.py at the pin's SF "
              "first; nothing compared.")
        return 2
    steady = detail.get("steady_state_second_run", {})
    thr, floor = pin.get("threshold", 1.5), pin.get("abs_floor_sec", 0.5)
    regressed, improved, new = {}, {}, []
    for name, t in sorted(steady.items()):
        base = pin["steady"].get(name)
        if base is None:
            new.append(name)
        elif t > base * thr and t > base + floor:
            regressed[name] = (base, t)
        elif t < base / thr and base > t + floor:
            improved[name] = (base, t)

    if "--repin" in sys.argv:
        pin["steady"] = steady
        pin["source"] = "repinned from BENCH_DETAIL.json by tools/bench_regress.py"
        json.dump(pin, open(PIN, "w"), indent=1, sort_keys=True)
        print(f"repinned {len(steady)} queries "
              f"({len(regressed)} were regressed, {len(new)} new)")
        return 0

    for name, (base, t) in regressed.items():
        print(f"REGRESSED {name}: {base:.2f}s pinned -> {t:.2f}s "
              f"({t / base:.2f}x)")
    for name in new:
        print(f"new (unpinned): {name} = {steady[name]:.2f}s")
    for name, (base, t) in improved.items():
        print(f"improved: {name}: {base:.2f}s -> {t:.2f}s")
    print(f"bench_regress: {len(regressed)} regressed / "
          f"{len(improved)} improved / {len(new)} new / "
          f"{len(steady)} total (threshold {thr}x + {floor}s floor)")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
