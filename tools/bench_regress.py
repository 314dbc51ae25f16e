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
    python3 tools/bench_regress.py --verify q28,q50   # adjudicate flags:
        re-time the named queries (comma-separated; unambiguous prefixes
        ok) ALONE in a fresh session — 1 cold + 3 steady runs each at
        $SPARK_GRAFT_SF_DIR — and print pin vs isolated. A flag is real
        only if the isolated steady median still exceeds the gate;
        exit 1 then, 0 when all flags are disproved contention spikes.
        Round-11 hardening: when the 3-run median trips the gate, the
        run auto-extends to 7 steadies and judges the median of the
        LAST 3 (pins are fully-warmed bench figures; 3 isolated
        steadies can sit on the JIT warmup tail — q131 "confirmed"
        twice that way, disproved at depth). Any surviving
        confirmation triggers a CONTROL batch of unflagged pins: a
        ~1.0 control median says look deeper, an inflated one says the
        box drifted and the confirmations are suspect.

    python3 tools/bench_regress.py --shuffle-order [seed]   # r13:
        one cold + one steady pass of every pinned query in a
        DETERMINISTIC shuffled execution order (default seed 13),
        flags reported in REGISTRATION order with execution
        positions. Breaks the stall/regression aliasing: every noise
        episode to date flags a CONTIGUOUS registration block (pin
        book r11/r12/r13) — exactly what a real shared-operator
        regression would also look like. Shuffled execution makes a
        box stall hit RANDOM registration positions, so
        registration-clustered flags become diagnostic of real
        regressions. --verify controls are INTERLEAVED with the
        flagged queries (one control per target) as of r13 — the
        round-12 lesson (after-the-batch controls sample different
        box conditions) encoded as the default.

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


def verify(names_arg: str) -> int:
    """Isolated re-measurement of flagged queries (the round-6 written
    adjudication procedure as a command — VERDICT r6 #5)."""
    import statistics
    import time

    sys.path.insert(0, ROOT)
    # Mirror main()'s missing-file handling (ADVICE r7): without a pin
    # there is nothing to adjudicate against — say so instead of the
    # misleading "matches 0 pinned queries" name-resolution error.
    pin = json.load(open(PIN)) if os.path.exists(PIN) else {}
    if not pin.get("steady"):
        print("bench_regress: missing BENCH_PINNED.json (or no 'steady' "
              "key) — nothing compared. Run bench.py then --repin first.")
        return 2
    thr = pin.get("threshold", 1.5)
    floor = pin.get("abs_floor_sec", 0.5)
    pinned = sorted(pin["steady"])
    targets = []
    for raw in names_arg.split(","):
        raw = raw.strip()
        if not raw:
            continue
        hits = [n for n in pinned if n == raw] or \
               [n for n in pinned if n.startswith(raw)]
        if len(hits) != 1:
            print(f"--verify: {raw!r} matches {len(hits)} pinned queries "
                  f"({hits[:5]}); name it unambiguously.")
            return 2
        targets.append(hits[0])
    if not targets:
        print("--verify: no queries named; nothing compared.")
        return 2

    from etl_load_spark.queries import QUERIES
    from etl_load_spark.session import get_spark, release_operator_caches
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if "sf" in pin and str(pin["sf"]) != sf:
        print(f"--verify: measuring at sf={sf} but the pin is "
              f"sf={pin['sf']} — verdicts below are NOT comparable; "
              f"set SPARK_GRAFT_SF_DIR to the pin's SF for adjudication.")
    spark = get_spark("bench_regress_verify")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(name: str) -> float:
        t0 = time.monotonic()
        QUERIES[name].fn(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        dt = time.monotonic() - t0
        release_operator_caches()
        spark.catalog.clearCache()
        return dt

    # Controls INTERLEAVED with the flagged queries, not after them (the
    # round-12 lesson, encoded as the default per VERDICT r12 #8): a
    # control batch that runs after the targets samples DIFFERENT box
    # conditions — round 12 "confirmed" two flags whose after-the-fact
    # controls sat at 0.98 because the contention had already drained;
    # round 13 session 2 saw the mirror image (targets wave-hit, controls
    # clean). One control (cold + 3 steadies) runs after EVERY target so
    # the box factor brackets each verdict in time.
    controls = [n for n in pinned
                if n not in targets and 0.25 <= pin["steady"][n] <= 4]
    controls = controls[:: max(1, len(controls) // 6)][:6]
    control_ratios: list[float] = []

    def run_control(i: int) -> None:
        if not controls:
            return
        name = controls[i % len(controls)]
        run_once(name)  # cold
        med = statistics.median(run_once(name) for _ in range(3))
        control_ratios.append(med / pin["steady"][name])
        print(f"control {name}: {med:.2f}s vs pin "
              f"{pin['steady'][name]:.2f}s = {control_ratios[-1]:.2f}x")

    confirmed = []
    for i, name in enumerate(targets):
        cold = run_once(name)
        steadies = [run_once(name) for _ in range(3)]
        base = pin["steady"][name]

        def gate(m):
            return m > base * thr and m > base + floor

        med = statistics.median(steadies)
        if gate(med):
            # Warmup-tail guard (round 11): a pin is a FULLY-WARMED
            # bench-steady figure (~340 executions deep in one JVM),
            # but 3 isolated steadies can still sit on the JIT/codegen
            # warmup tail for heavy plans (q131: cold 13 s, steadies
            # 4.1/3.4/4.2 — yet an 8-run session converges to 2.2 s,
            # UNDER the gate; two such 3-run 'confirmations' were
            # disproved at depth). Before confirming, extend to 7
            # steadies and judge the median of the LAST 3 — converged
            # territory. A real regression stays above the gate there.
            steadies += [run_once(name) for _ in range(4)]
            med = statistics.median(steadies[-3:])
        still = gate(med)
        print(f"{name}: pinned {base:.2f}s | isolated cold {cold:.2f}s "
              f"steady {' '.join(f'{s:.2f}' for s in steadies)} "
              f"(median {med:.2f}s) -> "
              f"{'REGRESSION CONFIRMED' if still else 'spike disproved'}")
        if still:
            confirmed.append(name)
        run_control(i)
    print(f"bench_regress: --verify {len(confirmed)} confirmed / "
          f"{len(targets)} re-measured (threshold {thr}x + {floor}s floor)")
    if control_ratios:
        box = statistics.median(control_ratios)
        print(f"bench_regress: interleaved control box factor {box:.2f} "
              f"over {len(control_ratios)} unflagged pins — "
              + (("controls are inflated too: treat any confirmation "
                  "as BOX DRIFT, not a code regression"
                  if box > 1.25 else
                  "controls are at pin: confirmations warrant a deeper "
                  "look (longer convergence run, plan diff vs the "
                  "pinned round)") if confirmed else
                 "no confirmations; box factor recorded for the log"))
    return 1 if confirmed else 0


def shuffle_order(seed: int) -> int:
    """Run ONE cold + one steady pass of every pinned query in a
    DETERMINISTIC shuffled execution order and report steady-vs-pin in
    REGISTRATION order (VERDICT r12 #3).

    Why: every bench noise episode to date presents as a CONTIGUOUS
    REGISTRATION block of flags (pin book: r11 q146–q159; r12 runs A/B;
    r13 session 2 flagged the whole q01–q13 block on untouched code) —
    which is also exactly what a real regression in a shared operator
    family would look like. Under a shuffled execution order a box
    stall hits a time-contiguous stretch = RANDOM registration
    positions, so: flags contiguous in REGISTRATION order → a real
    family regression; flags contiguous only in EXECUTION order →
    a stall. The seed is printed so a run is reproducible."""
    pin = json.load(open(PIN)) if os.path.exists(PIN) else {}
    if not pin.get("steady"):
        print("bench_regress: missing BENCH_PINNED.json (or no 'steady' "
              "key) — nothing compared. Run bench.py then --repin first.")
        return 2
    thr, floor = pin.get("threshold", 1.5), pin.get("abs_floor_sec", 0.5)

    sys.path.insert(0, ROOT)
    from etl_load_spark.queries import QUERIES
    from etl_load_spark.session import get_spark, release_operator_caches
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in pin["steady"] if n in QUERIES]
    order = shuffled_order(names, seed)
    print(f"bench_regress: --shuffle-order seed={seed} over "
          f"{len(order)} pinned queries")
    spark = get_spark("bench_regress_shuffle")
    spark.sparkContext.setLogLevel("ERROR")

    import statistics
    import time
    steady: dict[str, float] = {}
    exec_pos: dict[str, int] = {}
    for i, name in enumerate(order):
        for attempt in range(2):          # cold, then the timed steady
            t0 = time.monotonic()
            try:
                QUERIES[name].fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.monotonic() - t0
            except Exception as e:  # noqa: BLE001
                print(f"{name} FAILED: {e}", file=sys.stderr)
                dt = -1.0
                break
            finally:
                release_operator_caches()
                try:
                    spark.catalog.clearCache()
                except Exception:  # noqa: BLE001
                    pass
        steady[name] = round(dt, 3)
        exec_pos[name] = i
    flags = {n: t for n, t in steady.items()
             if t > 0 and t > pin["steady"][n] * thr
             and t > pin["steady"][n] + floor}
    reg_order = [n for n in pin["steady"] if n in steady]
    print("flagged (REGISTRATION order, with execution position):")
    for n in reg_order:
        if n in flags:
            print(f"  reg#{reg_order.index(n):3d} exec#{exec_pos[n]:3d} "
                  f"{n}: {steady[n]:.2f}s vs pin {pin['steady'][n]:.2f}s")
    ratios = sorted(steady[n] / pin["steady"][n]
                    for n in steady if steady[n] > 0)
    med = statistics.median(ratios) if ratios else float("nan")
    print(f"bench_regress: --shuffle-order {len(flags)} flagged / "
          f"{len(steady)} run, median ratio {med:.3f}. Reading: flags "
          "clustered in REGISTRATION order under a shuffled execution "
          "= family regression; clustered only in EXECUTION order "
          "= box stall.")
    return 1 if flags else 0


def shuffled_order(names: list, seed: int) -> list:
    """Deterministic shuffle of the pinned-query list (pure; tested)."""
    import random
    order = sorted(names)
    random.Random(seed).shuffle(order)
    return order


def main() -> int:
    if "--verify" in sys.argv:
        i = sys.argv.index("--verify")
        if i + 1 >= len(sys.argv):
            print("--verify: requires a comma-separated query list; "
                  "nothing compared.")
            return 2
        return verify(sys.argv[i + 1])
    if "--shuffle-order" in sys.argv:
        i = sys.argv.index("--shuffle-order")
        seed = 13
        if i + 1 < len(sys.argv) and not sys.argv[i + 1].startswith("-"):
            tok = sys.argv[i + 1]
            # A present-but-unparseable seed must ERROR, not silently run
            # seed 13 — the user would believe they ran a different
            # permutation (ADVICE r13).
            if not tok.isdigit():
                print(f"bench_regress: --shuffle-order seed must be a "
                      f"non-negative integer, got {tok!r}")
                return 2
            seed = int(tok)
        return shuffle_order(seed)
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
