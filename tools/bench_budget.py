#!/usr/bin/env python3
"""Per-query bench-regression pins (round-12 task 6).

The 2x bench contract was only ever checked at judging time; this tool
makes it a one-command local gate:

  python3 tools/bench_budget.py freeze <bench_full.json>   # write budgets
  python3 tools/bench_budget.py check  <bench_full.json>   # name offenders

`freeze` writes tools/bench_budgets.json: per-query ceiling = 2x the
frozen run's seconds, floored at MIN_CEILING_S so sub-100ms queries
don't fail on scheduler jitter. `check` compares a fresh bench record
(same sf, fresh-JVM best-of-N methodology — i.e. a bench_full_r*.json
produced by graft.Bench, NOT a warm in-suite rerun) against the
budgets and exits 1 naming every query over its ceiling, so a plan
regression is caught in-round with the query named, not discovered at
judging.

New queries (in the record, not in the budget file) are reported as
UNPINNED but do not fail the check — freeze again after a round's
operator batch lands.

Canary-relative ceilings (round-15 task 5): host days drift the WHOLE
record (the r13->r14 episode: median per-query ratio 1.11 across 298
unchanged queries), so absolute ceilings generate false alarms on slow
days and mask regressions on fast ones. `check` therefore estimates a
host factor as the MEDIAN fresh/frozen ratio over all pinned queries
with frozen time >= CANARY_MIN_S (the whole pinned set is the canary —
a real plan regression moves a few queries and cannot move the median;
a host day moves all of them and does). Ceilings are scaled by the
factor, clamped to [1.0, HOST_FACTOR_CAP]: never tightened below the
frozen contract, and a drift beyond the cap is loudly warned instead
of silently absorbed (an everything-2x day deserves eyes, not a pass).
"""
import json
import sys
import os

BUDGET_PATH = os.path.join(os.path.dirname(__file__), "bench_budgets.json")
RATIO = 2.0          # the judging contract
MIN_CEILING_S = 0.5  # jitter floor: 2x of a 60ms query is noise, not a pin
CANARY_MIN_S = 0.3   # frozen-time floor for median membership
HOST_FACTOR_CAP = 1.6  # drift absorbed at most this far; beyond = warn


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' object — not a graft.Bench record")
    return d


def freeze(bench_path):
    d = load(bench_path)
    budgets = {
        "frozen_from": os.path.basename(bench_path),
        "sf": d.get("sf", "?"),
        "ratio": RATIO,
        "min_ceiling_s": MIN_CEILING_S,
        "ceilings_s": {
            q: round(max(RATIO * s, MIN_CEILING_S), 3)
            for q, s in sorted(d["queries"].items())
        },
    }
    with open(BUDGET_PATH, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
    print(f"froze {len(budgets['ceilings_s'])} ceilings from "
          f"{bench_path} -> {BUDGET_PATH}")


def check(bench_path):
    if not os.path.exists(BUDGET_PATH):
        sys.exit(f"{BUDGET_PATH} missing — run: bench_budget.py freeze "
                 "<bench_full.json>")
    with open(BUDGET_PATH) as f:
        budgets = json.load(f)
    d = load(bench_path)
    if d.get("sf") != budgets.get("sf"):
        print(f"WARN: sf mismatch — budgets frozen at {budgets.get('sf')}, "
              f"record is {d.get('sf')}; ceilings only mean 2x at the "
              "same scale factor")
    ceilings = budgets["ceilings_s"]
    ratio = budgets["ratio"]
    # host factor: median fresh/frozen over the pinned-and-present set
    # (frozen = ceiling / ratio; sub-CANARY_MIN_S queries excluded —
    # their ratios are scheduler jitter, not host signal)
    rel = sorted(
        d["queries"][q] / (c / ratio)
        for q, c in ceilings.items()
        if q in d["queries"] and c / ratio >= CANARY_MIN_S)
    raw_factor = rel[len(rel) // 2] if rel else 1.0
    host_factor = min(max(raw_factor, 1.0), HOST_FACTOR_CAP)
    print(f"host factor: median fresh/frozen = {raw_factor:.2f} over "
          f"{len(rel)} canary queries -> ceilings scaled x{host_factor:.2f}")
    if raw_factor > HOST_FACTOR_CAP:
        print(f"WARN: host drift {raw_factor:.2f} exceeds cap "
              f"{HOST_FACTOR_CAP} — absorbing only the cap; if this is "
              "a real host day, re-bench on a quiet host "
              "(tools/bench_ab.sh separates code from host)")
    over, unpinned = [], []
    for q, s in sorted(d["queries"].items()):
        if q not in ceilings:
            unpinned.append(q)
        elif s > ceilings[q] * host_factor:
            over.append((q, s, ceilings[q]))
    for q in unpinned:
        print(f"UNPINNED {q} ({d['queries'][q]:.2f}s) — freeze again to pin")
    if over:
        for q, s, c in sorted(over, key=lambda t: -t[1] / t[2]):
            print(f"OVER {q}: {s:.2f}s > ceiling {c:.2f}s x{host_factor:.2f} "
                  f"({s / (c / ratio):.2f}x frozen)")
        sys.exit(f"FAIL: {len(over)} queries over their host-adjusted "
                 f"{ratio}x ceiling")
    print(f"PASS: {len(d['queries']) - len(unpinned)} pinned queries "
          "within host-adjusted ceiling" +
          (f", {len(unpinned)} unpinned" if unpinned else ""))


if __name__ == "__main__":
    if len(sys.argv) != 3 or sys.argv[1] not in ("freeze", "check"):
        sys.exit(__doc__)
    (freeze if sys.argv[1] == "freeze" else check)(sys.argv[2])
