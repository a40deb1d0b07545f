#!/bin/bash
# Same-hour bench A/B: current HEAD vs an older ref, interleaved
# fresh-JVM reps on the same host, same minute-scale window — the
# experiment that separates "code regressed" from "host day" (round-15
# task 5: the round-14 attribution was right but lived only as SCALE.md
# prose; this makes it a committed artifact).
#
#   tools/bench_ab.sh <old_ref> <queries_csv> [sf_dir] [reps] [log]
#
# Builds <old_ref> in a git worktree (its own sbt target), then runs
# graft.Bench restricted to <queries_csv> ALTERNATING old/new for
# <reps> rounds (A B A B ... — interleaving means a host-load drift
# hits both sides equally instead of whichever side ran second).
# Emits both JSON lines per rep plus a per-query min/min comparison.
set -euo pipefail
cd "$(dirname "$0")/.."

OLD_REF="${1:?usage: bench_ab.sh <old_ref> <queries_csv> [sf_dir] [reps] [log]}"
QUERIES="${2:?queries csv required}"
SF_DIR="${3:-/root/testdata/sf0.01}"
REPS="${4:-3}"
LOG="${5:-/dev/stdout}"
WT=/tmp/bench_ab_worktree

if [ ! -d "$WT" ]; then
  git worktree add --detach "$WT" "$OLD_REF" >&2
else
  git -C "$WT" checkout --detach "$OLD_REF" >&2
fi
echo "building old ref $OLD_REF in $WT ..." >&2
(cd "$WT" && sbt -batch compile < /dev/null 2>&1 | tail -1) >&2

{
  # "new" is the WORKING TREE (compiled classes), not necessarily HEAD —
  # label it that way (r14 verdict hygiene note)
  dirty=$(git status --porcelain --untracked-files=no | head -1 | grep -q . && echo "+dirty" || true)
  echo "# bench A/B: old=$OLD_REF new=worktree@$(git rev-parse --short HEAD)$dirty"
  echo "# queries=$QUERIES sf=$SF_DIR reps=$REPS host_date=$(date -u +%FT%TZ)"
  for rep in $(seq 1 "$REPS"); do
    for side in old new; do
      dir=$( [ "$side" = old ] && echo "$WT" || echo . )
      line=$(cd "$dir" && SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
        SPARK_GRAFT_SF_DIR="$SF_DIR" tools/run_main.sh graft.Bench 2>/dev/null \
        | grep '"metric".*"queries"' | tail -1)
      echo "rep$rep $side $line"
    done
  done
} >> "$LOG"

python3 - "$LOG" <<'EOF' >> "$LOG"
import json, sys, collections
best = collections.defaultdict(dict)
for ln in open(sys.argv[1]):
    if not ln.startswith("rep"):
        continue
    _, side, payload = ln.split(" ", 2)
    d = json.loads(payload)
    for q, s in d["queries"].items():
        best[q][side] = min(best[q].get(side, 1e9), s)
print("# per-query best-of-reps old vs new:")
worst = 0.0
for q in sorted(best):
    o, n = best[q].get("old"), best[q].get("new")
    if o is None or n is None:
        print(f"# {q}: missing a side"); continue
    r = n / o if o > 0 else float("inf")
    worst = max(worst, r)
    print(f"# {q}: old={o:.2f}s new={n:.2f}s new/old={r:.2f}x")
print(f"# worst new/old ratio: {worst:.2f}x "
      f"({'code-attributable regression candidates above 1.3x' if worst > 1.3 else 'no code-attributable regression'})")
EOF
