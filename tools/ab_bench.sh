#!/bin/bash
# Same-context A/B harness (VERDICT r12 #9): interleave min-of-N timed
# runs of a query subset between the WORKING TREE (B, the candidate
# change) and the LAST COMMIT (A, via git stash), in one machine
# context, so ambient drift (±30% cross-context on this VM) cancels.
#
# Usage: tools/ab_bench.sh [-r ROUNDS] [-n REPEATS] q273 q276 ...
#   ROUNDS  full A/B alternations (default 2 -> A B A B)
#   REPEATS per-process interleaved passes (default 2)
#
# Emits per-arm JSON lines tagged A:<i>/B:<i> and a final min-per-query
# summary. Requires a dirty working tree (the candidate diff); restores
# it with `git stash pop` even on failure.
set -u
cd "$(dirname "$0")/.."
ROUNDS=2
REPEATS=2
while getopts "r:n:" opt; do
  case $opt in
    r) ROUNDS=$OPTARG ;;
    n) REPEATS=$OPTARG ;;
    *) exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[ $# -ge 1 ] || { echo "usage: $0 [-r ROUNDS] [-n REPEATS] q..." >&2; exit 2; }

if git diff --quiet; then
  echo "working tree is clean — nothing to A/B against HEAD" >&2
  exit 2
fi

OUT=$(mktemp /tmp/ab_bench.XXXXXX.jsonl)
echo "# arms -> $OUT" >&2
# NOTE: the working tree is stashed while arm A runs — do not edit
# tracked files while this script is running (a failed pop leaves the
# candidate diff in the stash and the remaining arms measure A vs A).
# PROGRESS.jsonl is excluded from the stash: an external monitor
# appends to it mid-run, and the resulting pop conflict silently
# corrupted two A/B sessions before this exclusion.
for i in $(seq 1 "$ROUNDS"); do
  git stash push -q -- ':(exclude)PROGRESS.jsonl' ':(top)' \
    || { echo "stash failed" >&2; exit 1; }
  python tools/quick_bench.py --repeats "$REPEATS" --tag "A:$i" "$@" >> "$OUT"
  status=$?
  git stash pop -q || { echo "stash pop FAILED — candidate diff is in 'git stash list'; resolve before trusting any output" >&2; exit 1; }
  [ $status -eq 0 ] || { echo "arm A:$i failed" >&2; exit 1; }
  python tools/quick_bench.py --repeats "$REPEATS" --tag "B:$i" "$@" >> "$OUT" \
    || { echo "arm B:$i failed" >&2; exit 1; }
done
python - "$OUT" <<'EOF'
import json, sys
mins = {}
for line in open(sys.argv[1]):
    rec = json.loads(line)
    arm = rec["tag"].split(":")[0]
    for q, runs in rec["runs"].items():
        mins.setdefault(q, {}).setdefault(arm, []).extend(runs)
print(f"{'query':42s} {'A(min)':>8s} {'B(min)':>8s} {'B/A':>6s}")
for q, arms in sorted(mins.items()):
    a, b = min(arms.get("A", [0])), min(arms.get("B", [0]))
    r = b / a if a else float("nan")
    print(f"{q:42s} {a:8.3f} {b:8.3f} {r:6.2f}")
EOF
