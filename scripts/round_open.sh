#!/bin/sh
# Round-open artifact absorption (r13 verdict item 2).
#
# Run as the FIRST action of a round: it tracks every driver artifact
# the judge found untracked/dirty three rounds running (BENCH_rN /
# CORRECTNESS_rN / refreshed BENCH_FULL / LEAKCHECK), regenerates
# BENCH_PREV.json — the per-query MIN of the prior round's committed
# close bench and the driver's re-run, which graft.Bench uses as the
# >1.4x auto-flag baseline — and commits the lot as the round's first
# commit.
#
# Usage: scripts/round_open.sh <round-number>
set -e
cd "$(dirname "$0")/.."
N="${1:?usage: round_open.sh <round-number>}"

# 1. Absorb driver artifacts (add is a no-op for already-tracked files).
git add -f BENCH_r*.json CORRECTNESS_r*.json 2>/dev/null || true
for f in BENCH_FULL.json BENCH_CANARY.json LEAKCHECK.json COPYCHECK.json \
         VERDICT.md ADVICE.md BASELINE.md BASELINE.json; do
  [ -f "$f" ] && git add -f "$f"
done

# 2. BENCH_PREV.json = per-query MIN of (last committed BENCH_FULL,
#    working-tree BENCH_FULL). After a driver re-run the working tree
#    holds the re-run and git holds the close run; min-per-query is
#    robust to either one being heat-polluted. python3 is tooling here
#    (same as scripts/check_oracle.py), not engine code.
python3 - "$N" <<'EOF'
import json, subprocess, sys
def load(src):
    try:
        return json.loads(src).get("queries", {})
    except Exception:
        return {}
tree = {}
try:
    tree = load(open("BENCH_FULL.json").read())
except OSError:
    pass
# last 3 commits touching BENCH_FULL: typically the driver's artifact
# commit (re-run) and the builder's close commit — min over all of them
versions = [tree]
try:
    shas = subprocess.check_output(
        ["git", "log", "-3", "--format=%H", "--", "BENCH_FULL.json"],
        text=True).split()
    for sha in shas:
        versions.append(load(subprocess.check_output(
            ["git", "show", f"{sha}:BENCH_FULL.json"], text=True)))
except Exception:
    pass
keys = set().union(*versions)
merged = {k: min(v[k] for v in versions if k in v) for k in keys}
if merged:
    with open("BENCH_PREV.json", "w") as f:
        json.dump({"metric": "total", "value": round(sum(merged.values()), 3),
                   "unit": "sec", "queries": merged,
                   "note": "per-query min of prior close + driver re-run; "
                           "baseline for Bench >1.4x auto-flag"}, f)
    print(f"BENCH_PREV.json: {len(merged)} queries, "
          f"total {sum(merged.values()):.1f}s")
EOF
[ -f BENCH_PREV.json ] && git add BENCH_PREV.json

# 3. Commit as the round's first commit (no-op if nothing changed).
git commit -m "round $N open: absorb driver artifacts, refresh BENCH_PREV" \
  || echo "round_open: nothing to commit"
