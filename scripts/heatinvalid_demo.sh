#!/bin/sh
# Protocol self-test for the canary-bracketed re-measure gate
# (r15 verdict item 1; Bench.scala round-16 protocol note).
#
# Runs the full-protocol bench on a 5-query slice at sf0.01 with:
#   - GRAFT_BENCH_PREV pointing at a doctored prev (q171/q180 at 0.3 s)
#     so both queries flag >1.4x and get child re-measures, and
#   - GRAFT_BENCH_HEAT_SIM=1, which inflates each bracketing canary leg
#     past Bench.legEnvelope — simulating the 1.8x-hot window the r15
#     driver re-run actually measured in.
#
# Expected committed artifact (scripts/heatinvalid_demo.json):
#   "remeasured" entries with verdict "heat-invalid" (never
#   "regression"), leg_pre/leg_post > bracket_envelope, and
#   "heat_sim":true marking the artifact as a self-test.
set -e
cd "$(dirname "$0")/.."
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
GRAFT_ONLY="q171_,q180_,q218_,q216b_,q35_" \
GRAFT_BENCH_FULLPROTO=1 \
GRAFT_BENCH_PREV=scripts/heatinvalid_demo_prev.json \
GRAFT_BENCH_HEAT_SIM=1 \
GRAFT_BENCH_REMEASURE=2 \
GRAFT_BENCH_OUTFILE=scripts/heatinvalid_demo.json \
sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || true
python3 - <<'EOF'
import json
d = json.load(open("scripts/heatinvalid_demo.json"))
rm = d["remeasured"]
assert d.get("heat_sim") is True, "self-test artifact must carry heat_sim"
assert rm, "no re-measures ran"
for k, v in rm.items():
    assert v["verdict"] in ("heat-invalid", "noise", "remeasure_failed"), \
        f"{k} read {v['verdict']} in a hot window"
    assert max(v["leg_pre"], v["leg_post"]) > d["bracket_envelope"]
print("heat-invalid demo OK:",
      {k: v["verdict"] for k, v in rm.items()})
EOF
