#!/bin/bash
# Unattended scaling-floor grinder (round-4 verdict item #4, kept running
# through round 5).  The protocol's estimator is the per-level MINIMUM
# across invocations (this host shows 3-7x co-tenant storms), so every
# additional quiet-window draw can only tighten the floors.
#
# One cycle:
#   1. 8->32 e2e draw            (SPARK_GRAFT_SCALING_E2E_ONLY=1, 2 rounds)
#   2. 2->8  e2e draw            (unsaturated pair, 1 round)
#   3. 8->32 e2e draw
#   4. 2->8  e2e draw            (second slot: the 2->8 floors re-accumulated
#                                 from zero at the protocol-v5 cutover, so
#                                 this pair has the thinnest v5 sample; a
#                                 2:3 draw ratio rebalances it vs 8->32)
#   5. 8->32 full draw           (ceiling probe + compute stage + e2e)
#   6. headline contract session (python bench.py -> headline_state.json)
#
# The accumulated-state artifact(s) are committed after every invocation
# so the floor history is append-only and auditable in git.  Touch
# /dev/shm/GRINDER_STOP to stop at the next step boundary (e.g. before
# running pytest/driver_sim gates, which need a quiet host).
set -u
cd /root/repo

msg_counts() {
  python3 - <<'EOF'
import json
s = json.load(open("BENCH/scaling_state.json"))
t = json.load(open("BENCH/scaling_state_2_8.json"))
print(f"(2to8 inv {len(t['invocations'])}, 8to32 inv {len(s['invocations'])})")
EOF
}

commit_state() {
  local prefix="$1"; shift
  git add "$@" 2>/dev/null
  git diff --cached --quiet && return 0
  git commit -q -m "$prefix $(msg_counts)" \
    -m "No-Verification-Needed: benchmark-record-only commit"
}

stop_requested() { [ -f /dev/shm/GRINDER_STOP ]; }

while :; do
  stop_requested && exit 0
  SPARK_GRAFT_SCALING_E2E_ONLY=1 SPARK_GRAFT_SCALING_ROUNDS=2 \
    python bench.py --scaling \
    >/dev/shm/grind_8_32_e2e.json 2>/dev/shm/grind_8_32_e2e.log
  commit_state "Record 8to32 e2e invocation" BENCH/scaling_state.json BENCH/BASELINE.md

  stop_requested && exit 0
  SPARK_GRAFT_SCALING_PAIR=2,8 SPARK_GRAFT_SCALING_E2E_ONLY=1 \
    SPARK_GRAFT_SCALING_ROUNDS=1 \
    python bench.py --scaling \
    >/dev/shm/grind_2_8_e2e.json 2>/dev/shm/grind_2_8_e2e.log
  commit_state "Record 2to8 e2e invocation" BENCH/scaling_state_2_8.json BENCH/SCALING_2_8.md

  stop_requested && exit 0
  SPARK_GRAFT_SCALING_E2E_ONLY=1 SPARK_GRAFT_SCALING_ROUNDS=2 \
    python bench.py --scaling \
    >/dev/shm/grind_8_32_e2e.json 2>/dev/shm/grind_8_32_e2e.log
  commit_state "Record 8to32 e2e invocation" BENCH/scaling_state.json BENCH/BASELINE.md

  stop_requested && exit 0
  SPARK_GRAFT_SCALING_PAIR=2,8 SPARK_GRAFT_SCALING_E2E_ONLY=1 \
    SPARK_GRAFT_SCALING_ROUNDS=1 \
    python bench.py --scaling \
    >/dev/shm/grind_2_8_e2e.json 2>/dev/shm/grind_2_8_e2e.log
  commit_state "Record 2to8 e2e invocation" BENCH/scaling_state_2_8.json BENCH/SCALING_2_8.md

  stop_requested && exit 0
  SPARK_GRAFT_SCALING_ROUNDS=2 \
    python bench.py --scaling \
    >/dev/shm/grind_8_32_full.json 2>/dev/shm/grind_8_32_full.log
  commit_state "Record 8to32 full invocation" BENCH/scaling_state.json BENCH/BASELINE.md

  stop_requested && exit 0
  python bench.py >/dev/shm/grind_headline.json 2>/dev/shm/grind_headline.log
  commit_state "Record headline floor session" BENCH/headline_state.json
done
