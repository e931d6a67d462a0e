#!/bin/bash
# Round-3 quality campaign, part 3 — flow-supervision value at real motion
# scale, depth-loss isolation, and the perf profile for the next push.
#
#   1. fast_flow    — motion_scale 2.0 scene (~3 px delta-1 flow, above the
#                     RAFT noise floor), SNR-gated flow+depth ON
#   2. fast_noflow  — same scene/schedule, flow+depth OFF: does flow
#                     supervision help when the GT flow carries signal?
#   3. nodep        — original scene, gated flow ON + depth OFF: isolates
#                     which of the two losses costs the ~1 dB vs OFF
#   4. profile      — component-level timing of the 200k/256 production step
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/campaign_logs
mkdir -p $LOG
FAST=/tmp/e2e_r3_fast
OUT=/tmp/e2e_r3
START=${1:-1}

HALF="--res 64 --frames 16 --s2_rounds 6 --s2_iters 120 --s3_rounds 12 --s3_iters 200"

run() { # run <step> <name> <timeout> <cmd...>
  local step=$1 name=$2 to=$3; shift 3
  [ "$step" -lt "$START" ] && { echo "skip $name"; return 0; }
  echo "=== [$(date +%H:%M:%S)] $name ==="
  timeout "$to" "$@" >> "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] $name exit=$rc ==="
  return 0
}

run 1 fast_flow   10800 python examples/synthetic_e2e.py --out $FAST $HALF \
                    --motion_scale 2.0
run 2 fast_noflow 10800 python examples/synthetic_e2e.py --out $FAST $HALF \
                    --motion_scale 2.0 --resume --s3_logname s3_noflow \
                    --flow_wt 0 --depth_wt 0
run 3 nodep       10800 python examples/synthetic_e2e.py --out $OUT $HALF \
                    --resume --s3_logname s3_nodep --depth_wt 0
run 4 profile      3600 python scripts/profile_step.py --surfels 200000 \
                    --res 256 --iters 8
echo "=== campaign3 done ==="
