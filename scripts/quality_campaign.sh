#!/bin/bash
# Round-3 quality-evidence campaign (VERDICT r2 #2, #5, #7).
#
# Serializes every TPU job (single tunneled chip, single host core):
#   1. main e2e quality run   — full round-3 stack, long schedule, surfel GT
#   2. loss ablation          — flow+depth supervision OFF, same stage-1/2
#   3. raster-budget sweep    — stage-3 at budget 256 / 1024 / 4096 (main: 512)
#   4. rasterizer-independent GT — sphere-traced SDF video (no self-GT loop)
#   5. depthnet retrain       — diversified scenes + ranking loss
#   6. 512-res render recipe  — README rot_0_360 render of the main model
#
# Each job appends to /tmp/campaign_logs/<job>.log; artifacts land under
# /tmp/e2e_r3*. Run:  bash scripts/quality_campaign.sh [start_step]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/campaign_logs
mkdir -p $LOG
OUT=/tmp/e2e_r3
RM_OUT=/tmp/e2e_r3_raymarch
START=${1:-1}

SCHED="--res 64 --frames 16 --s2_rounds 6 --s2_iters 120 --s3_rounds 24 --s3_iters 200"
# ablation/sweep points only need comparative signal, not the headline
# number — half-length stage 3 keeps the serial campaign inside the round
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

run 1 main    21600 python examples/synthetic_e2e.py --out $OUT $SCHED
run 2 nofd    10800 python examples/synthetic_e2e.py --out $OUT $HALF \
                --resume --s3_logname s3_nofd --flow_wt 0 --depth_wt 0
run 3 b256    10800 python examples/synthetic_e2e.py --out $OUT $HALF \
                --resume --s3_logname s3_b256 --raster_budget 256
run 4 b1024   10800 python examples/synthetic_e2e.py --out $OUT $HALF \
                --resume --s3_logname s3_b1024 --raster_budget 1024
run 5 b4096   10800 python examples/synthetic_e2e.py --out $OUT $HALF \
                --resume --s3_logname s3_b4096 --raster_budget 4096
run 6 raymarch 21600 python examples/synthetic_e2e.py --out $RM_OUT $SCHED \
                --gt_source raymarch
run 7 depthnet 14400 python scripts/train_depthnet.py --steps 2200 \
                --out vidu4d_tpu/weights/depthnet_synthetic.npz
run 8 depthreg 3600 python scripts/eval_depth_registration.py \
                --out /tmp/depth_registration.json
run 9 render512 3600 python -m vidu4d_tpu.render \
                --logdir=$OUT/logdir/synth-s3 \
                --load_suffix latest --render_res 512 --viewpoint ref
echo "=== campaign done ==="
