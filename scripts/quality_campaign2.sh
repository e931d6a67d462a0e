#!/bin/bash
# Round-3 quality campaign, part 2 — reruns after two fixes landed mid-round:
#   * stage-1 canonical translations re-derived from the mask bbox
#     (reference `canonical_registration.py:130-152`): fixes the raymarch
#     run's object-behind-camera collapse (4.0 dB, IoU 0).
#   * SNR-gated stage-3 flow supervision: the matched-schedule ablation
#     showed ungated flow costs ~5 dB at toy scales (21.1 vs 26.3).
#
# Jobs (serialized — one tunneled TPU chip):
#   1. gated    — flow+depth ON with the SNR gate, half schedule, to compare
#                 against metrics_s3_nofd.json (flow+depth OFF, same schedule)
#   2. raymarch — rasterizer-independent sphere-traced GT, full schedule,
#                 with the stage-1 translation fix
#   3. render512 — README 512-res render recipe on the main s3 model
#   4. bench    — verify BENCH at the reference workload (200k/256)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/campaign_logs
mkdir -p $LOG
OUT=/tmp/e2e_r3
RM_OUT=/tmp/e2e_r3_raymarch2
START=${1:-1}

SCHED="--res 64 --frames 16 --s2_rounds 6 --s2_iters 120 --s3_rounds 24 --s3_iters 200"
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

run 1 gated     10800 python examples/synthetic_e2e.py --out $OUT $HALF \
                  --resume --s3_logname s3_gated
run 2 raymarch2 21600 python examples/synthetic_e2e.py --out $RM_OUT $SCHED \
                  --gt_source raymarch
run 3 render512  3600 python -m vidu4d_tpu.render \
                  --logdir=$OUT/logdir/synth-s3 \
                  --load_suffix latest --render_res 512 --viewpoint ref
run 4 bench      3600 python bench.py
echo "=== campaign2 done ==="
