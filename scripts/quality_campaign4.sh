#!/bin/bash
# Round-4 quality campaign — the committed-evidence round (VERDICT r3
# next-round #2, #5, #7, #9 + weak #3/#4). Priority-ordered: if the round
# runs out of wall-clock, the HIGH-value evidence (main run, raymarch run)
# lands first. Every step runs under scripts/with_tpu_lock.sh so the
# driver's bench (or an interactive measurement) can always win the chip
# between steps, and each step is individually time-bounded.
#
#   1. main      — surfel-GT full-schedule run (the >=24 dB headline,
#                  re-creating the uncommitted /tmp/e2e_r3 evidence)
#   2. raymarch  — rasterizer-INDEPENDENT sphere-traced GT (breaks the
#                  self-referential-quality circularity, VERDICT weak #3)
#   3. adv       — adversarial variant: textured panning background +
#                  camera jitter + auto-seeded (imperfect) masks (#9)
#   4. fast_flow — motion_scale 2.0 scene (~3 px delta-1 flow), SNR-gated
#                  flow+depth ON (weak #4: does flow supervision help at
#                  real motion scale?)
#   5. fast_noflow — same scene/schedule, flow+depth OFF (resumes 4's
#                  stage 1+2; matched-schedule ablation partner)
#   6. render512 — README 512-res recipe on the main model (#7)
#   7. audit     — budget/truncation audit of the main checkpoint (#7)
#   8. collect   — gather artifacts into examples/results/
set -u
cd "$(dirname "$0")/.."
LOCK=scripts/with_tpu_lock.sh
LOG=/tmp/campaign_logs
mkdir -p $LOG
MAIN=/tmp/e2e_r4
RM=/tmp/e2e_r4_raymarch
ADV=/tmp/e2e_r4_adv
FAST=/tmp/e2e_r4_fast
START=${1:-1}

SCHED="--res 64 --frames 16 --s2_rounds 6 --s2_iters 120 --s3_rounds 24 --s3_iters 200"
HALF="--res 64 --frames 16 --s2_rounds 6 --s2_iters 120 --s3_rounds 12 --s3_iters 200"

run() { # run <step> <name> <timeout> <cmd...>
  local step=$1 name=$2 to=$3; shift 3
  [ "$step" -lt "$START" ] && { echo "skip $name"; return 0; }
  echo "=== [$(date +%H:%M:%S)] $name ==="
  timeout "$to" $LOCK "$@" >> "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] $name exit=$rc ==="
  return 0
}

run 1 main      9000 python examples/synthetic_e2e.py --out $MAIN $SCHED
run 2 raymarch  7200 python examples/synthetic_e2e.py --out $RM $HALF \
                  --gt_source raymarch
run 3 adv       7200 python examples/synthetic_e2e.py --out $ADV $HALF \
                  --gt_source raymarch --background textured \
                  --cam_jitter 0.02 --mask_source auto
run 4 fast_flow 7200 python examples/synthetic_e2e.py --out $FAST $HALF \
                  --motion_scale 2.0
run 5 fast_noflow 5400 python examples/synthetic_e2e.py --out $FAST $HALF \
                  --motion_scale 2.0 --resume --s3_logname s3_noflow \
                  --flow_wt 0 --depth_wt 0
run 6 render512 2400 python -m vidu4d_tpu.render --logdir=$MAIN/logdir/synth-s3 \
                  --load_suffix latest --render_res 512 --viewpoint ref
run 7 audit     1800 python scripts/check_budget_coverage.py \
                  --ckpt $MAIN/logdir/synth-s3/ckpt_latest.pth --res 64 \
                  --budgets 256 512 1024 --out /tmp/e2e_r4_budget.json
run 8 collect    600 python scripts/collect_campaign.py --src $MAIN --rm $RM
echo "=== campaign4 done ==="
