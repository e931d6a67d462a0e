#!/bin/bash
# Round-5 quality campaign — the remaining evidence items (VERDICT r4 next
# #6 flow-ablation, #7 budget/512-res audit). Steps 1-3 of campaign4 (main
# 26.70 dB, raymarch-GT, adversarial) are already committed in
# examples/results/; this script produces the rest. Priority-ordered and
# individually time-bounded; every step runs under scripts/with_tpu_lock.sh
# so the driver's bench can always win the chip.
#
#   1. fast_flow   — motion_scale 2.0 scene (~3 px delta-1 flow), SNR-gated
#                    flow+depth ON (the "does flow earn its complexity at
#                    real motion scale" question, VERDICT r4 #6)
#   2. fast_noflow — same scene/schedule, flow+depth OFF (resumes 1's
#                    stage 1+2; matched-schedule ablation partner)
#   3. render512   — README 512-res recipe on the fast_flow checkpoint (#7)
#   4. audit       — budget/truncation audit of the fast_flow checkpoint (#7)
#   5. collect     — merge new artifacts into examples/results/ (the
#                    collector preserves the committed main/raymarch/adv rows)
set -u
cd "$(dirname "$0")/.."
LOCK=scripts/with_tpu_lock.sh
LOG=/tmp/campaign_logs
mkdir -p $LOG
FAST=/tmp/e2e_r5_fast
START=${1:-1}

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

run 1 fast_flow   5400 python examples/synthetic_e2e.py --out $FAST $HALF \
                    --motion_scale 2.0
run 2 fast_noflow 4200 python examples/synthetic_e2e.py --out $FAST $HALF \
                    --motion_scale 2.0 --resume --s3_logname s3_noflow \
                    --flow_wt 0 --depth_wt 0
run 3 render512   2400 python -m vidu4d_tpu.render --logdir=$FAST/logdir/synth-s3 \
                    --load_suffix latest --render_res 512 --viewpoint ref
run 4 audit       1800 python scripts/check_budget_coverage.py \
                    --ckpt $FAST/logdir/synth-s3/ckpt_latest.pth --res 64 \
                    --budgets 256 512 1024 --out /tmp/e2e_r5_budget.json
run 5 collect      600 python scripts/collect_campaign.py \
                    --src /none --rm /none --adv /none --fast $FAST \
                    --budget /tmp/e2e_r5_budget.json \
                    --render512 $FAST/logdir/synth-s3/renderings_0000/ref
echo "=== campaign5 done ==="
