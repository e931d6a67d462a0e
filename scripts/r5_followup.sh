#!/bin/bash
# Round-5 follow-up TPU chain, run after quality_campaign5.sh:
#   1. rerun fast_flow stage 3 (the mid-run code edit killed the original
#      at s3 step 0; stage 1+2 checkpoints are intact -> --resume)
#   2. campaign5 steps 3-5 (512-res render, budget audit, collect) against
#      the now-trained synth-s3 checkpoint
#   3. bench at full scale (measures fused binning + narrow epilogue)
#   4. stage profiles for the perf writeup
set -u
cd "$(dirname "$0")/.."
LOCK=scripts/with_tpu_lock.sh
LOG=/tmp/campaign_logs
mkdir -p $LOG
FAST=/tmp/e2e_r5_fast
HALF="--res 64 --frames 16 --s2_rounds 6 --s2_iters 120 --s3_rounds 12 --s3_iters 200"
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== [$(date +%H:%M:%S)] fast_flow_s3 ==="
timeout 4800 $LOCK python examples/synthetic_e2e.py --out $FAST $HALF \
    --motion_scale 2.0 --resume >> $LOG/fast_flow_s3.log 2>&1
echo "=== [$(date +%H:%M:%S)] fast_flow_s3 exit=$? ==="

bash scripts/quality_campaign5.sh 3

echo "=== [$(date +%H:%M:%S)] bench ==="
timeout 1500 python bench.py > /tmp/bench_r5_fused.json 2>/tmp/bench_r5_fused.err
echo "=== [$(date +%H:%M:%S)] bench exit=$? ==="

echo "=== [$(date +%H:%M:%S)] profile_step ==="
timeout 1200 $LOCK python scripts/profile_step.py \
    > /tmp/profile_step_r5.log 2>&1
echo "=== [$(date +%H:%M:%S)] profile_step2 ==="
timeout 1200 $LOCK python scripts/profile_step2.py \
    > /tmp/profile_step2_r5.log 2>&1
echo "=== [$(date +%H:%M:%S)] followup done ==="
