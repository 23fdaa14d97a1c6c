#!/bin/bash
# Round-3 phase 2: clean chain re-measure, full bench validation, then the
# flagship-scale noise-free quality experiment + step-count sweep.
# The box must be otherwise idle: on this 1-vCPU host any concurrent CPU work
# starves the dispatch thread and corrupts timing (observed: 48.9 -> 34.6
# tiles/s on the chain row while tests ran alongside).
# Usage: bash scripts/r3_quality_run.sh [logfile]
set -u
LOG="${1:-tmp/r3_quality.log}"
mkdir -p "$(dirname "$LOG")"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-3600}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
  sleep 90
}

# 1. chain re-measure on an idle box
run python scripts/step_ablation.py chain

# 2. full driver bench end-to-end (what BENCH_r03.json will record)
RUN_TIMEOUT=14400 run python bench.py

# 3. flagship 71M UNet, 256px, noise-free synthetic pairs, ~6400 steps
RUN_TIMEOUT=14400 run python src/train.py experiment=quality_synthetic_256 \
  paths.log_dir=tmp/qual_logs logger=csv \
  extras.print_config=false extras.enforce_tags=false

# 4. SSIM/PSNR/FID vs ODE step count on the converged checkpoint
CKPT=$(ls -td tmp/qual_logs/*/runs/*/checkpoints/last 2>/dev/null | head -1)
echo "CKPT=$CKPT" | tee -a "$LOG"
for STEPS in 2 8 50; do
  run python src/eval_quality.py ckpt_path="$CKPT" \
    data=synthetic model=conditional_flow_matching \
    data.tile_size=256 data.image_size=256 data.deterministic=true \
    data.n_train=512 data.n_val=32 data.n_test=32 data.batch_size=16 \
    data.use_augmentation=false num_steps=$STEPS model.solver.solver=euler \
    extras.print_config=false extras.enforce_tags=false
done

echo "ALL DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
