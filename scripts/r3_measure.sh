#!/bin/bash
# Round-3 FastDropout measurement sequence (runs unattended on the TPU).
#
# Each measurement runs in its own subprocess with cooldowns between heavy
# runs (axon lazy-HBM hygiene — see bench.py and the axon memory notes).
# Usage:  bash scripts/r3_measure.sh [logfile]
set -u
LOG="${1:-tmp/r3_measure.log}"
mkdir -p "$(dirname "$LOG")"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
  sleep 90   # HBM reclamation cooldown
}

# 0. TPU-only kernel/dropout tests (the FastDropout hardware path has never
#    run on a real chip in-suite since the commit)
run python -m pytest tests/test_dropout.py tests/test_pallas_attention.py -q
# 1. flagship 256px step with FastDropout (the new number)
run python scripts/step_ablation.py rbg
# 2. control: pre-round-3 nn.Dropout path (A/B delta)
run python scripts/step_ablation.py flaxdrop
# 3. chained dispatch (production-faithful number)
run python scripts/step_ablation.py chain
# 4. 512px with FastDropout, level remat + Pallas attention
run python scripts/exp512.py attn_b4
# 5. 512px batch-6 retry (FastDropout freed the bool-mask residuals)
run python scripts/exp512.py drop_lvl_b6

echo "ALL DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
