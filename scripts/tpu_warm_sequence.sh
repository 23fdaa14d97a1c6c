#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run every bench row once
# (fresh subprocess per row, cooldowns between — see bench.py's HBM notes).
# Purpose: (a) measure the FastDropout step-time delta, (b) warm the persistent
# compile cache so the driver's end-of-round bench completes inside its timeouts.
set -u
cd /root/repo
LOG=/tmp/tpu_warm_seq.log
echo "=== tpu_warm_sequence start $(date) ===" >> "$LOG"

# 1. probe until the backend initializes (up to ~6h)
for i in $(seq 1 180); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU up after probe $i $(date)" >> "$LOG"
    break
  fi
  echo "probe $i: tunnel down $(date)" >> "$LOG"
  sleep 100
done

for mode in train256 train256_chain train512 gen256 gen256_50 gen512; do
  echo "--- $mode start $(date) ---" >> "$LOG"
  timeout 3000 python bench.py "$mode" >> "$LOG" 2>&1
  echo "--- $mode rc=$? done $(date) ---" >> "$LOG"
  sleep 120
done
echo "=== tpu_warm_sequence done $(date) ===" >> "$LOG"
