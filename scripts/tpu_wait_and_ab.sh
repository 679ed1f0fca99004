#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run the pending
# on-device validation queue (CLAUDE.md "r2 late"): sequential e2e
# bench_train A/B over kernel-tuning variants. Designed to run under
# tmux and survive the session.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_wait.log
mkdir -p artifacts
echo "[$(date +%T)] waiting for TPU tunnel..." | tee -a "$LOG"
while true; do
  if timeout 180 python -c "import jax; d=jax.devices(); assert d, d; print(d)" >>"$LOG" 2>&1; then
    echo "[$(date +%T)] TPU is back" | tee -a "$LOG"
    break
  fi
  echo "[$(date +%T)] still down; retry in 120s" | tee -a "$LOG"
  sleep 120
done
echo "[$(date +%T)] running A/B queue" | tee -a "$LOG"
python bench/run_ab_queue.py 2>&1 | tee -a artifacts/ab_queue_run.log
echo "[$(date +%T)] A/B queue done (exit $?)" | tee -a "$LOG"
# hands-free follow-ups (winner selection stays manual — see CLAUDE.md):
echo "[$(date +%T)] odd-h Mosaic parity probe" | tee -a "$LOG"
timeout 900 python scripts/tpu_oddh_probe.py 2>&1 | tee -a "$LOG"
echo "[$(date +%T)] decode guard bench" | tee -a "$LOG"
timeout 1800 python bench.py 2>&1 | tee artifacts/bench_after_ab.json | tee -a "$LOG"
echo "[$(date +%T)] train-step profile (top device ops)" | tee -a "$LOG"
timeout 1800 python bench/profile_analyze.py --batch 16 --seq 2048 \
  > artifacts/profile_top_ops.txt 2>&1
echo "[$(date +%T)] all on-device follow-ups done" | tee -a "$LOG"
