#!/bin/bash
# Round-4 sequential device batch (run AFTER the A/B queue + ab_select
# merge): evidence-trail re-sourcing + the remaining VERDICT r3 numbers.
# Everything logs to artifacts/r4_batch/; summary lines to stdout.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/r4_batch
mkdir -p "$OUT" artifacts/published

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log"
  echo "=== $name rc=$rc ==="
}

# 1. profile with per-event detail for the two anonymous XLA buckets
run profile_detail 2400 python bench/profile_analyze.py --top 40 \
    --out "$OUT/trace" --detail 'fusion|copy'
run profile_agg 600 python bench/profile_analyze.py --top 40 \
    --aggregate-only "$OUT/trace"

# 2. varlen e2e train number (VERDICT #3 done condition)
run varlen_e2e 2400 python bench/bench_train.py --batch 16 --seq 2048 \
    --steps 8 --chained --varlen

# 3. dense e2e at merged tuning (the new headline, same invocation as queue)
run train_headline 2400 python bench/bench_train.py --batch 16 --seq 2048 \
    --steps 8 --chained

# 4. 350M rung (configs/m7c_350m.yaml shape: dim1024 L24 GQA-4 b8 s2048)
run train_350m 3600 python bench/bench_train.py --dim 1024 --layers 24 \
    --heads 16 --groups 4 --batch 8 --seq 2048 --steps 8 --chained --remat

# 5. long-context rung, labeled (reconciles README 29.5k vs PERFORMANCE 26.3k)
run train_s8192 3600 python bench/bench_train.py --batch 2 --seq 8192 \
    --steps 8 --chained --remat mlp

# 6. 64k needle e2e (re-sources RESULTS.md needle artifact)
run needle 2400 python bench/needle_e2e.py

# 7. 60-step trainer soak (re-sources README soak cite)
run soak 3600 python -m nsa_vibe_tpu.train.trainer --data synthetic \
    --steps 60 --batch-size 16 --seq-len 2048 --log-every 10 \
    --save-every 0 --eval-every 0 --out-dir "$OUT/soak"

# 8. decode guard
run decode_guard 1800 python bench.py

echo "ALL DONE $(date +%H:%M:%S)"
