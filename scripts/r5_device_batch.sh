#!/bin/bash
# Round-5 sequential device batch (run AFTER the sustained run frees the
# chip): long-context profiling + S=16k rung + flagship serving + the
# extended decode guard. Logs to artifacts/r5_batch/.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/r5_batch
mkdir -p "$OUT" artifacts/published

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log"
  echo "=== $name rc=$rc ==="
}

# 1. S=8192 profile (VERDICT item 4: explain the 10.9% MFU + b4<b2)
run profile_s8192_b2 3000 python bench/profile_analyze.py --batch 2 \
    --seq 8192 --out "$OUT/trace_s8192_b2" --top 40
run profile_s8192_b4 3000 python bench/profile_analyze.py --batch 4 \
    --seq 8192 --out "$OUT/trace_s8192_b4" --top 40

# 2. S=16384 rung (new ladder line)
run train_s16k 3600 python bench/bench_train.py --batch 1 --seq 16384 \
    --steps 8 --chained --remat mlp
run train_s16k_b2 3600 python bench/bench_train.py --batch 2 --seq 16384 \
    --steps 8 --chained --remat mlp

# 3. flagship serving (12-layer m7c; VERDICT item 5)
run serve_m7c 2400 python bench/bench_decode.py --serve --layers 12 \
    --dim 768 --heads 12 --groups 2 --batch 1
run serve_m7c_b64 2400 python bench/bench_decode.py --serve --layers 12 \
    --dim 768 --heads 12 --groups 2 --batch 64
run serve_ragged_m7c 2400 python bench/bench_decode.py --serve-ragged \
    --layers 12 --dim 768 --heads 12 --groups 2 --batch 16
run serve_cb_m7c 3000 python bench/bench_decode.py --serve-cb --layers 12 \
    --dim 768 --heads 12 --groups 2 --batch 16
run serve_cb_m7c_b64 3000 python bench/bench_decode.py --serve-cb --layers 12 \
    --dim 768 --heads 12 --groups 2 --batch 64
run serve_350m 3000 python bench/bench_decode.py --serve --layers 24 \
    --dim 1024 --heads 16 --groups 4 --batch 1

# 4. extended decode guard (S to 65536) + snapshot
run decode_guard 2400 python bench.py
grep '^{' "$OUT/decode_guard.log" | tail -1 > "$OUT/bench_r5.json" || true
run guard_snapshot 60 python scripts/check_decode_guard.py \
    "$OUT/bench_r5.json" baselines/tpu_decode_guard.json --snapshot

# 5. demo_64k with the dispatched-vs-device labeling fix
run demo64k 2400 python scripts/demo_64k.py

# 6. dense + varlen headline re-checks at the final config
run train_headline 2400 python bench/bench_train.py --batch 16 --seq 2048 \
    --steps 8 --chained
run varlen_headline 2400 python bench/bench_train.py --batch 16 --seq 2048 \
    --steps 8 --chained --varlen

# 7. sharded step on the real chip (VERDICT item 8): dp=1 mesh through
#    the shard_map train step at m7c shape with the tuned kernels
run train_mesh_dp1 2400 python bench/bench_train.py --batch 16 --seq 2048 \
    --steps 8 --chained --dp 1

echo "ALL DONE $(date +%H:%M:%S)"

# 8. continuous-batching soak with mid-stream admissions (flagship)
run serve_soak_m7c 900 python bench/serve_soak.py --minutes 3
