# Developer entry points (reference: Makefile venv/cpu-tests/bench targets).
PY ?= python
CPU_ENV = JAX_PLATFORMS=cpu PYTHONPATH=.

.PHONY: test test-fast lint bench bench-decode bench-prefill bench-train \
        bench-kernels bench-all smoke readiness demo-64k demo-decode \
        train-toy sanity check-configs dryrun pp-smoke

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/test_block_math.py tests/test_selection.py \
	  tests/test_decode.py tests/test_config_and_gates.py -q

lint:
	$(PY) -m ruff check nsa_vibe_tpu tests bench scripts

bench:            # real-chip decode latency (driver metric)
	$(PY) bench.py

bench-decode:
	$(PY) bench/bench_decode.py --branches --csv artifacts/decode.csv

bench-prefill:
	$(PY) bench/bench_prefill.py

bench-train:
	$(PY) bench/bench_train.py --batch 16 --seq 2048

bench-kernels:    # per-kernel micro-benches, pedestal-corrected timing
	$(PY) bench/bench_kernels.py --grad --csv artifacts/kernels.csv

bench-all:        # orchestrated suite -> artifacts/bench/<ts>/summary.json
	$(PY) bench/run_automated_bench.py

demo-decode:
	$(CPU_ENV) $(PY) scripts/demo_decode.py

train-toy:
	$(CPU_ENV) $(PY) scripts/train_toy.py

sanity:           # 10-second chip sanity (devices, MXU, pallas)
	$(PY) scripts/tpu_sanity.py

check-configs:
	$(CPU_ENV) $(PY) scripts/check_config.py configs/*.yaml

smoke:
	$(CPU_ENV) $(PY) -m nsa_vibe_tpu.train.trainer --steps 20 --data synthetic \
	  --batch-size 4 --seq-len 64 --n-layers 1 --log-every 5

pp-smoke:         # pipeline-parallel trainer on the 8-virtual-device mesh
	XLA_FLAGS=--xla_force_host_platform_device_count=8 $(CPU_ENV) \
	  $(PY) -m nsa_vibe_tpu.train.trainer --steps 12 --data synthetic \
	  --batch-size 8 --seq-len 64 --n-layers 4 --pp 2 --dp 4 --log-every 4

readiness:
	$(CPU_ENV) $(PY) scripts/run_readiness.py

demo-64k:
	$(PY) scripts/demo_64k.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	  PYTHONPATH= $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
