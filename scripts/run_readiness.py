"""End-to-end readiness runner: tests + smoke train + bench in one report.

Reference: scripts/run_m7_readiness.py:1-60 — runs test groups, collects
an artifacts tree and a pass/fail/skip summary JSON. Groups here:

  core     pytest: block math, selection, rope/compress, equivalence
  kernels  pytest: pallas fwd/bwd + scorer parity (interpret on CPU)
  decode   pytest: decode counters/parity + needle
  train    pytest: model/train step + context parallel
  smoke    20-step synthetic trainer run (loss must decrease)
  needle64k  on-device 64k end-to-end needle retrieval (TPU)
  bench    bench.py decode latency (TPU only unless --cpu-bench)

Run: python scripts/run_readiness.py [--out artifacts/readiness]
     [--groups core,kernels,decode,train,smoke]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os
import subprocess
import sys
import time

GROUPS = {
    "core": ["tests/test_block_math.py", "tests/test_selection.py",
             "tests/test_rope_compress.py", "tests/test_equiv_full_attention.py",
             "tests/test_config_and_gates.py", "tests/test_perf_guards.py"],
    "kernels": ["tests/test_pallas_kernels.py", "tests/test_pallas_bwd.py",
                "tests/test_scorer_kernel.py"],
    "decode": ["tests/test_decode.py", "tests/test_needle.py"],
    "train": ["tests/test_model_train.py", "tests/test_context_parallel.py",
              "tests/test_gradcheck.py", "tests/test_data_ops.py",
              "tests/test_native_packer.py"],
}


def run(cmd: list[str], timeout: int = 1800) -> tuple[int, str]:
    try:
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
        return p.returncode, (p.stdout + p.stderr)[-4000:]
    except subprocess.TimeoutExpired:
        return -1, "timeout"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/readiness")
    ap.add_argument("--groups", default="core,kernels,decode,train,smoke")
    ap.add_argument("--cpu-bench", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    groups = args.groups.split(",")
    results: dict = {}
    t_start = time.time()

    for g in groups:
        t0 = time.time()
        if g in GROUPS:
            rc, log = run([sys.executable, "-m", "pytest", "-q", *GROUPS[g]])
            status = "pass" if rc == 0 else "fail"
        elif g == "smoke":
            rc, log = run([
                sys.executable, "-m", "nsa_vibe_tpu.train.trainer",
                "--steps", "20", "--data", "synthetic", "--batch-size", "4",
                "--seq-len", "64", "--n-layers", "1", "--log-every", "5",
                "--out-dir", os.path.join(args.out, "smoke_run"),
            ])
            status = "pass" if rc == 0 and '"final_loss"' in log else "fail"
        elif g == "needle64k":
            # on-device 64k END-TO-END needle (full module, asserted) —
            # promotion of the CPU 4k test into the readiness gate
            rc, log = run([sys.executable, "bench/needle_e2e.py"], timeout=3600)
            status = "pass" if rc == 0 else "fail"
        elif g == "acceptance":
            # M7 showcase acceptance: char-LM to val PPL < 3.0 (opt-in —
            # ~15 min CPU / ~1 min TPU)
            rc, log = run([sys.executable, "scripts/showcase_acceptance.py",
                           "--out-dir", os.path.join(args.out, "acceptance")],
                          timeout=3600)
            status = "pass" if rc == 0 else "fail"
        elif g == "bench":
            rc, log = run([sys.executable, "bench.py"], timeout=3600)
            status = "pass" if rc == 0 else "fail"
        else:
            status, log = "skip", f"unknown group {g}"
        results[g] = {"status": status, "seconds": round(time.time() - t0, 1)}
        with open(os.path.join(args.out, f"{g}.log"), "w") as f:
            f.write(log)
        print(f"[readiness] {g}: {results[g]['status']} "
              f"({results[g]['seconds']}s)", flush=True)

    summary = {
        "results": results,
        "ok": all(r["status"] == "pass" for r in results.values()),
        "wall_s": round(time.time() - t_start, 1),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
