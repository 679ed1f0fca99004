"""Automated benchmark orchestrator.

Reference: bench/run_automated_bench.py + scripts/generate_summary_from_
artifacts.py — run the benchmark family, collect CSV/JSON artifacts under
one timestamped directory, and emit a single summary JSON suitable for
trend tracking / CI.

Runs (each in a subprocess so a failure is isolated and recorded):
  - bench_decode.py   (decode latency + read accounting sweep)
  - bench_prefill.py  (prefill fwd/bwd scaling)
  - bench_train.py    (training throughput)
  - bench_kernels.py  (per-kernel micro-benches)

Run: python bench/run_automated_bench.py --out artifacts/bench [--fast]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(name: str, cmd: list[str], out_dir: str, timeout: int) -> dict:
    log_path = os.path.join(out_dir, f"{name}.log")
    t = {"name": name, "cmd": " ".join(cmd)}
    try:
        with open(log_path, "w") as log:
            proc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                                  timeout=timeout, cwd=REPO)
        t["returncode"] = proc.returncode
        t["status"] = "pass" if proc.returncode == 0 else "fail"
    except subprocess.TimeoutExpired:
        t["returncode"] = -1
        t["status"] = "timeout"
    # last JSON line of the log is the bench's machine-readable result
    try:
        with open(log_path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and line.endswith("}"):
                    t["result"] = json.loads(line)
    except (OSError, ValueError):
        pass
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/bench")
    ap.add_argument("--fast", action="store_true",
                    help="small shapes / reference kernel (CPU-safe smoke)")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    out_dir = os.path.join(args.out, stamp)
    os.makedirs(out_dir, exist_ok=True)
    py = sys.executable

    if args.fast:
        jobs = [
            ("decode", [py, "bench/bench_decode.py", "--S", "128,256", "--iters", "4",
                        "--warmup", "2", "--kernel", "reference",
                        "--csv", os.path.join(out_dir, "decode.csv")]),
            ("kernels", [py, "bench/bench_kernels.py", "--B", "2", "--S", "256",
                         "--iters", "2", "--kernel", "reference",
                         "--csv", os.path.join(out_dir, "kernels.csv")]),
        ]
    else:
        jobs = [
            ("decode", [py, "bench/bench_decode.py", "--branches",
                        "--csv", os.path.join(out_dir, "decode.csv")]),
            ("prefill", [py, "bench/bench_prefill.py"]),
            ("train", [py, "bench/bench_train.py"]),
            ("kernels", [py, "bench/bench_kernels.py",
                         "--csv", os.path.join(out_dir, "kernels.csv")]),
        ]

    results = [run_one(name, cmd, out_dir, args.timeout) for name, cmd in jobs]
    summary = {
        "stamp": stamp,
        "fast": args.fast,
        "pass": sum(r["status"] == "pass" for r in results),
        "fail": sum(r["status"] != "pass" for r in results),
        "runs": results,
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    if summary["fail"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
