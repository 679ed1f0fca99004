"""Decode-latency perf guard: compare a bench.py result to a baseline.

Reference: .github/workflows/ci_decode_perf_guard.yml +
scripts/bench_snapshot_baseline.py — fail CI when decode latency regresses
more than --tol vs the snapshotted JSON baseline; --snapshot records a new
baseline from the current run.

Usage:
  python bench.py | tee bench.json
  python scripts/check_decode_guard.py bench.json baselines/tpu_decode_guard.json
  python scripts/check_decode_guard.py bench.json baselines/tpu_decode_guard.json --snapshot
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("result")
    ap.add_argument("baseline")
    ap.add_argument("--tol", type=float, default=0.05)
    ap.add_argument("--snapshot", action="store_true")
    args = ap.parse_args()

    with open(args.result) as f:
        lines = [ln for ln in f if ln.strip().startswith("{")]
    result = json.loads(lines[-1])
    # bench.py emits the S sweep alongside the headline metric; guard every
    # entry (reference guard covers the full S range,
    # /root/reference/bench/bench_decode.py:60-266)
    values = dict(result.get("sweep") or {})
    values.setdefault(result["metric"], result["value"])

    if args.snapshot or not os.path.exists(args.baseline):
        os.makedirs(os.path.dirname(args.baseline) or ".", exist_ok=True)
        with open(args.baseline, "w") as f:
            json.dump(values, f, indent=2)
        print(f"snapshotted baseline {json.dumps(values)}")
        return

    with open(args.baseline) as f:
        baseline = json.load(f)
    failed = []
    for metric, value in sorted(values.items()):
        base = baseline.get(metric)
        if base is None or base <= 0:
            print(f"no baseline value for {metric} — skipping (placeholder)")
            continue
        ratio = value / base
        status = "ok" if ratio <= 1 + args.tol else "REGRESSION"
        print(json.dumps({
            "metric": metric, "value": value,
            "baseline": base, "ratio": round(ratio, 4),
            "tol": args.tol, "status": status,
        }))
        if status != "ok":
            failed.append(metric)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
